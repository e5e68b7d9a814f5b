"""On-chip bisect of the blocked 3D VEP kernel fault (r05).

Runs ONE configuration per process (a kernel fault kills the TPU worker);
prints PASS/CRASH with the config. Usage:
    python scripts/bisect_vep3d_blocked.py <n> <y_block> [plane_block] [k]
y_block=0 means chooser default; pass y_block >= y_pad to force nby=1.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

n = int(sys.argv[1])
y_block = int(sys.argv[2]) or None
plane_block = int(sys.argv[3]) if len(sys.argv) > 3 and sys.argv[3] != "0" else None
k = int(sys.argv[4]) if len(sys.argv) > 4 and sys.argv[4] != "0" else None

from justrelax_tpu.ops.pallas_stokes3d_vep_blocked import choose_blocking_vep3d
from justrelax_tpu.utils import bench_kernels as bk

step, carry, consts, bpi, n_cells = bk.build_family_on_cpu(
    "pallas_vep3d_blocked",
    dict(n=n, y_block=y_block, plane_block=plane_block, iters_per_pass=k))
blocking = choose_blocking_vep3d(n, n, n, 21, 4, plane_block, k,
                                 y_block=y_block)
print(f"n={n} blocking(R,Ry,k,nbx,nby,X_pad,Y_pad,W,Wy)={blocking}",
      flush=True)

t0 = time.perf_counter()
fn = jax.jit(step).lower(jnp.asarray(4, jnp.int32), carry, consts).compile()
print(f"compile: {time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
out = fn(jnp.asarray(4, jnp.int32), carry, consts)
v = np.asarray(jax.tree.leaves(out)[0])
print(f"run(4): {time.perf_counter()-t0:.1f}s finite={np.isfinite(v).all()}",
      flush=True)
for nit in (4, 40):
    t0 = time.perf_counter()
    o2 = fn(jnp.asarray(nit, jnp.int32), carry, consts)
    np.asarray(jax.tree.leaves(o2)[0])
    print(f"run({nit}) again: {time.perf_counter()-t0:.2f}s", flush=True)

# compare against the XLA canvas chunk on the same inputs (device)
step_x, carry_x, consts_x, _, _ = bk.build_family_on_cpu(
    "vep3d_canvas", dict(n=n))
fn_x = jax.jit(step_x).lower(jnp.asarray(4, jnp.int32), carry_x,
                             consts_x).compile()
out_x = fn_x(jnp.asarray(4, jnp.int32), carry_x, consts_x)
for a, b, nm in zip(jax.tree.leaves(out), jax.tree.leaves(out_x),
                    range(99)):
    da = float(jnp.max(jnp.abs(a - b)))
    sc = float(jnp.max(jnp.abs(b))) or 1.0
    if da > 1e-5 * sc:
        print(f"MISMATCH leaf {nm}: {da:.3e} vs scale {sc:.3e}", flush=True)
        break
else:
    print("PARITY OK vs canvas chunk (4 iters, on-chip)", flush=True)
print("PASS", flush=True)
