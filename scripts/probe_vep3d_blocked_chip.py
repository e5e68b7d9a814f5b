"""On-chip probe: blocked 3D VEP Pallas kernel at 126^3 f32 (VERDICT r05 #1).

Prints compile wall time and per-iteration time with flushes so a kill at
any point leaves a record. Usage:
    python scripts/probe_vep3d_blocked_chip.py [n] [y_block] [plane_block] [k]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

n = int(sys.argv[1]) if len(sys.argv) > 1 else 126
y_block = int(sys.argv[2]) if len(sys.argv) > 2 and sys.argv[2] != "0" else None
plane_block = int(sys.argv[3]) if len(sys.argv) > 3 and sys.argv[3] != "0" else None
k = int(sys.argv[4]) if len(sys.argv) > 4 and sys.argv[4] != "0" else None
nvals = int(sys.argv[5]) if len(sys.argv) > 5 and sys.argv[5] != "0" else None

print(f"device={jax.devices()[0]} n={n} y_block={y_block} "
      f"plane_block={plane_block} k={k}", flush=True)

from justrelax_tpu.ops.pallas_stokes3d_vep_blocked import choose_blocking_vep3d
from justrelax_tpu.utils import bench_kernels as bk

t0 = time.perf_counter()
fkw = dict(n=n, y_block=y_block, plane_block=plane_block, iters_per_pass=k)
if nvals is not None:
    fkw["nvals"] = nvals
step, carry, consts, bpi, n_cells = bk.build_family_on_cpu(
    "pallas_vep3d_blocked", fkw)
print(f"factory: {time.perf_counter()-t0:.1f}s bytes/iter={bpi/1e6:.1f}MB",
      flush=True)

blocking = choose_blocking_vep3d(n, n, n, 21, 4, plane_block, k,
                                 y_block=y_block,
                                 **({"nvals": nvals} if nvals else {}))
print(f"blocking (R,Ry,k,nbx,nby,X_pad,Y_pad,W,Wy) = {blocking}", flush=True)

t0 = time.perf_counter()
fn = jax.jit(step).lower(jnp.asarray(10, jnp.int32), carry, consts).compile()
print(f"compile: {time.perf_counter()-t0:.1f}s", flush=True)


def run(nit):
    t0 = time.perf_counter()
    out = fn(jnp.asarray(nit, jnp.int32), carry, consts)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    return time.perf_counter() - t0


print(f"warmup(10): {run(10):.3f}s", flush=True)
t10 = min(run(10) for _ in range(2))
t110 = min(run(110) for _ in range(2))
t_iter = (t110 - t10) / 100
print(f"t(10)={t10:.3f}s t(110)={t110:.3f}s -> t_iter={t_iter*1e6:.1f}us",
      flush=True)
if t_iter > 0:
    teff = bpi / t_iter / 1e9
    print(f"T_eff={teff:.1f} GB/s  vs_peak={teff/819:.3f}", flush=True)

# refine with a longer signal
nbig = max(int(0.6 / max(t_iter, 1e-6)), 300)
t1 = min(run(100) for _ in range(3))
t2 = min(run(100 + nbig) for _ in range(3))
t_iter = (t2 - t1) / nbig
teff = bpi / t_iter / 1e9
print(f"refined dn={nbig}: t_iter={t_iter*1e6:.2f}us T_eff={teff:.1f} GB/s "
      f"vs_peak={teff/819:.3f}", flush=True)
