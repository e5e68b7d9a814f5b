"""VPU roofline analysis for the compute-bound VEP iterations (r05).

The APT figure of merit (T_eff vs HBM peak) presumes the iteration is
memory-bound. The 3D VEP body measures 0.26x HBM peak — this probe
establishes whether that is an inefficiency or the OTHER roofline binding:

1. measures the empirical VPU f32 peak with a synthetic fused
   multiply-add chain on a VMEM-resident block (one remote compile);
2. pulls XLA's own flop count for one fused iteration of a family from
   the compiled executable's cost analysis;
3. prints t_iter(measured) / t_flops(VPU ceiling) — a ratio near 1 means
   the iteration runs at the compute speed-of-light and the memory-bound
   bar does not apply.

Usage: python scripts/probe_vpu_roofline.py [family ...]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

families = sys.argv[1:] or ["vep3d", "vep2d_1024"]

print(f"device={jax.devices()[0]}", flush=True)


# ---- 1. empirical VPU peak: FMA chain on a resident block ----------------
def vpu_probe(n_ops, shape=(512, 1024)):
    def step(nit, x, c):
        def body(_, x):
            for _ in range(n_ops):
                x = x * c[0] + c[1]
            return x
        return lax.fori_loop(0, nit, body, x)
    x = jnp.ones(shape, jnp.float32) * 0.5
    c = jnp.asarray([0.9999, 1e-6], jnp.float32)
    fn = jax.jit(step).lower(jnp.asarray(2, jnp.int32), x, c).compile()
    np.asarray(fn(jnp.asarray(2, jnp.int32), x, c))  # warm (deferred compile)

    def run(nit):
        t0 = time.perf_counter()
        np.asarray(fn(jnp.asarray(nit, jnp.int32), x, c))
        return time.perf_counter() - t0
    r1 = min(run(10) for _ in range(2))
    r2 = min(run(1010) for _ in range(2))
    t_it = (r2 - r1) / 1000
    flops = 2 * n_ops * shape[0] * shape[1]
    return flops / t_it / 1e12


peak = max(vpu_probe(64), vpu_probe(128))
print(f"empirical VPU f32 peak: {peak:.3f} TFLOP/s", flush=True)

# ---- 2. per-family flop count + measured t_iter --------------------------
from justrelax_tpu.utils import bench_kernels as bk

for fam in families:
    step, carry, consts, bpi, n_cells = bk.build_family_on_cpu(fam)
    jitted = jax.jit(step)
    fn = jitted.lower(jnp.asarray(101, jnp.int32), carry, consts).compile()
    ca = fn.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    # HLO cost analysis counts a while-loop body ONCE (trip count is
    # dynamic here), so 'flops' ~= flops of ONE fused iteration + setup
    fl_iter = ca.get("flops", 0.0)
    tr_iter = ca.get("transcendentals", 0.0)
    # measured t_iter
    np.asarray(jax.tree.leaves(fn(jnp.asarray(10, jnp.int32), carry,
                                  consts))[0]).ravel()

    def run(nit):
        t0 = time.perf_counter()
        out = fn(jnp.asarray(nit, jnp.int32), carry, consts)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
        return time.perf_counter() - t0

    r1 = min(run(101) for _ in range(3))
    nb = max(int(0.6 / max((run(101) - r1) + 1e-9, 1e-9)), 300)
    nb = min(nb, 20000)
    r2 = min(run(101 + nb) for _ in range(3))
    t_iter = (r2 - r1) / nb
    t_flops = fl_iter / (peak * 1e12)
    t_mem = bpi / 819e9
    print(f"{fam}: flops/iter={fl_iter/1e9:.2f}G transc/iter={tr_iter/1e6:.1f}M "
          f"t_iter={t_iter*1e6:.0f}us | VPU ceiling={t_flops*1e6:.0f}us "
          f"({t_flops/t_iter*100:.0f}% of SOL) | HBM ceiling={t_mem*1e6:.0f}us "
          f"({t_mem/t_iter*100:.0f}%)", flush=True)
