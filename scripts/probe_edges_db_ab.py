"""Paired on-chip A/B of the edges kernel: serialized window DMA (r04
design) vs double-buffered prefetch (r05). Kernel-only loop (tau_e/lam_e
fed back), 126^3 f32, interleaved repeats."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from justrelax_tpu.utils import bench_kernels as bk  # noqa: E402
from justrelax_tpu.ops.pallas_vep3d_edges import vep3d_edges_blocked  # noqa: E402


def materialize(out):
    leaf = jax.tree.leaves(out)[0]
    return float(np.asarray(jnp.sum(leaf)))


def main():
    step, carry, co, bpi, n_cells = bk.build_family_on_cpu(
        "pallas_vep3d_edges")
    from justrelax_tpu.core.grid import Geometry
    geometry = Geometry((126,) * 3, (1.0, 1.0, 1.0))
    inv_di = tuple(1.0 / d for d in geometry.di)
    dt = jnp.asarray(0.125, jnp.float32)
    c2 = {"V": carry.V, "theta": carry.theta, "eta": carry.eta,
          "tau_c": carry.tau_c, "tau_e": carry.tau_e, "lam_e": carry.lam_e}

    def make(db, nvals):
        def step_edges(n_iter, c2, co2):
            V, theta, eta, tau_c = (c2["V"], c2["theta"], c2["eta"],
                                    c2["tau_c"])

            def body(_, t):
                tau_e, lam_e = t
                return vep3d_edges_blocked(
                    V, theta, eta, tau_c, tau_e, lam_e, co2, inv_di,
                    dt=dt, theta_dtau=jnp.asarray(0.12, jnp.float32),
                    lambda_relaxation=0.2, nvals=nvals,
                    double_buffer=db,
                )
            return jax.lax.fori_loop(0, n_iter, body,
                                     (c2["tau_e"], c2["lam_e"]))
        fn = jax.jit(step_edges).lower(
            jnp.asarray(10, jnp.int32), c2, co).compile()
        materialize(fn(jnp.asarray(10, jnp.int32), c2, co))
        return fn

    cfgs = [("db=False nvals=40", False, 40),
            ("db=True nvals=40", True, 40),
            ("db=True nvals=24", True, 24)]
    if len(sys.argv) > 1:
        sel = set(int(x) for x in sys.argv[1].split(","))
        cfgs = [c for i, c in enumerate(cfgs) if i in sel]
    fns = [(nm, make(db, nv)) for nm, db, nv in cfgs]

    def once(fn, n):
        t0 = time.perf_counter()
        materialize(fn(jnp.asarray(n, jnp.int32), c2, co))
        return time.perf_counter() - t0

    dn = 400
    slopes = {nm: [] for nm, _ in fns}
    for _ in range(5):
        for nm, fn in fns:
            t1 = once(fn, 2)
            t2 = once(fn, 2 + dn)
            slopes[nm].append((t2 - t1) / dn)
    for nm, ss in slopes.items():
        ss = sorted(ss)
        print(f"{nm}: best {ss[0]*1e6:.1f} median {ss[len(ss)//2]*1e6:.1f} "
              f"us/iter reps={[round(r*1e6,1) for r in ss]}", flush=True)


if __name__ == "__main__":
    main()
