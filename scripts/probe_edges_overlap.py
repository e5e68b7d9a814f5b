"""Does the edges kernel's double-buffered window DMA actually OVERLAP
with compute? Monkeypatch the physics body with a pure-VMEM compute chain
of tunable depth; if the prefetch overlaps, t(db=True) ~ max(DMA, compute)
while t(db=False) ~ DMA + compute. Run AFTER the chip is free.

Usage: python scripts/probe_edges_overlap.py [depth ...]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from justrelax_tpu.utils import bench_kernels as bk  # noqa: E402
from justrelax_tpu.ops import pallas_vep3d_edges as pe  # noqa: E402
from justrelax_tpu.ops.stokes3d_vep import VEPStressResult3D  # noqa: E402

DEPTH = 64


def fake_update(eps_c3, eps_e3, tau_c6, tau_e3, tau_o_c6, tau_o_e3,
                Pr, eta, lam, lam_e3, *a, **kw):
    # touch each input once, then a serial FMA chain (pure VPU, no DMA)
    s = Pr + eta + eps_c3[0] + eps_e3[0] + tau_c6[0]
    for _ in range(DEPTH):
        s = s * 1.0000001 + 1e-7
    return VEPStressResult3D(
        tau_c=tau_c6,
        tau_e=tuple(t + s for t in tau_e3),
        lam=lam, lam_e=lam_e3,
        tau_II=Pr, eta_vep=eta, P_corrected=Pr,
        eps_pl_c=tau_c6, eps_pl_e=tau_e3, eps_vol_pl=lam,
    )


def materialize(out):
    leaf = jax.tree.leaves(out)[0]
    return float(np.asarray(jnp.sum(leaf)))


def main():
    global DEPTH
    depths = [int(x) for x in sys.argv[1:]] or [0, 64, 192]
    step, carry, co, bpi, n_cells = bk.build_family_on_cpu(
        "pallas_vep3d_edges")
    from justrelax_tpu.core.grid import Geometry
    geometry = Geometry((126,) * 3, (1.0, 1.0, 1.0))
    inv_di = tuple(1.0 / d for d in geometry.di)
    dt = jnp.asarray(0.125, jnp.float32)
    pe.update_stresses_center_edges_3d = fake_update
    c2 = {"V": carry.V, "theta": carry.theta, "eta": carry.eta,
          "tau_c": carry.tau_c, "tau_e": carry.tau_e, "lam_e": carry.lam_e}

    def make(db):
        def step_noop(n_iter, c2, co2):
            V, theta, eta, tau_c = (c2["V"], c2["theta"], c2["eta"],
                                    c2["tau_c"])

            def body(_, t):
                tau_e, lam_e = t
                return pe.vep3d_edges_blocked(
                    V, theta, eta, tau_c, tau_e, lam_e, co2, inv_di,
                    dt=dt, theta_dtau=jnp.asarray(0.12, jnp.float32),
                    lambda_relaxation=0.2, nvals=8, double_buffer=db,
                )
            return jax.lax.fori_loop(0, n_iter, body,
                                     (c2["tau_e"], c2["lam_e"]))
        fn = jax.jit(step_noop).lower(
            jnp.asarray(10, jnp.int32), c2, co).compile()
        materialize(fn(jnp.asarray(10, jnp.int32), c2, co))
        return fn

    def once(fn, n):
        t0 = time.perf_counter()
        materialize(fn(jnp.asarray(n, jnp.int32), c2, co))
        return time.perf_counter() - t0

    for d in depths:
        DEPTH = d
        for db in (False, True):
            fn = make(db)
            dn = 300
            reps = sorted((once(fn, 2 + dn) - once(fn, 2)) / dn
                          for _ in range(3))
            print(f"depth={d:4d} db={int(db)}: best {reps[0]*1e6:7.1f} "
                  f"median {reps[1]*1e6:7.1f} us/iter", flush=True)


if __name__ == "__main__":
    main()
