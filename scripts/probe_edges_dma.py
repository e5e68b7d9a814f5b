"""Measure the PURE DMA + call cost of the edges-kernel sweep at 126^3:
monkeypatch the physics body with a passthrough so the kernel only
window-copies its operands and stores. The gap between this and the full
kernel (probe_hybrid_breakdown B) is the compute; if the noop sweep is a
large fraction, the un-double-buffered window DMA is the wall."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from justrelax_tpu.utils import bench_kernels as bk  # noqa: E402
from justrelax_tpu.ops import pallas_vep3d_edges as pe  # noqa: E402
from justrelax_tpu.ops.stokes3d_vep import VEPStressResult3D  # noqa: E402


def materialize(out):
    leaf = jax.tree.leaves(out)[0]
    return float(np.asarray(jnp.sum(leaf)))


def fake_update(eps_c3, eps_e3, tau_c6, tau_e3, tau_o_c6, tau_o_e3,
                Pr, eta, lam, lam_e3, *a, **kw):
    # touch each input once so the DMA is not dead, no physics
    s = Pr + eta + eps_c3[0] + eps_e3[0] + tau_c6[0]
    return VEPStressResult3D(
        tau_c=tau_c6,
        tau_e=tuple(t + s for t in tau_e3),
        lam=lam, lam_e=lam_e3,
        tau_II=Pr, eta_vep=eta, P_corrected=Pr,
        eps_pl_c=tau_c6, eps_pl_e=tau_e3, eps_vol_pl=lam,
    )


def main():
    step, carry, co, bpi, n_cells = bk.build_family_on_cpu(
        "pallas_vep3d_edges")
    from justrelax_tpu.core.grid import Geometry
    geometry = Geometry((126,) * 3, (1.0, 1.0, 1.0))
    inv_di = tuple(1.0 / d for d in geometry.di)
    dt = jnp.asarray(0.125, jnp.float32)

    pe.update_stresses_center_edges_3d = fake_update

    def step_noop(n_iter, c2, co2):
        V, theta, eta, tau_c = c2["V"], c2["theta"], c2["eta"], c2["tau_c"]

        def body(_, t):
            tau_e, lam_e = t
            return pe.vep3d_edges_blocked(
                V, theta, eta, tau_c, tau_e, lam_e, co2, inv_di,
                dt=dt, theta_dtau=jnp.asarray(0.12, jnp.float32),
                lambda_relaxation=0.2, nvals=40,
            )
        return jax.lax.fori_loop(0, n_iter, body,
                                 (c2["tau_e"], c2["lam_e"]))

    c2 = {"V": carry.V, "theta": carry.theta, "eta": carry.eta,
          "tau_c": carry.tau_c, "tau_e": carry.tau_e, "lam_e": carry.lam_e}
    fn = jax.jit(step_noop).lower(
        jnp.asarray(10, jnp.int32), c2, co).compile()

    def once(n):
        t0 = time.perf_counter()
        materialize(fn(jnp.asarray(n, jnp.int32), c2, co))
        return time.perf_counter() - t0

    once(10)
    t_est = max((once(10) - once(2)) / 8, 1e-7)
    dn = max(int(0.6 / t_est), 8)
    reps = [(once(2 + dn) - once(2)) / dn for _ in range(3)]
    print(f"noop-body edges sweep: {min(reps)*1e6:.1f} us/iter "
          f"reps={[round(r*1e6,1) for r in reps]}", flush=True)

    # phase 2: FULL hybrid iteration with the noop kernel body — measures
    # XLA remainder + window DMA + the call-boundary cost together; minus
    # probe C (755 us) and the noop sweep above, what's left is the
    # interaction overhead of embedding the call in the XLA loop.
    import math
    from justrelax_tpu.ops.stokes3d_vep_canvas import vep3d_chunk_canvas
    from justrelax_tpu.rheology.materials import Material, MaterialStack
    C = 1.6 / math.cos(math.radians(30.0))
    common = dict(rho0=0.0, Kb=4.0, is_plastic=1.0, C=C,
                  friction_angle=30.0, dilation_angle=0.0, eta_reg=1.25e-2)
    material = MaterialStack.make([
        Material(G=1.0, eta0=1.0, **common),
        Material(G=0.5, eta0=0.1, **common),
    ])
    kw = dict(dt=dt, r=jnp.asarray(0.7, jnp.float32),
              theta_dtau=jnp.asarray(0.12, jnp.float32),
              etadtau=jnp.asarray(0.1, jnp.float32),
              lambda_relaxation=0.2, viscosity_relaxation=1.0e-2)

    def step_hyb(n_iter, carry3, co3):
        return vep3d_chunk_canvas(
            carry3, co3, material, inv_di, n_iter,
            edges_pallas=True, **kw)

    fn2 = jax.jit(step_hyb).lower(
        jnp.asarray(10, jnp.int32), carry, co).compile()

    def once2(n):
        t0 = time.perf_counter()
        materialize(fn2(jnp.asarray(n, jnp.int32), carry, co))
        return time.perf_counter() - t0

    once2(10)
    t_est = max((once2(10) - once2(2)) / 8, 1e-7)
    dn = max(int(0.6 / t_est), 8)
    reps = [(once2(2 + dn) - once2(2)) / dn for _ in range(3)]
    print(f"hybrid w/ noop kernel body: {min(reps)*1e6:.1f} us/iter "
          f"reps={[round(r*1e6,1) for r in reps]}", flush=True)


if __name__ == "__main__":
    main()
