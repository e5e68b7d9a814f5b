"""Cross-solver consistency: the APT VEP solver and DYREL solve the SAME
shear-band problem (DYREL-test configuration: Kb=5, Gi=G0/2, η_vp=1e-2,
reference test_shearband2D_DYREL.jl geometry) and must agree on the
converged visco-elasto-plastic solution — two completely different
iteration schemes (damped pseudo-transient vs Powell–Hestenes + dynamic
relaxation with Gershgorin auto-tuning) sharing only the physics kernels.

The reference has no such test (its ShearBand2D_comparison.jl only compares
iteration counts of the velocity/displacement formulations); this guards
against either solver drifting from the discrete VEP equations."""

import math

import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.slow
def test_apt_vs_dyrel_same_solution():
    from justrelax_tpu.core.coeffs import PTStokesCoeffs
    from justrelax_tpu.core.grid import Geometry
    from justrelax_tpu.core.state import StokesState
    from justrelax_tpu.models.shearband import _circle_phase_ratios
    from justrelax_tpu.ops.bc import Faces, VelocityBoundaryConditions, flow_bcs
    from justrelax_tpu.ops.stokes import tensor_invariant_staggered_2d
    from justrelax_tpu.rheology.materials import Material, MaterialStack
    from justrelax_tpu.solvers.dyrel import solve_dyrel
    from justrelax_tpu.solvers.stokes2d_vep import solve_vep

    n, nt, eps_bg = 32, 10, 1.0
    ni = (n, n)
    geometry = Geometry(ni, (1.0, 1.0))
    xci, xvi = geometry.xci, geometry.xvi
    tau_y, phi_f = 1.6, 30.0
    eta0, G0 = 1.0, 1.0
    dt = eta0 / G0 / 4.0
    common = dict(
        rho0=0.0, Kb=5.0, eta0=eta0, is_plastic=1.0,
        C=tau_y / math.cos(math.radians(phi_f)),
        friction_angle=phi_f, dilation_angle=0.0, eta_reg=1.0e-2,
    )
    material = MaterialStack.make(
        [Material(G=G0, **common), Material(G=G0 / 2.0, **common)]
    )
    pr_c = jnp.asarray(_circle_phase_ratios(xci[0], xci[1], (0.5, 0.5), 0.1))
    pr_v = jnp.asarray(_circle_phase_ratios(xvi[0], xvi[1], (0.5, 0.5), 0.1))
    bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True)
    )

    def init_state(boundary_only):
        st = StokesState.make(ni)
        f = st.P.dtype
        xv = jnp.asarray(xvi[0], f)
        yv = jnp.asarray(xvi[1], f)
        Vx = jnp.broadcast_to((eps_bg * xv)[:, None], (n + 1, n + 2))
        Vy = jnp.broadcast_to((-eps_bg * yv)[None, :], (n + 2, n + 1))
        if boundary_only:  # DYREL convention (test_shearband2D_DYREL.jl:146-148)
            Vx = Vx.at[1:-1, 1:-1].set(0.0)
            Vy = Vy.at[1:-1, 1:-1].set(0.0)
        Vx, Vy = flow_bcs((Vx, Vy), bc)
        return st.replace(V=st.V.replace(Vx=Vx, Vy=Vy))

    st = init_state(False)
    pt = PTStokesCoeffs.make(
        geometry.li, geometry.di, eps_rel=1.0e-6, CFL=0.75 / math.sqrt(2.1)
    )
    for _ in range(nt):
        st, _ = solve_vep(
            st, pt, geometry, bc, material, pr_c, pr_v, dt,
            iter_max=50_000, nout=100,
        )
    tau_apt = np.asarray(
        tensor_invariant_staggered_2d(st.tau.xx, st.tau.yy, st.tau.xy)
    )

    sd = init_state(True)
    for _ in range(nt):
        sd, _ = solve_dyrel(
            sd, geometry, bc, material, pr_c, pr_v, dt,
            eps=1.0e-6, nout=50, rel_drop=0.5,
        )
    tau_dyr = np.asarray(
        tensor_invariant_staggered_2d(sd.tau.xx, sd.tau.yy, sd.tau.xy)
    )

    # post-yield stress field agrees between the two algorithms
    # (measured: max|Δτ_II| 2.2e-3, max|ΔP| 6.6e-3 at n=32, nt=10)
    assert np.abs(tau_apt - tau_dyr).max() < 5.0e-3
    np.testing.assert_allclose(tau_apt.max(), tau_dyr.max(), atol=1.0e-3)
    np.testing.assert_allclose(tau_apt.min(), tau_dyr.min(), atol=1.0e-3)
    assert np.abs(np.asarray(st.P) - np.asarray(sd.P)).max() < 2.0e-2
    assert (
        np.abs(np.asarray(st.V.Vx) - np.asarray(sd.V.Vx)).max() < 5.0e-3
    )
    # both capped at the yield surface
    assert tau_apt.max() < 1.65 and tau_dyr.max() < 1.65
