"""Shear heating, principal stresses, phase ratios, stress rotation, 3D
thermal diffusion (reference test_shearheating*, test_diffusion3D, ...)."""

import jax.numpy as jnp
import numpy as np
import pytest

from justrelax_tpu.core.coeffs import PTThermalCoeffs
from justrelax_tpu.core.grid import Geometry
from justrelax_tpu.core.state import ThermalState
from justrelax_tpu.ops.bc import Faces, TemperatureBoundaryConditions, thermal_bcs
from justrelax_tpu.ops.heating import compute_shear_heating
from justrelax_tpu.ops.principal_stresses import principal_stresses_2d, principal_stresses_3d
from justrelax_tpu.ops.stress_rotation import (
    compute_vorticity_center,
    rotate_stress_grid_2d,
    rotate_stress_particles_2d,
)
from justrelax_tpu.rheology.materials import Material
from justrelax_tpu.rheology.phases import phase_ratios_from_field
from justrelax_tpu.solvers.thermal import heatdiffusion_PT


def test_shear_heating_viscous_dissipation():
    """Pure viscous flow (τ_o = τ, G→∞): H = τ:ε = 2η εII² contraction."""
    ni = (4, 4)
    exx = jnp.full(ni, 1.0)
    eyy = jnp.full(ni, -1.0)
    exy_v = jnp.full((5, 5), 0.5)
    eta = 2.0
    txx, tyy, txy = 2 * eta * exx, 2 * eta * eyy, 2 * eta * jnp.full(ni, 0.5)
    m = Material(G=jnp.inf, eta0=eta)
    H = compute_shear_heating(txx, tyy, txy, txx, tyy, txy, exx, eyy, exy_v, m, 1.0)
    expected = txx * exx + tyy * eyy + 2 * txy * 0.5
    np.testing.assert_allclose(np.asarray(H), np.asarray(expected))
    assert float(H.min()) > 0


def test_principal_stresses_2d():
    txx = jnp.asarray([[2.0]])
    tyy = jnp.asarray([[-2.0]])
    txy = jnp.asarray([[0.0]])
    ps = principal_stresses_2d(txx, tyy, txy)
    # σ1 along x with magnitude... a=0, b=√(8+0)=2.83
    assert ps.sigma1[0, 0, 0] == pytest.approx(np.sqrt(8.0) * np.cos(0.0))
    assert ps.sigma2[1, 0, 0] == pytest.approx(-np.sqrt(8.0))


def test_principal_stresses_3d_identity():
    ni = (2, 2, 2)
    z = jnp.zeros(ni)
    ps = principal_stresses_3d(jnp.full(ni, 3.0), jnp.full(ni, 2.0), jnp.full(ni, 1.0), z, z, z)
    np.testing.assert_allclose(np.asarray(ps.sigma1[0]), 3.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ps.sigma3[2]), 1.0, atol=1e-12)


def test_phase_ratios_from_field():
    phase = jnp.asarray(np.repeat([0, 0, 1, 1], 4).reshape(4, 4))
    pr = phase_ratios_from_field(phase, 2)
    assert pr.center.shape == (4, 4, 2)
    assert pr.vertex.shape == (5, 5, 2)
    assert pr.face_x.shape == (5, 4, 2)
    np.testing.assert_allclose(np.asarray(pr.center.sum(-1)), 1.0)
    np.testing.assert_allclose(np.asarray(pr.vertex.sum(-1)), 1.0)
    # interface vertex column mixes 50/50
    np.testing.assert_allclose(np.asarray(pr.vertex[2, 2]), [0.5, 0.5])


def test_stress_rotation_invariant():
    """Rotation preserves the stress invariant; Jaumann matches finite
    rotation to O(dt²)."""
    txx, tyy, txy = jnp.asarray([[1.0]]), jnp.asarray([[-1.0]]), jnp.asarray([[0.3]])
    w = jnp.asarray([[0.2]])
    dt = 1e-3
    xx2, yy2, xy2 = rotate_stress_particles_2d(txx, tyy, txy, w, dt)
    II0 = 0.5 * (txx**2 + tyy**2) + txy**2
    II1 = 0.5 * (xx2**2 + yy2**2) + xy2**2
    np.testing.assert_allclose(np.asarray(II1), np.asarray(II0), rtol=1e-12)
    xxj, yyj, xyj = rotate_stress_grid_2d(txx, tyy, txy, w, dt)
    np.testing.assert_allclose(np.asarray(xxj), np.asarray(xx2), atol=1e-6)


def test_vorticity_rigid_rotation():
    """Rigid rotation V = ω×r has vorticity = ω everywhere."""
    g = Geometry((8, 8), (1.0, 1.0))
    w0 = 0.7
    yvx = np.asarray(g.xi_vel[0][1])
    Vx = jnp.asarray(-w0 * yvx[None, :] * np.ones((9, 1)))
    xvy = np.asarray(g.xi_vel[1][0])
    Vy = jnp.asarray(w0 * xvy[:, None] * np.ones((1, 9)))
    wc = compute_vorticity_center(Vx, Vy, 8.0, 8.0)
    np.testing.assert_allclose(np.asarray(wc), w0, atol=1e-12)


@pytest.mark.slow
def test_diffusion3d_decay():
    """3D PT diffusion: hot Gaussian relaxes toward the Dirichlet background
    and conserves monotonicity (reference test_diffusion3D smoke analogue)."""
    ni = (12, 12, 12)
    g = Geometry(ni, (1.0, 1.0, 1.0))
    thermal = ThermalState.make(ni)
    X, Y, Z = np.meshgrid(*g.xci, indexing="ij")
    T0 = 1.0 + 2.0 * np.exp(-((X - 0.5) ** 2 + (Y - 0.5) ** 2 + (Z - 0.5) ** 2) / 0.05)
    T = np.ones((14, 14, 14))
    T[1:-1, 1:-1, 1:-1] = T0
    bc = TemperatureBoundaryConditions(
        constant_value=Faces(top=1.0, bot=1.0, left=1.0, right=1.0, front=1.0, back=1.0)
    )
    Tj = thermal_bcs(jnp.asarray(T), bc)
    thermal = thermal.replace(T=Tj, Told=Tj)
    K = jnp.ones(ni)
    rc = jnp.ones(ni)
    dt = 0.01
    pt = PTThermalCoeffs.make(K, rc, dt, g.di, g.li)
    thermal, info = heatdiffusion_PT(thermal, pt, bc, dt, g, K=K, rho_Cp=rc, iter_max=5000, nout=500)
    assert float(info.err) < 1e-8
    T1 = np.asarray(thermal.T[1:-1, 1:-1, 1:-1])
    assert T1.max() < T0.max()  # peak decays
    assert T1.min() > 0.99  # no undershoot
    # total heat decreases toward the cold boundaries
    assert T1.sum() < T0.sum()


def test_free_surface_stabilization_term():
    """compute_V with free_surface_dt=0 equals the plain update; a nonzero dt
    modifies Vy only where the vertical density gradient is nonzero."""
    import jax.numpy as jnp
    from justrelax_tpu.ops.stokes import compute_V

    rng = np.random.default_rng(7)
    nx, ny = 8, 8
    Vx = jnp.asarray(rng.standard_normal((nx + 1, ny + 2)))
    Vy = jnp.asarray(rng.standard_normal((nx + 2, ny + 1)))
    P = jnp.asarray(rng.standard_normal((nx, ny)))
    txx = jnp.asarray(rng.standard_normal((nx, ny)))
    tyy = jnp.asarray(rng.standard_normal((nx, ny)))
    txy = jnp.asarray(rng.standard_normal((nx + 1, ny + 1)))
    rho_gy = jnp.asarray(np.linspace(1.0, 2.0, ny)[None, :] * np.ones((nx, 1)))
    eta_tau = jnp.ones((nx, ny))
    a0 = compute_V(Vx, Vy, P, txx, tyy, txy, 0.1, jnp.zeros((nx, ny)), rho_gy,
                   eta_tau, 8.0, 8.0, free_surface_dt=None)
    a1 = compute_V(Vx, Vy, P, txx, tyy, txy, 0.1, jnp.zeros((nx, ny)), rho_gy,
                   eta_tau, 8.0, 8.0, free_surface_dt=0.0)
    np.testing.assert_allclose(np.asarray(a0[1]), np.asarray(a1[1]))
    a2 = compute_V(Vx, Vy, P, txx, tyy, txy, 0.1, jnp.zeros((nx, ny)), rho_gy,
                   eta_tau, 8.0, 8.0, free_surface_dt=1.0)
    assert np.abs(np.asarray(a2[1]) - np.asarray(a0[1])).max() > 0
    np.testing.assert_allclose(np.asarray(a2[0]), np.asarray(a0[0]))


def test_thermal_stress_pressure_source():
    """Kiss et al. (2023) thermal-stress term: heating at fixed volume raises
    pressure by ~K·α·ΔT at the compressible fixed point."""
    from justrelax_tpu.ops.stokes import compute_P

    ni = (4, 4)
    P = jnp.zeros(ni)
    grad_V = jnp.zeros(ni)
    Q = jnp.zeros(ni)
    eta, K, G = jnp.ones(ni), jnp.full(ni, 2.0), jnp.full(ni, jnp.inf)
    dt, r, theta = 1.0, 0.7, 10.0
    a_dT = jnp.full(ni, 0.01)  # α·ΔT
    for _ in range(2000):
        RP, P = compute_P(P, jnp.zeros(ni), grad_V, Q, eta, K, G, dt, r, theta,
                          alpha_dT=a_dT)
    # fixed point: RP = 0 → P = K·dt·α·ΔT/dt = K·α·ΔT
    np.testing.assert_allclose(np.asarray(P), 2.0 * 0.01, rtol=1e-6)


def test_compute_diffusivity():
    """κ = k/(ρCp) helper (reference test_rheology.jl thermal helpers)."""
    import jax.numpy as jnp
    import numpy as np

    from justrelax_tpu.rheology.materials import (
        Material,
        MaterialStack,
        compute_diffusivity,
    )

    m = MaterialStack.make([
        Material(rho0=3.0e3, Cp=1000.0, k=3.0),
        Material(rho0=2.0e3, Cp=1000.0, k=2.0),
    ])
    T = jnp.full((4, 4), 0.0)  # alpha=0 → rho = rho0
    ratios = jnp.zeros((4, 4, 2)).at[..., 0].set(1.0)
    kappa = compute_diffusivity(m, T=T, phase_ratios=ratios)
    np.testing.assert_allclose(np.asarray(kappa), 3.0 / (3.0e3 * 1000.0))
    # mixed ratios: phase-averaged k over phase-averaged rhoCp
    r2 = jnp.full((4, 4, 2), 0.5)
    kappa2 = compute_diffusivity(m, T=T, phase_ratios=r2)
    np.testing.assert_allclose(np.asarray(kappa2), 2.5 / (2.5e3 * 1000.0))


def test_nonlinear_softening_cohesion():
    """GeoParams NonLinearSoftening semantics: softened C derived from ξ₀
    alone (the phase's C is ignored), decaying ξ₀ → ξ₀ − Δ with EII."""
    import jax.numpy as jnp

    from justrelax_tpu.rheology.materials import Material, MaterialStack
    from justrelax_tpu.rheology.plasticity import plastic_params_phase

    mat = MaterialStack.make([Material(
        is_plastic=1.0, C=123.0, friction_angle=0.0,
        soft_C_nl=1.0, soft_C_nl_xi0=1.6, soft_C_nl_delta=0.8,
    )])
    pp0 = plastic_params_phase(mat, jnp.zeros((4, 4)), None)
    # at EII=0 the softened cohesion is ξ₀, NOT the phase C (cosϕ=1 here)
    assert float(pp0.C_cosphi[0, 0]) == 1.6
    pp_inf = plastic_params_phase(mat, jnp.full((4, 4), 1e3), None)
    assert float(pp_inf.C_cosphi[0, 0]) == pytest.approx(0.8, abs=1e-12)
    # monotone decay
    pp_mid = plastic_params_phase(mat, jnp.full((4, 4), 1e-2), None)
    assert 0.8 < float(pp_mid.C_cosphi[0, 0]) < 1.6


def test_tension_cap_yield_and_gradients():
    """Tension cap: min(cone, cap), zero strength at P = pT, dilation
    (∂Q/∂P < 0) on the cap with associated flow."""
    import jax.numpy as jnp

    from justrelax_tpu.rheology.materials import Material, MaterialStack
    from justrelax_tpu.rheology.plasticity import (
        flow_gradients_P,
        plastic_params_phase,
        yield_function,
    )

    mat = MaterialStack.make([Material(
        is_plastic=1.0, C=1.6 / jnp.cos(jnp.deg2rad(30.0)),
        friction_angle=30.0, dilation_angle=3.0, tension_pT=-0.5,
    )])
    P = jnp.asarray([0.4, 0.0, -0.3, -0.5])
    pp = plastic_params_phase(mat, jnp.zeros_like(P), None)
    tau = jnp.zeros_like(P)
    F = yield_function(pp, P, tau)
    tau_y = -F  # τ_yield since τII = 0
    # compression: cone C·cosϕ + P·sinϕ
    assert float(tau_y[0]) == pytest.approx(1.6 + 0.4 * 0.5, abs=1e-12)
    # P = 0: cap == cone == C·cosϕ (continuous closure)
    assert float(tau_y[1]) == pytest.approx(1.6, abs=1e-12)
    # tension side: elliptic drop below the cone
    assert float(tau_y[2]) == pytest.approx(1.6 * (1 - (0.3 / 0.5) ** 2) ** 0.5, abs=1e-12)
    # zero strength at the closure pressure
    assert float(tau_y[3]) == pytest.approx(0.0, abs=1e-5)
    dFdP, dQdP = flow_gradients_P(pp, P, tau)
    # cone gradients in compression
    assert float(dFdP[0]) == pytest.approx(-0.5, abs=1e-12)
    assert float(dQdP[0]) == pytest.approx(-float(jnp.sin(jnp.deg2rad(3.0))), abs=1e-12)
    # associated dilatant flow on the cap: dQdP = dFdP < −sinϕ side
    assert float(dQdP[2]) < 0.0
    assert float(dFdP[2]) == pytest.approx(float(dQdP[2]))
    # cap disabled (pT=0 sentinel): pure cone everywhere
    mat0 = MaterialStack.make([Material(
        is_plastic=1.0, C=1.0, friction_angle=30.0,
    )])
    pp0 = plastic_params_phase(mat0, jnp.zeros_like(P), None)
    F0 = yield_function(pp0, P, tau)
    cone = pp0.C_cosphi + P * pp0.sinphi
    assert jnp.allclose(-F0, cone)
