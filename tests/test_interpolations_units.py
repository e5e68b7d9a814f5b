"""Interpolation, timestep, rock-ratio, and DYREL-helper unit tests.

Mirrors the reference's pure unit tier: test_Interpolations.jl,
test_Utils.jl (compute_dt), test_rockratio.jl, and the closed-form
transcription locks of test_dyrel_kernels.jl:46-68 — values here are
hand-derived from the published formulas, so an accidental edit to the
implementation breaks against an independent oracle.
"""

import math

import jax.numpy as jnp
import numpy as np

from justrelax_tpu.ops.interpolation import (
    center2vertex,
    center2vertex_harm,
    shear2center,
    velocity2center,
    velocity2vertex,
    vertex2center,
)
from justrelax_tpu.ops.rock_ratio import update_rock_ratio, valid_masks
from justrelax_tpu.solvers.dyrel import (
    _alpha_beta,
    compute_bulk_viscosity_and_penalty,
    gershgorin_schur_2d,
)
from justrelax_tpu.utils.timestep import compute_dt


# --- interpolations (reference test_Interpolations.jl:25-80) ----------------
def test_center2vertex_constant_and_roundtrip():
    ni = (4, 4)
    c = jnp.ones(ni)
    v = center2vertex(c)
    assert v.shape == (5, 5)
    np.testing.assert_allclose(np.asarray(v), 1.0)  # constant preserved
    # harmonic variant agrees on constants
    np.testing.assert_allclose(np.asarray(center2vertex_harm(c)), 1.0)
    # vertex2center of linear field is exact (midpoint rule)
    x = jnp.arange(5.0)[:, None] * jnp.ones((1, 5))
    np.testing.assert_allclose(
        np.asarray(vertex2center(x)),
        np.broadcast_to(np.arange(4)[:, None] + 0.5, (4, 4)),
    )


def test_velocity2vertex_and_center():
    nx, ny = 4, 4
    Vx = jnp.zeros((nx + 1, ny + 2))
    Vy = jnp.full((nx + 2, ny + 1), 10.0)
    Vx_v, Vy_v = velocity2vertex(Vx, Vy)
    assert Vx_v.shape == (nx + 1, ny + 1) and Vy_v.shape == (nx + 1, ny + 1)
    assert float(Vx_v[0, 0]) == 0.0
    assert float(Vy_v[0, 0]) == 10.0
    Vx_c, Vy_c = velocity2center(Vx, Vy)
    assert Vx_c.shape == (nx, ny)
    assert float(Vx_c[0, 0]) == 0.0 and float(Vy_c[0, 0]) == 10.0


def test_shear2center():
    xy_v = jnp.full((5, 5), 2.0)
    c = shear2center(xy_v)
    assert c.shape == (4, 4)
    np.testing.assert_allclose(np.asarray(c), 2.0)


# --- compute_dt (reference Utils.jl:492-519) --------------------------------
def test_compute_dt_cfl():
    Vx = jnp.full((5, 6), 2.0)
    Vy = jnp.full((6, 5), -4.0)
    di = (0.5, 0.25)
    # min(0.5/2, 0.25/4)·0.9 = 0.05625
    assert float(compute_dt((Vx, Vy), di)) == 0.9 * 0.0625
    # diffusive cap wins when smaller
    assert float(compute_dt((Vx, Vy), di, dt_diff=0.01)) == 0.01


# --- rock ratio (reference variational_stokes/mask.jl, test_rockratio.jl) ---
def test_rock_ratio_air_mask():
    ni = (4, 3)
    # phase 0 = rock, phase 1 = air; right column pure air
    pr = np.zeros(ni + (2,))
    pr[..., 0] = 1.0
    pr[3, :, 0] = 0.0
    pr[3, :, 1] = 1.0
    from justrelax_tpu.rheology.phases import phase_ratios_from_field

    field = np.zeros(ni, dtype=int)
    field[3, :] = 1  # right column pure air
    ratios = phase_ratios_from_field(jnp.asarray(field), 2)
    phi = update_rock_ratio(ratios, air_phase=1)
    c = np.asarray(phi.center)
    assert c.shape == ni
    np.testing.assert_allclose(c[:3, :], 1.0)
    np.testing.assert_allclose(c[3, :], 0.0)
    masks = valid_masks(phi)
    # a face between rock and air is still valid; faces inside pure air not
    assert not np.asarray(masks.c)[3, :].any()
    assert np.asarray(masks.c)[:3, :].all()


# --- DYREL helpers (reference test_dyrel_kernels.jl + Gershgorin.jl) --------
def test_alpha_beta_closed_form():
    lmax, cV, CFL = jnp.asarray(16.0), jnp.asarray(0.5), 0.99
    dtau, alpha, beta = _alpha_beta(lmax, cV, CFL)
    d = 2.0 / 4.0 * 0.99
    assert float(dtau) == d
    np.testing.assert_allclose(float(alpha), (2.0 - 0.5 * d) / (2.0 + 0.5 * d))
    np.testing.assert_allclose(float(beta), 2.0 * d / (2.0 + 0.5 * d))


def test_penalty_harmonic_composition():
    from justrelax_tpu.rheology.materials import Material, MaterialStack

    ni = (4, 4)
    pr = jnp.ones(ni + (1,))
    eta = jnp.full(ni, 2.0)
    dt = 0.5
    # finite Kb: gamma_eff = harmonic(gfact*eta, Kb*dt)
    mat = MaterialStack.make([Material(Kb=8.0, G=1.0)])
    _, g_eff = compute_bulk_viscosity_and_penalty(mat, pr, eta, gfact=10.0, dt=dt)
    gn, gp = 10.0 * 2.0, 8.0 * 0.5
    np.testing.assert_allclose(np.asarray(g_eff), gp * gn / (gp + gn))
    # incompressible: the reference sets gamma_phy = gamma_num when Kb*dt is
    # infinite (constructors.jl:249-251), so gamma_eff = gamma_num/2
    mat_i = MaterialStack.make([Material(Kb=jnp.inf, G=1.0)])
    _, g_inf = compute_bulk_viscosity_and_penalty(mat_i, pr, eta, gfact=10.0, dt=dt)
    np.testing.assert_allclose(np.asarray(g_inf), gn / 2.0)


def test_gershgorin_constant_viscosity_closed_form():
    """Transcription lock of Gershgorin.jl:21-155 for uniform η, γ, viscous
    limit (G = ∞ ⇒ η_ve = η): hand-evaluated diagonal and row-sum bound."""
    from justrelax_tpu.rheology.materials import Material, MaterialStack

    ni = (6, 5)
    eta0, gamma0 = 2.0, 7.0
    eta = jnp.full(ni, eta0)
    eta_v = jnp.full((7, 6), eta0)
    gamma = jnp.full(ni, gamma0)
    pr_c = jnp.ones(ni + (1,))
    pr_v = jnp.ones((7, 6, 1))
    mat = MaterialStack.make([Material(G=jnp.inf, Kb=jnp.inf)])
    di = (0.25, 0.2)
    Dx, Dy, lx, ly = gershgorin_schur_2d(eta, eta_v, gamma, pr_c, pr_v, mat, di, dt=1.0)
    _dx, _dy = 1.0 / di[0], 1.0 / di[1]
    # Dx = (ηN+ηS)·_dy² + (γE+γW+4/3(ηE+ηW))·_dx²  (all equal here)
    Dx_want = 2 * eta0 * _dy**2 + (2 * gamma0 + 8.0 / 3.0 * eta0) * _dx**2
    np.testing.assert_allclose(np.asarray(Dx), Dx_want)
    # row sums: Cxx = 2η·_dy² + 2|γ+4/3η|·_dx² + Dx ; Cxy = 4|γ−2/3η+η|·_dx·_dy
    Cxx = 2 * eta0 * _dy**2 + 2 * (gamma0 + 4.0 / 3.0 * eta0) * _dx**2 + Dx_want
    Cxy = 4 * abs(gamma0 - 2.0 / 3.0 * eta0 + eta0) * _dx * _dy
    np.testing.assert_allclose(np.asarray(lx), (Cxx + Cxy) / Dx_want)
    # Dy twin
    Dy_want = (2 * gamma0 + 8.0 / 3.0 * eta0) * _dy**2 + 2 * eta0 * _dx**2
    np.testing.assert_allclose(np.asarray(Dy), Dy_want)
    assert np.all(np.asarray(ly) > 1.0)  # Gershgorin bound exceeds unity
