"""Thermal-stress magma chamber (Kiss 2023 physics) + melting module.

Covers the reference's melting layer (src/rheology/Melting.jl) and the
thermal-stress pressure coupling exercised by
miniapps/benchmarks/thermal_stress/Thermal_Stress_Magma_Chamber_nondim.jl.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from justrelax_tpu.rheology.melting import (
    MeltingCaricchi,
    MeltingPolynomial,
    MeltingQuadratic,
    NoMelting,
    bubble_flow_alpha,
    compute_melt_fraction,
    gas_pyroclast_alpha,
    melt_dependent_alpha,
    melt_dependent_density,
)


def test_caricchi_limits_and_midpoint():
    m = MeltingCaricchi()
    T = jnp.asarray([400.0 + 273.15, 800.0 + 273.15, 1200.0 + 273.15])
    phi = m.phi(T)
    assert phi[0] < 1.0e-7
    assert abs(float(phi[1]) - 0.5) < 1.0e-12  # θ=0 at 800 °C
    assert phi[2] > 1.0 - 1.0e-7
    # dϕ/dT matches finite differences
    h = 1.0e-3
    fd = (m.phi(T + h) - m.phi(T - h)) / (2 * h)
    np.testing.assert_allclose(np.asarray(m.dphi_dT(T)), np.asarray(fd), rtol=1e-4)


def test_quadratic_bounds_and_derivative():
    m = MeltingQuadratic(Ts=1000.0, Tl=1200.0)
    T = jnp.asarray([900.0, 1000.0, 1100.0, 1200.0, 1300.0])
    phi = np.asarray(m.phi(T))
    assert phi[0] == 0.0 and phi[1] == 0.0
    assert abs(phi[2] - 0.75) < 1e-12  # 1 - (1/2)^2
    assert phi[3] == 1.0 and phi[4] == 1.0
    h = 1.0e-4
    Tin = jnp.asarray([1050.0, 1150.0])
    fd = (m.phi(Tin + h) - m.phi(Tin - h)) / (2 * h)
    np.testing.assert_allclose(np.asarray(m.dphi_dT(Tin)), np.asarray(fd), rtol=1e-6)


def test_polynomial_matches_quadratic_form():
    # ϕ = 1 − ((Tl−T)/(Tl−Ts))² expanded as a polynomial in x = T/1000
    Ts, Tl = 1000.0, 1200.0
    d = (Tl - Ts) / 1.0e3
    a, b = Tl / 1.0e3, 1.0 / d
    # 1 - (a - x)²/d² = 1 - a²/d² + 2a x/d² − x²/d²
    poly = MeltingPolynomial(
        coeffs=(1.0 - (a * b) ** 2, 2.0 * a * b * b, -(b * b)), Ts=Ts, Tl=Tl
    )
    quad = MeltingQuadratic(Ts=Ts, Tl=Tl)
    T = jnp.linspace(900.0, 1300.0, 41)
    np.testing.assert_allclose(
        np.asarray(poly.phi(T)), np.asarray(quad.phi(T)), atol=1e-12
    )
    Tin = jnp.asarray([1050.0, 1150.0])
    np.testing.assert_allclose(
        np.asarray(poly.dphi_dT(Tin)), np.asarray(quad.dphi_dT(Tin)), rtol=1e-10
    )


def test_phase_averaged_melt_fraction():
    melting = (NoMelting(), MeltingCaricchi())
    T = jnp.full((4, 4), 1200.0 + 273.15)  # fully molten for phase 1
    ratios = jnp.zeros((4, 4, 2)).at[..., 1].set(0.25).at[..., 0].set(0.75)
    phi = compute_melt_fraction(melting, T, phase_ratios=ratios)
    np.testing.assert_allclose(np.asarray(phi), 0.25, atol=1e-6)
    with pytest.raises(ValueError):
        compute_melt_fraction(melting, T)


def test_melt_dependent_properties():
    phi = jnp.asarray([0.0, 0.5, 1.0])
    np.testing.assert_allclose(
        np.asarray(melt_dependent_alpha(1.0e-5, 3.0e-5, phi)),
        [1.0e-5, 2.0e-5, 3.0e-5],
    )
    np.testing.assert_allclose(
        np.asarray(melt_dependent_density(2700.0, 2300.0, phi)),
        [2700.0, 2500.0, 2300.0],
    )
    # gas-pyroclast: linear mixture in δ
    assert abs(gas_pyroclast_alpha(1.0e-5, 1.0e-3, 0.0) - 1.0e-5) < 1e-18
    # bubble flow: below cutoff c < c0 → α between melt and gas values
    a_bf = bubble_flow_alpha(
        jnp.asarray(1.0e-5), jnp.asarray(1.0e-3), jnp.asarray(1.0e4), c0=1.0e-2, a=4.0e-6
    )
    assert 1.0e-5 < float(a_bf) < 1.0e-3
    # above cutoff: c = c0 → pure melt
    a_sat = bubble_flow_alpha(
        jnp.asarray(1.0e-5), jnp.asarray(1.0e-3), jnp.asarray(1.0e10), c0=1.0e-2, a=4.0e-6
    )
    np.testing.assert_allclose(float(a_sat), 1.0e-5, rtol=1e-10)


@pytest.mark.slow
def test_magma_chamber_thermal_pressurization():
    from justrelax_tpu.models.thermal_stresses import run

    stokes, thermal, phi, info, chamber = run(nx=48, ny=48, nt=2)
    # converged by the relative criterion before hitting iter_max
    assert int(info.iters) < 100_000
    assert float(info.err) < 1.0e-5

    P = np.asarray(stokes.P)
    phi = np.asarray(phi)
    rr = np.hypot(*np.meshgrid(
        np.linspace(-1, 1, P.shape[0]), np.linspace(-1, 1, P.shape[1]),
        indexing="ij",
    ))  # normalized radius; chamber radius is 0.25
    # chamber core is molten, host rock is not (rim cells sit on the smoothed
    # thermal edge, so exclude them from the molten check)
    core = rr < 0.15
    assert phi[core].min() > 0.95
    assert phi[~chamber].max() < 0.5

    # conduction cools the chamber rim and heats the host shell:
    # positive over-pressure in the heated host, suction inside the rim,
    # both orders of magnitude above the far field
    far = rr > 0.8
    near = ~chamber & ~far
    assert P[near].max() > 10.0 * abs(P[far]).max()
    assert P[chamber].min() < -10.0 * abs(P[far]).max()
    # magnitude bounded by the elastic estimate K·α·|ΔT|
    dT = np.asarray(thermal.T - thermal.Told)[1:-1, 1:-1]
    bound = (1.0 / 6.0e-11) * 6.0e-5 * np.abs(dT).max()
    assert np.abs(P).max() < bound * 1.5


@pytest.mark.slow
def test_magma_chamber_thermal_pressurization_3d():
    """3D spherical chamber (reference
    Thermal_Stress_Magma_Chamber_nondim3D.jl): same Kiss 2023 coupling
    as the 2D test through solve_ve_3d's alpha_dT pressure source."""
    from justrelax_tpu.models.thermal_stresses import run_3d

    stokes, thermal, phi, info, chamber = run_3d(n=24, nt=2)
    assert int(info.iters) < 100_000
    assert float(info.err) < 1.0e-6

    P = np.asarray(stokes.P)
    phi = np.asarray(phi)
    ax = np.linspace(-1, 1, P.shape[0])
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    rr = np.sqrt(X**2 + Y**2 + Z**2)  # chamber radius 0.25 normalized
    core = rr < 0.15
    assert phi[core].min() > 0.95
    assert phi[~chamber].max() < 0.5

    far = rr > 0.8
    near = ~chamber & ~far
    assert P[near].max() > 10.0 * abs(P[far]).max()
    assert P[chamber].min() < -10.0 * abs(P[far]).max()
    dT = np.asarray(thermal.T - thermal.Told)[1:-1, 1:-1, 1:-1]
    bound = (1.0 / 6.0e-11) * 6.0e-5 * np.abs(dT).max()
    assert np.abs(P).max() < bound * 1.5
