"""Nonuniform (vector-spacing) grids: geometry + PT thermal diffusion.

Covers the reference's nonuniform grid constructor (src/grid/Grid.jl:69-131,
velocity_grids vector variants :272-316) and spacing-aware diffusion.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from justrelax_tpu.core.coeffs import PTThermalCoeffs
from justrelax_tpu.core.grid import Geometry, NonuniformGeometry
from justrelax_tpu.core.state import ThermalState
from justrelax_tpu.ops.bc import Faces, TemperatureBoundaryConditions, thermal_bcs
from justrelax_tpu.solvers.thermal import heatdiffusion_PT


def _stretched(n, L, beta=2.0):
    """tanh-clustered vertices on [0, L] (refined near the center)."""
    s = np.linspace(-1.0, 1.0, n + 1)
    x = np.tanh(beta * s) / np.tanh(beta)
    return 0.5 * L * (x + 1.0)


def test_geometry_properties():
    xv = _stretched(16, 2.0)
    yv = np.linspace(0.0, 1.0, 9)
    g = NonuniformGeometry((xv, yv))
    assert g.ni == (16, 8)
    assert abs(g.li[0] - 2.0) < 1e-14 and abs(g.li[1] - 1.0) < 1e-14
    np.testing.assert_allclose(np.asarray(g.xci[0]), 0.5 * (xv[1:] + xv[:-1]))
    # spacing families
    dc = np.asarray(g.di_center[0])
    np.testing.assert_allclose(dc, np.diff(xv))
    dv = np.asarray(g.di_vertex[0])
    assert dv.shape == (17,)
    np.testing.assert_allclose(dv[1:-1], np.diff(np.asarray(g.xci[0])))
    assert dv[0] == dc[0] and dv[-1] == dc[-1]
    # min spacing for CFL
    assert abs(g.di[0] - np.diff(xv).min()) < 1e-14
    # hashability: distinct grids hash differently, identical grids equal
    g2 = NonuniformGeometry((xv, yv))
    assert g == g2 and hash(g) == hash(g2)
    g3 = NonuniformGeometry((_stretched(16, 2.0, beta=1.0), yv))
    assert g != g3

    with pytest.raises(ValueError):
        NonuniformGeometry((xv[::-1], yv))  # decreasing


def _solve_steady(geometry, T_left, T_right, dt_mult=1.0):
    ni = geometry.ni
    thermal = ThermalState.make(ni)
    bc = TemperatureBoundaryConditions(
        constant_value=Faces(left=T_left, right=T_right),
        no_flux=Faces(top=True, bot=True),
    )
    X = geometry.cell_centers_mesh()[0]
    T0 = T_left + (T_right - T_left) * 0.5  # uniform start
    Tg = jnp.full((ni[0] + 2, ni[1] + 2), T0)
    Tj = thermal_bcs(Tg, bc)
    thermal = thermal.replace(T=Tj, Told=Tj)

    K = jnp.ones(ni)
    RhoCp = jnp.ones(ni)
    # big dt → effectively steady solve
    dt = 1.0e6 * dt_mult
    pt = PTThermalCoeffs.make(
        K, RhoCp, dt, geometry.di, geometry.li, eps=1.0e-11,
        CFL=0.95 / math.sqrt(2.0),
    )
    thermal, info = heatdiffusion_PT(
        thermal, pt, bc, dt, geometry, K=K, rho_Cp=RhoCp,
        iter_max=100_000, nout=500,
    )
    return thermal, info, X


def test_steady_linear_profile_exact_on_stretched_grid():
    """Steady conduction with Dirichlet ends is linear in x; the 2-point flux
    on center-distance spacings is exact for it — ANY stretching must
    reproduce T(x) = x to machine-level accuracy."""
    xv = _stretched(24, 1.0, beta=2.5)
    yv = np.linspace(0.0, 1.0, 7)
    g = NonuniformGeometry((xv, yv))
    thermal, info, X = _solve_steady(g, 0.0, 1.0)
    T = np.asarray(thermal.T)[1:-1, 1:-1]
    np.testing.assert_allclose(T, np.asarray(X), atol=5.0e-7)


def test_uniform_vector_matches_scalar_geometry():
    """A NonuniformGeometry built from uniform vertices must agree with the
    scalar-spacing Geometry path."""
    ni = (16, 8)
    g_u = Geometry(ni, (2.0, 1.0))
    g_v = NonuniformGeometry(
        (np.linspace(0, 2.0, 17), np.linspace(0, 1.0, 9))
    )
    t1, i1, _ = _solve_steady(g_u, 1.0, 3.0)
    t2, i2, _ = _solve_steady(g_v, 1.0, 3.0)
    np.testing.assert_allclose(
        np.asarray(t1.T), np.asarray(t2.T), atol=1e-12
    )


def test_transient_matches_fine_uniform_reference():
    """One transient step on a stretched grid vs a fine uniform reference,
    compared at the stretched cell centers."""
    L = 1.0
    xv = _stretched(32, L, beta=2.0)
    g_s = NonuniformGeometry((xv, np.linspace(0, 0.25, 3)))
    g_f = Geometry((512, 2), (L, 0.25))

    def run(geometry, dt):
        ni = geometry.ni
        thermal = ThermalState.make(ni)
        bc = TemperatureBoundaryConditions(
            constant_value=Faces(left=0.0, right=0.0),
            no_flux=Faces(top=True, bot=True),
        )
        X = geometry.cell_centers_mesh()[0]
        T0 = np.sin(np.pi * np.asarray(X) / L)
        Tg = np.zeros((ni[0] + 2, ni[1] + 2))
        Tg[1:-1, 1:-1] = T0
        Tj = thermal_bcs(jnp.asarray(Tg), bc)
        thermal = thermal.replace(T=Tj, Told=Tj)
        K = jnp.ones(ni)
        RhoCp = jnp.ones(ni)
        pt = PTThermalCoeffs.make(
            K, RhoCp, dt, geometry.di, geometry.li, eps=1.0e-10,
            CFL=0.95 / math.sqrt(2.0),
        )
        thermal, _ = heatdiffusion_PT(
            thermal, pt, bc, dt, geometry, K=K, rho_Cp=RhoCp,
            iter_max=100_000, nout=500,
        )
        return np.asarray(thermal.T)[1:-1, 1], np.asarray(X)[:, 0]

    dt = 0.01
    T_s, x_s = run(g_s, dt)
    T_f, x_f = run(g_f, dt)
    T_ref = np.interp(x_s, x_f, T_f)
    err32 = np.abs(T_s - T_ref).max()
    assert err32 < 8.0e-3  # spatial truncation where the tanh grid is coarsest

    # second-order convergence under grid refinement (same stretching law)
    g_s64 = NonuniformGeometry((_stretched(64, L, beta=2.0),
                                np.linspace(0, 0.25, 3)))
    T_s64, x_s64 = run(g_s64, dt)
    err64 = np.abs(T_s64 - np.interp(x_s64, x_f, T_f)).max()
    assert err64 < 0.35 * err32  # ~4x drop expected for 2nd order
