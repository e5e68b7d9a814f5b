"""Nonuniform (vector-spacing) 2D Stokes (reference nonuniform named
spacings _di.center/_di.vertex threaded through the velocity/stress kernels,
src/grid/Grid.jl:69-131 + VelocityKernels.jl)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from justrelax_tpu.core.coeffs import PTStokesCoeffs
from justrelax_tpu.core.grid import Geometry, NonuniformGeometry
from justrelax_tpu.core.state import StokesState
from justrelax_tpu.ops.bc import Faces, VelocityBoundaryConditions
from justrelax_tpu.solvers.stokes2d import solve_ve


def _stretched(n, L, beta=1.5):
    s = np.linspace(-1.0, 1.0, n + 1)
    return 0.5 * L * (np.tanh(beta * s) / np.tanh(beta) + 1.0)


def _solve(geometry, iter_max=500_000, nout=5_000):
    ni = geometry.ni
    stokes = StokesState.make(ni)
    X, Y = geometry.cell_centers_mesh()
    rho = jnp.asarray(-np.sin(np.pi * np.asarray(Y)) * np.cos(np.pi * np.asarray(X)))
    stokes = stokes.replace(viscosity=stokes.viscosity.replace(eta=jnp.ones(ni)))
    pt = PTStokesCoeffs.make(
        geometry.li, geometry.di, CFL=1.0 / math.sqrt(2.1), eps_abs=1.0e-9,
        eps_rel=1.0e-12,
    )
    bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True)
    )
    G = jnp.full(ni, jnp.inf)
    K = jnp.asarray(jnp.inf)
    return solve_ve(
        stokes, pt, geometry, bc, (jnp.zeros(ni), rho), G, K, jnp.inf,
        iter_max=iter_max, nout=nout,
    )


@pytest.mark.slow
def test_uniform_vector_matches_scalar():
    """NonuniformGeometry with uniform vertices reproduces the scalar path."""
    g_u = Geometry((24, 24), (1.0, 1.0))
    g_v = NonuniformGeometry(
        (np.linspace(0, 1, 25), np.linspace(0, 1, 25))
    )
    s1, i1 = _solve(g_u, iter_max=20_000, nout=2_000)
    s2, i2 = _solve(g_v, iter_max=20_000, nout=2_000)
    np.testing.assert_allclose(
        np.asarray(s2.V.Vx), np.asarray(s1.V.Vx), atol=1e-13
    )
    np.testing.assert_allclose(np.asarray(s2.P), np.asarray(s1.P), atol=1e-12)


@pytest.mark.slow
def test_isoviscous_solcx_on_stretched_grid():
    """Isoviscous SolCx (max|V| = 1/(4π²)) on a tanh-stretched grid:
    accurate and 2nd-order convergent."""
    vref = 1.0 / (4.0 * np.pi**2)

    def vmax_err(n):
        g = NonuniformGeometry((_stretched(n, 1.0), _stretched(n, 1.0)))
        s, info = _solve(g)
        assert float(info.err) < 1.0e-8
        vmax = max(
            np.abs(np.asarray(s.V.Vx)).max(), np.abs(np.asarray(s.V.Vy)).max()
        )
        return abs(vmax - vref) / vref

    e16 = vmax_err(16)
    e32 = vmax_err(32)
    assert e16 < 0.05
    assert e32 < 0.45 * e16  # ~4x drop for 2nd order


def _fs_solve(geometry, iter_max=40_000, nout=1_000):
    """Free-surface-stabilized solve: layered density (sharp vertical ∂ρg/∂y
    exercises the correction term) with a finite stabilization dt."""
    ni = geometry.ni
    stokes = StokesState.make(ni)
    X, Y = geometry.cell_centers_mesh()
    # light layer above a laterally-perturbed dense layer: flow + sharp ∂ρg/∂y
    rho = jnp.asarray(np.where(
        np.asarray(Y) > 0.7, 0.1,
        1.0 + 0.3 * np.sin(np.pi * np.asarray(X)),
    ))
    stokes = stokes.replace(viscosity=stokes.viscosity.replace(eta=jnp.ones(ni)))
    pt = PTStokesCoeffs.make(
        geometry.li, geometry.di, CFL=1.0 / math.sqrt(2.1), eps_abs=1.0e-9,
        eps_rel=1.0e-12,
    )
    bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True)
    )
    G = jnp.full(ni, jnp.inf)
    K = jnp.asarray(jnp.inf)
    return solve_ve(
        stokes, pt, geometry, bc, (jnp.zeros(ni), rho), G, K, 0.05,
        iter_max=iter_max, nout=nout, free_surface=True,
    )


@pytest.mark.slow
def test_free_surface_on_nonuniform():
    """Free-surface stabilization on nonuniform grids (reference
    VelocityKernels.jl:135-180 nonuniform variant): uniform-vector geometry
    reproduces the scalar path; a stretched grid converges with the
    correction active (Vy differs from the uncorrected solve)."""
    s1, _ = _fs_solve(Geometry((16, 16), (1.0, 1.0)), iter_max=10_000)
    s2, _ = _fs_solve(
        NonuniformGeometry((np.linspace(0, 1, 17), np.linspace(0, 1, 17))),
        iter_max=10_000,
    )
    np.testing.assert_allclose(
        np.asarray(s2.V.Vy), np.asarray(s1.V.Vy), atol=1e-13
    )

    g = NonuniformGeometry((_stretched(16, 1.0), _stretched(16, 1.0)))
    s, info = _fs_solve(g)
    assert float(info.err) < 1.0e-8
    # correction active: differs from the same solve without free_surface
    ni = g.ni
    st = StokesState.make(ni)
    X, Y = g.cell_centers_mesh()
    rho = jnp.asarray(np.where(
        np.asarray(Y) > 0.7, 0.1,
        1.0 + 0.3 * np.sin(np.pi * np.asarray(X)),
    ))
    st = st.replace(viscosity=st.viscosity.replace(eta=jnp.ones(ni)))
    pt = PTStokesCoeffs.make(g.li, g.di, CFL=1.0 / math.sqrt(2.1),
                             eps_abs=1.0e-9, eps_rel=1.0e-12)
    bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True)
    )
    s0, _ = solve_ve(
        st, pt, g, bc, (jnp.zeros(ni), rho), jnp.full(ni, jnp.inf),
        jnp.asarray(jnp.inf), 0.05, iter_max=40_000, nout=1_000,
    )
    assert np.abs(np.asarray(s.V.Vy) - np.asarray(s0.V.Vy)).max() > 1e-6


# ---------------------------------------------------------------------------
# VEP solver on nonuniform grids (the GeoParams driver runs on the same
# _di_center/_di_vertex velocity kernels, VelocityKernels.jl:109-260)
# ---------------------------------------------------------------------------
def _vep_solve(geometry, nt=6, dt=0.25):
    from justrelax_tpu.ops.bc import flow_bcs
    from justrelax_tpu.rheology.materials import Material, MaterialStack
    from justrelax_tpu.solvers.stokes2d_vep import solve_vep

    ni = geometry.ni
    mat = MaterialStack.make([
        Material(G=1.0, Kb=4.0, eta0=1.0, is_plastic=1.0,
                 C=0.8 / math.cos(math.radians(30.0)), friction_angle=30.0,
                 eta_reg=8.0e-3)
    ])
    stokes = StokesState.make(ni)
    stokes = stokes.replace(viscosity=stokes.viscosity.replace(eta=jnp.ones(ni)))
    xv, yv = (jnp.asarray(v) for v in geometry.xvi)
    Vx = jnp.broadcast_to((1.0 * xv)[:, None], (ni[0] + 1, ni[1] + 2))
    Vy = jnp.broadcast_to((-1.0 * yv)[None, :], (ni[0] + 2, ni[1] + 1))
    bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True)
    )
    Vx, Vy = flow_bcs((Vx, Vy), bc)
    stokes = stokes.replace(V=stokes.V.replace(Vx=Vx, Vy=Vy))
    pt = PTStokesCoeffs.make(
        geometry.li, geometry.di, eps_rel=1.0e-8, eps_abs=1.0e-8,
        CFL=0.9 / math.sqrt(2.1),
    )
    info = None
    for _ in range(nt):
        stokes, info = solve_vep(
            stokes, pt, geometry, bc, mat, None, None, dt,
            iter_max=20_000, iter_min=100, nout=100,
        )
    return stokes, info


@pytest.mark.slow
def test_vep_uniform_vector_matches_scalar():
    """solve_vep on a NonuniformGeometry with uniform vertices reproduces
    the scalar-spacing path to roundoff."""
    s1, _ = _vep_solve(Geometry((16, 16), (1.0, 1.0)), nt=3)
    s2, _ = _vep_solve(
        NonuniformGeometry((np.linspace(0, 1, 17), np.linspace(0, 1, 17))),
        nt=3,
    )
    np.testing.assert_allclose(
        np.asarray(s2.V.Vx), np.asarray(s1.V.Vx), atol=1e-13
    )
    np.testing.assert_allclose(
        np.asarray(s2.tau.II), np.asarray(s1.tau.II), atol=1e-13
    )
    np.testing.assert_allclose(np.asarray(s2.P), np.asarray(s1.P), atol=1e-12)


@pytest.mark.slow
def test_vep_plastic_capping_on_stretched_grid():
    """Drucker-Prager capping holds on a tanh-stretched grid: τII stays at
    or below the yield envelope (small regularized overshoot) and the
    plastic multiplier activates."""
    g = NonuniformGeometry((_stretched(16, 1.0), _stretched(16, 1.0)))
    stokes, info = _vep_solve(g, nt=8, dt=0.25)
    assert float(info.err) < 1.0e-6
    tII = np.asarray(stokes.tau.II)
    P = np.asarray(stokes.P)
    F = tII - 0.8 - P * math.sin(math.radians(30.0))
    assert F.max() < 0.05
    assert float(jnp.max(stokes.lam)) > 0.0


# ---------------------------------------------------------------------------
# Variational (sticky-air) solver on nonuniform grids
# ---------------------------------------------------------------------------
def _variational_solve(geometry):
    from justrelax_tpu.ops.rock_ratio import update_rock_ratio
    from justrelax_tpu.rheology.materials import Material, MaterialStack
    from justrelax_tpu.rheology.phases import phase_ratios_from_field
    from justrelax_tpu.solvers.stokes2d_variational import solve_variational

    ni = geometry.ni
    X, Y = (np.asarray(A) for A in geometry.cell_centers_mesh())
    phase = np.zeros(ni, dtype=int)
    phase[Y > 0.75] = 1  # air
    phase[(X - 0.5) ** 2 + (Y - 0.4) ** 2 <= 0.1**2] = 2  # dense blob
    pr = phase_ratios_from_field(jnp.asarray(phase), 3)
    phi = update_rock_ratio(pr, air_phase=1)
    mats = MaterialStack.make([
        Material(rho0=1.0, eta0=1.0, gravity=10.0),
        Material(rho0=0.0, eta0=1.0e-3, gravity=10.0),  # air
        Material(rho0=2.0, eta0=1.0, gravity=10.0),
    ])
    pt = PTStokesCoeffs.make(
        geometry.li, geometry.di, eps_rel=1e-6, CFL=1.0 / math.sqrt(2.1)
    )
    bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True)
    )
    s0 = StokesState.make(ni)
    return solve_variational(
        s0, pt, geometry, bc, mats, pr.center, pr.vertex, phi, jnp.inf,
        iter_max=30_000, nout=500,
    ), phi


@pytest.mark.slow
def test_variational_uniform_vector_matches_scalar():
    """solve_variational on a NonuniformGeometry with uniform vertices
    reproduces the scalar-spacing path to roundoff."""
    (s1, _), _ = _variational_solve(Geometry((24, 24), (1.0, 1.0)))
    (s2, _), _ = _variational_solve(
        NonuniformGeometry((np.linspace(0, 1, 25), np.linspace(0, 1, 25)))
    )
    np.testing.assert_allclose(
        np.asarray(s2.V.Vy), np.asarray(s1.V.Vy), atol=1e-12
    )
    np.testing.assert_allclose(np.asarray(s2.P), np.asarray(s1.P), atol=1e-12)


@pytest.mark.slow
def test_variational_sticky_air_on_stretched_grid():
    """Sticky-air blob sink on a tanh-stretched grid: converges, air faces
    at rest, blob sinks."""
    from justrelax_tpu.ops.rock_ratio import valid_masks

    g = NonuniformGeometry((_stretched(24, 1.0), _stretched(24, 1.0)))
    (s, info), phi = _variational_solve(g)
    assert float(info.err) < 1.0e-4
    vm = valid_masks(phi)
    Vy_in = np.asarray(s.V.Vy[1:-1, 1:-1])
    assert np.abs(Vy_in[~np.asarray(vm.vy)[:, 1:-1]]).max() == 0.0
    X, Y = (np.asarray(A) for A in g.cell_centers_mesh())
    blob = ((X - 0.5) ** 2 + (Y - 0.4) ** 2 <= 0.1**2)[:, :-1]
    assert Vy_in[blob].mean() < 0
