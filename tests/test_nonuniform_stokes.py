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


def test_free_surface_on_nonuniform_raises():
    g = NonuniformGeometry((_stretched(8, 1.0), np.linspace(0, 1, 9)))
    with pytest.raises(NotImplementedError, match="free_surface"):
        _ = solve_ve.__wrapped__(
            StokesState.make(g.ni),
            PTStokesCoeffs.make(g.li, g.di),
            g,
            VelocityBoundaryConditions(free_slip=Faces(left=True)),
            (jnp.zeros(g.ni), jnp.zeros(g.ni)),
            jnp.full(g.ni, jnp.inf), jnp.asarray(jnp.inf), jnp.inf,
            free_surface=True,
        )
