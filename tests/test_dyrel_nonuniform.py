"""DYREL on nonuniform (vector-spacing) grids — the reference DYREL kernels
take _di.center/_di.vertex throughout (DYREL/velocity_kernels.jl:33-58,
Gershgorin.jl:45-46,106-107) and its refined miniapps
(DYREL2D/convection/Layered_convection2D_DYREL_refined.jl) run on
tanh-refined grids."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from justrelax_tpu.core.grid import Geometry, NonuniformGeometry
from justrelax_tpu.core.state import StokesState
from justrelax_tpu.core.coeffs import PTStokesCoeffs
from justrelax_tpu.ops.bc import Faces, VelocityBoundaryConditions
from justrelax_tpu.rheology.materials import Material, MaterialStack
from justrelax_tpu.solvers.dyrel import solve_dyrel
from justrelax_tpu.solvers.stokes2d import solve_ve


def _stretched(n, L, beta=1.5):
    s = np.linspace(-1.0, 1.0, n + 1)
    return 0.5 * L * (np.tanh(beta * s) / np.tanh(beta) + 1.0)


def _dyrel_buoyant(geometry, n):
    ni = geometry.ni
    stokes = StokesState.make(ni)
    X, Y = geometry.cell_centers_mesh()
    rho = jnp.asarray(
        -np.sin(np.pi * np.asarray(Y)) * np.cos(np.pi * np.asarray(X))
    )
    stokes = stokes.replace(
        viscosity=stokes.viscosity.replace(
            eta=jnp.ones(ni), eta_v=jnp.ones((n + 1, n + 1))
        )
    )
    material = MaterialStack.make([Material(rho0=0.0, eta0=1.0)])
    pr_c = jnp.ones(ni + (1,))
    pr_v = jnp.ones((n + 1, n + 1, 1))
    bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True)
    )
    s, info = solve_dyrel(
        stokes, geometry, bc, material, pr_c, pr_v, jnp.inf,
        rho_g=(jnp.zeros(ni), rho), eps=1.0e-8, nout=50,
    )
    return s, info, rho


@pytest.mark.slow
def test_dyrel_uniform_vector_matches_scalar():
    """NonuniformGeometry with uniform vertices reproduces the scalar DYREL
    path bit-closely."""
    n = 24
    g_u = Geometry((n, n), (1.0, 1.0))
    g_v = NonuniformGeometry(
        (np.linspace(0, 1, n + 1), np.linspace(0, 1, n + 1))
    )
    s_u, _, _ = _dyrel_buoyant(g_u, n)
    s_v, _, _ = _dyrel_buoyant(g_v, n)
    np.testing.assert_allclose(
        np.asarray(s_v.V.Vx), np.asarray(s_u.V.Vx), atol=1e-13)
    np.testing.assert_allclose(
        np.asarray(s_v.P), np.asarray(s_u.P), atol=1e-13)


@pytest.mark.slow
def test_dyrel_stretched_matches_apt():
    """On a tanh-stretched grid, DYREL and the APT solver agree on the
    buoyancy-driven solution (cross-solver consistency on the nonuniform
    path)."""
    n = 24
    g = NonuniformGeometry((_stretched(n, 1.0), _stretched(n, 1.0)))
    s_d, info_d, rho = _dyrel_buoyant(g, n)

    stokes = StokesState.make(g.ni)
    stokes = stokes.replace(viscosity=stokes.viscosity.replace(eta=jnp.ones(g.ni)))
    pt = PTStokesCoeffs.make(
        g.li, g.di, CFL=1.0 / math.sqrt(2.1), eps_abs=1.0e-9, eps_rel=1.0e-10,
    )
    bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True)
    )
    G = jnp.full(g.ni, jnp.inf)
    s_a, info_a = solve_ve(
        stokes, pt, g, bc, (jnp.zeros(g.ni), rho), G, jnp.asarray(jnp.inf),
        jnp.inf, iter_max=200_000, nout=2_000,
    )
    vmax = float(np.abs(np.asarray(s_a.V.Vy)).max())
    assert vmax > 0
    # velocity fields agree to ~0.2% of the max velocity
    diff = np.abs(np.asarray(s_d.V.Vy) - np.asarray(s_a.V.Vy)).max()
    assert diff < 2.0e-3 * vmax
