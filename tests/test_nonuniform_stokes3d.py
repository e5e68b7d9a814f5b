"""Nonuniform (vector-spacing) 3D Stokes (reference nonuniform named
spacings _di.center/_di.vertex threaded through the 3D velocity/stress
kernels, src/grid/Grid.jl:262-316 + VelocityKernels.jl 3D `_di` variants).

Mirrors tests/test_nonuniform_stokes.py: uniform-vector grids must bit-match
the scalar-spacing path, and a genuinely stretched grid must still solve the
Taylor-Green manufactured solution accurately (that solution exercises every
spacing family: divergence, edge shear strains, and all momentum gradients).
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from justrelax_tpu.core.coeffs import PTStokesCoeffs
from justrelax_tpu.core.grid import Geometry, NonuniformGeometry
from justrelax_tpu.core.state import StokesState
from justrelax_tpu.models import taylor_green
from justrelax_tpu.ops.bc import Faces, VelocityBoundaryConditions


def _stretched(n, L, beta=1.2):
    s = np.linspace(-1.0, 1.0, n + 1)
    return 0.5 * L * (np.tanh(beta * s) / np.tanh(beta) + 1.0)


@pytest.mark.slow
def test_ve3d_uniform_vector_matches_scalar():
    """NonuniformGeometry with uniform vertices reproduces the scalar path
    bit-for-bit through the full VE solve (Taylor-Green forcing)."""
    n = 12
    g_u = Geometry((n, n, n), (1.0, 1.0, 1.0))
    g_v = NonuniformGeometry(tuple(np.linspace(0.0, 1.0, n + 1) for _ in range(3)))
    _, s1, i1 = taylor_green.run(iter_max=2_000, nout=500, geometry=g_u)
    _, s2, i2 = taylor_green.run(iter_max=2_000, nout=500, geometry=g_v)
    np.testing.assert_allclose(np.asarray(s2.V.Vx), np.asarray(s1.V.Vx), atol=1e-13)
    np.testing.assert_allclose(np.asarray(s2.V.Vz), np.asarray(s1.V.Vz), atol=1e-13)
    np.testing.assert_allclose(np.asarray(s2.P), np.asarray(s1.P), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(s2.tau.xy), np.asarray(s1.tau.xy), atol=1e-13
    )


@pytest.mark.slow
def test_taylor_green_on_stretched_grid():
    """Manufactured 3D Stokes solution on a tanh-stretched grid: the
    vector-spacing kernels must stay consistent (converged residual) and
    accurate (velocity/pressure error comparable to the uniform grid at the
    same resolution; reference accuracy tier tests/test_taylor_green.py)."""
    n = 16
    g = NonuniformGeometry(tuple(_stretched(n, 1.0) for _ in range(3)))
    geometry, stokes, info = taylor_green.run(
        iter_max=50_000, nout=1_000, geometry=g
    )
    assert float(info.err) < 1e-8
    Vx_a, Vy_a, Vz_a, P_a = taylor_green.analytic_fields(geometry)
    Vx = np.asarray(stokes.V.Vx)[:, 1:-1, 1:-1]
    err_v = np.abs(Vx - Vx_a).max() / np.abs(Vx_a).max()
    P = np.asarray(stokes.P)
    err_p = np.abs((P - P.mean()) - (P_a - P_a.mean())).max() / np.abs(P_a).max()
    # uniform n=16 measures 1.2% / 2.5% (tests/test_taylor_green.py); the
    # stretched grid concentrates points near the boundary so the interior
    # coarsens — allow a modest factor
    assert err_v < 0.05
    assert err_p < 0.10


@pytest.mark.slow
def test_vep3d_uniform_vector_matches_scalar():
    """Full 3D VEP (fused return mapping) on a uniform-vector grid bit-matches
    the scalar path across a loading step."""
    from justrelax_tpu.models import solvi3d  # noqa: F401  (import check)
    from justrelax_tpu.rheology.materials import Material, MaterialStack
    from justrelax_tpu.solvers.stokes3d_vep import solve_vep_3d

    n = 10
    ni = (n, n, n)
    mat = MaterialStack.make([Material(
        rho0=0.0, G=1.0, Kb=4.0, eta0=1.0, is_plastic=1.0,
        C=1.6 / math.cos(math.radians(30.0)), friction_angle=30.0,
        eta_reg=8.0e-3,
    )])
    bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True,
                        front=True, back=True)
    )

    def solve(geometry):
        stokes = StokesState.make(ni)
        xv = jnp.asarray(geometry.xvi[0])
        zv = jnp.asarray(geometry.xvi[2])
        Vx = jnp.broadcast_to(xv[:, None, None], (n + 1, n + 2, n + 2))
        Vz = jnp.broadcast_to((-zv)[None, None, :], (n + 2, n + 2, n + 1))
        stokes = stokes.replace(V=stokes.V.replace(Vx=Vx, Vz=Vz))
        pt = PTStokesCoeffs.make(
            geometry.li, geometry.di, eps_rel=1.0e-6,
            CFL=0.9 / math.sqrt(3.0),
        )
        return solve_vep_3d(
            stokes, pt, geometry, bc, mat, None, (None, None, None),
            0.25, iter_max=3_000, nout=500,
        )

    g_u = Geometry(ni, (1.0, 1.0, 1.0))
    g_v = NonuniformGeometry(tuple(np.linspace(0.0, 1.0, n + 1) for _ in range(3)))
    s1, i1 = solve(g_u)
    s2, i2 = solve(g_v)
    np.testing.assert_allclose(np.asarray(s2.V.Vx), np.asarray(s1.V.Vx), atol=1e-13)
    np.testing.assert_allclose(np.asarray(s2.P), np.asarray(s1.P), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(s2.tau.xy), np.asarray(s1.tau.xy), atol=1e-13
    )


@pytest.mark.slow
def test_variational3d_uniform_vector_matches_scalar():
    """Masked variational 3D on a uniform-vector grid bit-matches scalar."""
    from justrelax_tpu.ops.rock_ratio import RockRatio3D
    from justrelax_tpu.solvers.stokes3d_variational import solve_variational_3d

    def all_rock(ni):
        nx, ny, nz = ni
        return RockRatio3D(
            center=jnp.ones(ni),
            vertex=jnp.ones((nx + 1, ny + 1, nz + 1)),
            Vx=jnp.ones((nx + 1, ny, nz)),
            Vy=jnp.ones((nx, ny + 1, nz)),
            Vz=jnp.ones((nx, ny, nz + 1)),
            xy=jnp.ones((nx + 1, ny + 1, nz)),
            xz=jnp.ones((nx + 1, ny, nz + 1)),
            yz=jnp.ones((nx, ny + 1, nz + 1)),
        )

    n = 10
    ni = (n, n, n)
    bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True,
                        front=True, back=True)
    )

    def solve(geometry):
        stokes = StokesState.make(ni)
        stokes = stokes.replace(
            viscosity=stokes.viscosity.replace(eta=jnp.ones(ni))
        )
        X, Y, Z = geometry.cell_centers_mesh()
        rho = jnp.asarray(
            np.where(np.asarray(Z) > 0.5, 0.0, 1.0)
            + 0.1 * np.sin(np.pi * np.asarray(X))
        )
        # all-rock ratio (φ ≡ 1): the masked path must equal plain VE
        phi = all_rock(ni)
        pt = PTStokesCoeffs.make(
            geometry.li, geometry.di, eps_rel=1.0e-8,
            CFL=0.9 / math.sqrt(3.0),
        )
        G = jnp.full(ni, jnp.inf)
        K = jnp.full(ni, jnp.inf)
        return solve_variational_3d(
            stokes, pt, geometry, bc,
            (jnp.zeros(ni), jnp.zeros(ni), rho), G, K, phi, jnp.inf,
            iter_max=2_000, nout=500,
        )

    g_u = Geometry(ni, (1.0, 1.0, 1.0))
    g_v = NonuniformGeometry(tuple(np.linspace(0.0, 1.0, n + 1) for _ in range(3)))
    s1, _ = solve(g_u)
    s2, _ = solve(g_v)
    np.testing.assert_allclose(np.asarray(s2.V.Vz), np.asarray(s1.V.Vz), atol=1e-13)
    np.testing.assert_allclose(np.asarray(s2.P), np.asarray(s1.P), atol=1e-12)
