"""DYREL with nonlinear (power-law) viscosity refresh
(reference solve_DYREL! with linear_viscosity=false,
stress_kernels.jl:95-135 fused τII-viscosity update + Gershgorin refresh)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from justrelax_tpu.core.grid import Geometry
from justrelax_tpu.core.state import StokesState
from justrelax_tpu.ops.bc import Faces, VelocityBoundaryConditions, flow_bcs
from justrelax_tpu.rheology.materials import Material, MaterialStack
from justrelax_tpu.rheology.viscosity import phase_viscosity
from justrelax_tpu.solvers.dyrel import solve_dyrel


def _setup(n=24, eps_bg=1.0):
    ni = (n, n)
    geometry = Geometry(ni, (1.0, 1.0))
    xci, xvi = geometry.xci, geometry.xvi
    common = dict(
        rho0=0.0, Kb=4.0, is_plastic=1.0,
        C=1.6 / math.cos(math.radians(30)), friction_angle=30.0, eta_reg=8e-3,
    )
    mat = MaterialStack.make([
        Material(G=1.0, disl_A=0.5, disl_n=3.0, **common),
        Material(G=0.5, disl_A=5.0, disl_n=3.0, **common),
    ])

    def circ(xs, ys):
        X, Y = np.meshgrid(np.asarray(xs), np.asarray(ys), indexing="ij")
        r = np.zeros(X.shape + (2,))
        inside = (X - 0.5) ** 2 + (Y - 0.5) ** 2 < 0.01
        r[..., 1] = inside
        r[..., 0] = ~inside
        return jnp.asarray(r)

    prc, prv = circ(xci[0], xci[1]), circ(xvi[0], xvi[1])
    stokes = StokesState.make(ni)
    Vx = jnp.broadcast_to((eps_bg * jnp.asarray(xvi[0]))[:, None], (n + 1, n + 2))
    Vy = jnp.broadcast_to((-eps_bg * jnp.asarray(xvi[1]))[None, :], (n + 2, n + 1))
    bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True)
    )
    Vx, Vy = flow_bcs((Vx, Vy), bc)
    eta0 = phase_viscosity(mat, jnp.full(ni, eps_bg), None, prc, "eps")
    eta0v = phase_viscosity(
        mat, jnp.full((n + 1, n + 1), eps_bg), None, prv, "eps"
    )
    stokes = stokes.replace(
        V=stokes.V.replace(Vx=Vx, Vy=Vy),
        viscosity=stokes.viscosity.replace(eta=eta0, eta_v=eta0v),
    )
    return stokes, geometry, bc, mat, prc, prv, eta0


@pytest.mark.slow
def test_dyrel_nonlinear_viscosity_refresh():
    stokes, geometry, bc, mat, prc, prv, eta0 = _setup()
    st, info = solve_dyrel(
        stokes, geometry, bc, mat, prc, prv, 0.25,
        linear_viscosity=False, viscosity_relaxation=0.5,
        viscosity_cutoff=(1e-3, 1e3), eps=1e-6, nout=100,
        iter_max=20_000, total_iter_max=200_000,
    )
    assert float(info.err) < 1.0e-6
    assert int(info.iters) < 200_000
    eta_f = np.asarray(st.viscosity.eta)
    # the refresh moved the viscosity away from the strain-rate guess toward
    # the stress-consistent power-law values (n=3: eta = tauII^-2/(2A))
    assert abs(eta_f.max() / float(eta0.max()) - 1.0) > 0.5
    tII = np.asarray(st.tau.II)
    A_bg = 0.5
    expect_bg = 0.5 / A_bg * np.median(tII) ** (1.0 - 3.0)
    med = np.median(eta_f)
    assert 0.3 * expect_bg < med < 3.0 * expect_bg


@pytest.mark.slow
def test_dyrel_linear_flag_unchanged():
    """linear_viscosity=True keeps the viscosity field untouched."""
    stokes, geometry, bc, mat, prc, prv, eta0 = _setup()
    st, info = solve_dyrel(
        stokes, geometry, bc, mat, prc, prv, 0.25,
        eps=1e-6, nout=100, iter_max=20_000, total_iter_max=200_000,
    )
    np.testing.assert_array_equal(
        np.asarray(st.viscosity.eta), np.asarray(eta0)
    )
    assert float(info.err) < 1.0e-6
