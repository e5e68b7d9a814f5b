"""SolCx analytic Stokes benchmark (reference miniapps/benchmarks/stokes2D/solcx).

Unit box, viscosity jump Δη at x=0.5 (smoothed 5×), buoyancy
ρ = −sin(πy)cos(πx), free slip on all faces, incompressible viscous limit
(G = K = ∞). Oracle (reference test_stokes_solcx.jl:26-36): final absolute
residual < 1e-8 at 32², Δη=1e6.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from justrelax_tpu.core.coeffs import PTStokesCoeffs
from justrelax_tpu.core.grid import Geometry
from justrelax_tpu.core.state import StokesState
from justrelax_tpu.ops.bc import Faces, VelocityBoundaryConditions
from justrelax_tpu.solvers.stokes2d import solve_ve


def solcx_viscosity(geometry, d_eta=1.0e6, n_smooth=5):
    """Step viscosity at cell centers, diffusion-smoothed ``n_smooth`` times
    with edge replication (reference SolCx.jl smooth! loop)."""
    xc = geometry.xci[0]
    nx, ny = geometry.ni
    eta = np.where(xc <= 0.5, 1.0, d_eta)[:, None] * np.ones((1, ny))
    for _ in range(n_smooth):
        eta2 = eta.copy()
        eta2[1:-1, 1:-1] = eta[1:-1, 1:-1] + (1.0 / 4.1) * (
            eta[:-2, 1:-1] - 2 * eta[1:-1, 1:-1] + eta[2:, 1:-1]
            + eta[1:-1, :-2] - 2 * eta[1:-1, 1:-1] + eta[1:-1, 2:]
        )
        eta2[0, :] = eta2[1, :]
        eta2[-1, :] = eta2[-2, :]
        eta2[:, 0] = eta2[:, 1]
        eta2[:, -1] = eta2[:, -2]
        eta = eta2
    return eta


def solcx_density(geometry):
    X, Y = geometry.cell_centers_mesh()
    return -np.sin(np.pi * Y) * np.cos(np.pi * X)


def run(nx=32, ny=32, d_eta=1.0e6, lx=1.0, ly=1.0, iter_max=500_000, nout=5_000, dtype=None):
    ni = (nx, ny)
    geometry = Geometry(ni, (lx, ly))
    stokes = StokesState.make(ni, dtype=dtype)
    pt_stokes = PTStokesCoeffs.make(
        geometry.li,
        geometry.di,
        CFL=1.0 / math.sqrt(2.1),
        eps_abs=1.0e-8,
        eps_rel=1.0e-9,
    )
    eta = jnp.asarray(solcx_viscosity(geometry, d_eta), stokes.P.dtype)
    stokes = stokes.replace(viscosity=stokes.viscosity.replace(eta=eta))
    rho = solcx_density(geometry)
    rho_g = (jnp.zeros(ni, stokes.P.dtype), jnp.asarray(rho, stokes.P.dtype))

    flow_bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True)
    )
    G = jnp.full(ni, jnp.inf, stokes.P.dtype)
    K = jnp.full(ni, jnp.inf, stokes.P.dtype)

    stokes, info = solve_ve(
        stokes,
        pt_stokes,
        geometry,
        flow_bc,
        rho_g,
        G,
        K,
        0.1,
        iter_max=iter_max,
        nout=nout,
    )
    return geometry, stokes, info, rho
