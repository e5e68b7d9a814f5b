"""SolKz analytic Stokes benchmark
(reference miniapps/benchmarks/stokes2D/solkz/SolKz.jl).

Unit box with exponentially depth-dependent viscosity η = exp(B·y),
B = ln(Δη) = ln(1e6), buoyancy ρ = −sin(2y)·cos(3πx), free slip, Re = 5π.
Oracle (test_stokes_solkz.jl): final abs residual < 1e-8 at 32².
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


def run(nx=32, ny=32, d_eta=1.0e6, iter_max=500_000, nout=5_000, dtype=None):
    ni = (nx, ny)
    geometry = Geometry(ni, (1.0, 1.0))
    stokes = StokesState.make(ni, dtype=dtype)
    dt_f = stokes.P.dtype
    X, Y = geometry.cell_centers_mesh()
    eta = np.exp(math.log(d_eta) * Y)
    rho = -np.sin(2.0 * Y) * np.cos(3.0 * np.pi * X)
    stokes = stokes.replace(
        viscosity=stokes.viscosity.replace(eta=jnp.asarray(eta, dt_f))
    )
    rho_g = (jnp.zeros(ni, dt_f), jnp.asarray(rho, dt_f))
    pt_stokes = PTStokesCoeffs.make(
        geometry.li, geometry.di, Re=5.0 * math.pi, CFL=1.0 / math.sqrt(2.1)
    )
    flow_bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True)
    )
    G = jnp.full(ni, jnp.inf, dt_f)
    K = jnp.full(ni, jnp.inf, dt_f)
    stokes, info = solve_ve(
        stokes, pt_stokes, geometry, flow_bc, rho_g, G, K, 0.1,
        iter_max=iter_max, nout=nout,
    )
    return geometry, stokes, info
