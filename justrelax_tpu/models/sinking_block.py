"""Sinking block benchmark (reference test_sinking_block.jl).

500×500 km box: mantle (η=1e21, ρ=3200) with a 100×100 km stiff dense block
(η=1e23, ρ=3300) centered at (250 km, −100 km depth); lithostatic initial
pressure; free slip. Oracle (test_sinking_block.jl:219-222): residual < 1e-5
and max velocity ≈ 4.8419e-10 m/s.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from justrelax_tpu.core.coeffs import PTStokesCoeffs
from justrelax_tpu.core.grid import Geometry
from justrelax_tpu.core.state import StokesState
from justrelax_tpu.ops.bc import Faces, VelocityBoundaryConditions
from justrelax_tpu.ops.interpolation import velocity2vertex
from justrelax_tpu.rheology.materials import Material, MaterialStack
from justrelax_tpu.rheology.phases import phase_ratios_from_field
from justrelax_tpu.solvers.stokes2d_vep import solve_vep


def run(n=32, iter_max=150_000, nout=1_000, dtype=None):
    ni = (n, n)
    ly = 500.0e3
    geometry = Geometry(ni, (ly, ly), origin=(0.0, -ly))
    material = MaterialStack.make(
        [
            Material(rho0=3.2e3, eta0=1.0e21, gravity=9.81),
            Material(rho0=3.3e3, eta0=1.0e23, gravity=9.81),
        ]
    )
    X, Y = geometry.cell_centers_mesh()
    depth = -Y
    block = (np.abs(X - 250.0e3) <= 50.0e3) & (np.abs(depth - 100.0e3) <= 50.0e3)
    pr = phase_ratios_from_field(jnp.asarray(block.astype(int)), 2)

    stokes = StokesState.make(ni, dtype=dtype)
    dt_f = stokes.P.dtype
    # initial viscosity/pressure: η from phases, lithostatic P = ρg·|y|
    eta0 = jnp.asarray(np.where(block, 1.0e23, 1.0e21), dt_f)
    rho = jnp.asarray(np.where(block, 3.3e3, 3.2e3), dt_f)
    P0 = rho * 9.81 * jnp.asarray(np.abs(Y), dt_f)
    stokes = stokes.replace(
        P=P0,
        viscosity=stokes.viscosity.replace(eta=eta0),
    )
    pt_stokes = PTStokesCoeffs.make(
        geometry.li, geometry.di, eps_rel=1.0e-5, CFL=0.95 / math.sqrt(2.1)
    )
    flow_bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True)
    )
    stokes, info = solve_vep(
        stokes, pt_stokes, geometry, flow_bc, material,
        pr.center, pr.vertex, 1.0,
        iter_max=iter_max, nout=nout,
    )
    Vx_v, Vy_v = velocity2vertex(stokes.V.Vx, stokes.V.Vy)
    vmax = float(jnp.sqrt(Vx_v**2 + Vy_v**2).max())
    return stokes, info, vmax
