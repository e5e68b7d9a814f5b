"""Sinking block solved with DYREL (reference
miniapps/DYREL2D/sinking_block/SinkingBlock2D.jl): gravity + two-phase
viscosity contrast through the Powell-Hestenes/dynamic-relaxation solver,
cross-checked against the APT solution and the reference velocity golden
(test_sinking_block.jl:219-222, vmax ≈ 4.8419e-10 m/s at 32²)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from justrelax_tpu.core.grid import Geometry
from justrelax_tpu.core.state import StokesState
from justrelax_tpu.ops.bc import Faces, VelocityBoundaryConditions
from justrelax_tpu.ops.interpolation import velocity2vertex
from justrelax_tpu.rheology.materials import Material, MaterialStack
from justrelax_tpu.rheology.phases import phase_ratios_from_field
from justrelax_tpu.solvers.dyrel import solve_dyrel


@pytest.mark.slow
def test_sinking_block_dyrel_matches_apt():
    from justrelax_tpu.models.sinking_block import run as run_apt

    n = 32
    ni = (n, n)
    ly = 500.0e3
    geometry = Geometry(ni, (ly, ly), origin=(0.0, -ly))
    material = MaterialStack.make([
        Material(rho0=3.2e3, eta0=1.0e21, gravity=9.81),
        Material(rho0=3.3e3, eta0=1.0e23, gravity=9.81),
    ])
    X, Y = geometry.cell_centers_mesh()
    depth = -Y
    block = (np.abs(X - 250.0e3) <= 50.0e3) & (np.abs(depth - 100.0e3) <= 50.0e3)
    pr = phase_ratios_from_field(jnp.asarray(block.astype(int)), 2)

    stokes = StokesState.make(ni)
    dt_f = stokes.P.dtype
    from justrelax_tpu.rheology.viscosity import phase_viscosity

    eta0 = jnp.asarray(np.where(block, 1.0e23, 1.0e21), dt_f)
    # harmonic phase blend at vertices, as solve_vep computes internally
    eta0_v = phase_viscosity(
        material, jnp.ones((n + 1, n + 1), dt_f), None, pr.vertex, "tau"
    ).astype(dt_f)
    rho = jnp.asarray(np.where(block, 3.3e3, 3.2e3), dt_f)
    P0 = rho * 9.81 * jnp.asarray(np.abs(Y), dt_f)
    stokes = stokes.replace(
        P=P0, viscosity=stokes.viscosity.replace(eta=eta0, eta_v=eta0_v)
    )
    bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True)
    )
    rho_gy = rho * 9.81
    s, info = solve_dyrel(
        stokes, geometry, bc, material, pr.center, pr.vertex, 1.0,
        rho_g=(jnp.zeros(ni, dt_f), rho_gy), eps=1.0e-7, nout=100,
    )
    Vx_v, Vy_v = velocity2vertex(s.V.Vx, s.V.Vy)
    vmax_dyrel = float(jnp.sqrt(Vx_v**2 + Vy_v**2).max())

    # reference golden (test_sinking_block.jl:222): vmax ≈ 4.8419e-10 m/s
    np.testing.assert_allclose(vmax_dyrel, 4.8419e-10, rtol=0.08)

    # cross-solver: matches the APT solution of the same problem
    _, _, vmax_apt = run_apt(n=32)
    np.testing.assert_allclose(vmax_dyrel, vmax_apt, rtol=2e-2)
