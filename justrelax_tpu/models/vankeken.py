"""Van Keken Rayleigh-Taylor benchmark (reference test_VanKeken.jl).

Unit box, dense layer (ρ=2) above a buoyant layer (ρ=1) separated by the
cosine interface y = 0.2 + 0.02·cos(πx/0.9142); η=1, g=1; composition carried
on particles, advected with RK2, phase ratios refreshed every step.

Oracle (test_VanKeken.jl:204-206): final Stokes residual < 1e-4 and
Urms = √(Σ|V|²·dx·dy) < 1e-2 at every step.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from justrelax_tpu.core.coeffs import PTStokesCoeffs
from justrelax_tpu.core.grid import Geometry
from justrelax_tpu.core.state import StokesState
from justrelax_tpu.ops.bc import Faces, VelocityBoundaryConditions
from justrelax_tpu.ops.interpolation import velocity2vertex
from justrelax_tpu.particles.particles import (
    advect_rk2,
    init_particles,
    inject_particles,
    move_particles,
    phase_ratios_from_particles,
)
from justrelax_tpu.rheology.materials import Material, MaterialStack
from justrelax_tpu.solvers.stokes2d_vep import solve_vep
from justrelax_tpu.utils.timestep import compute_dt

LAMBDA = 0.9142


def run(nx=32, ny=32, nt=500, nxcell=40, max_xcell=80, min_xcell=20, dtype=None):
    ni = (nx, ny)
    geometry = Geometry(ni, (1.0, 1.0))
    material = MaterialStack.make(
        [
            Material(rho0=1.0, eta0=1.0, gravity=1.0),
            Material(rho0=2.0, eta0=1.0, gravity=1.0),
        ]
    )
    pt_stokes = PTStokesCoeffs.make(
        geometry.li, geometry.di, r=1.0, eps_abs=1.0e-8, CFL=1.0 / math.sqrt(2.1)
    )
    flow_bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True),
        no_slip=Faces(top=True, bot=True),
    )
    stokes = StokesState.make(ni, dtype=dtype)

    particles = init_particles(geometry, nxcell, max_xcell, min_xcell)
    phase = jnp.where(
        particles.py > 0.2 + 0.02 * jnp.cos(jnp.pi * particles.px / LAMBDA), 1.0, 0.0
    )
    pr_c, pr_v = phase_ratios_from_particles(particles, phase, 2, geometry)

    dt = 1.0
    Urms = []
    info = None
    di = geometry.di
    for _ in range(nt):
        stokes, info = solve_vep(
            stokes,
            pt_stokes,
            geometry,
            flow_bc,
            material,
            pr_c,
            pr_v,
            dt,
            iter_max=10_000,
            nout=50,
        )
        dt = float(compute_dt(stokes.V.components, di)) / 10.0

        Vx_v, Vy_v = velocity2vertex(stokes.V.Vx, stokes.V.Vy)
        Urms.append(float(jnp.sqrt(jnp.sum((Vx_v**2 + Vy_v**2)) * di[0] * di[1])))

        particles = advect_rk2(particles, stokes.V.components, geometry, dt)
        particles, fields = move_particles(particles, geometry, {"phase": phase})
        phase = fields["phase"]
        particles, fields = inject_particles(
            particles, geometry, {}, phases=2,
            fields={"phase": phase}, phase_field="phase",
        )
        phase = fields["phase"]
        pr_c, pr_v = phase_ratios_from_particles(particles, phase, 2, geometry)

    return Urms, info, stokes, particles, phase
