"""Free-surface-stabilization miniapps (reference
miniapps/benchmarks/stokes2D/free_surface_stabilization/).

Two models, matching the two reference configurations:

``run`` — Rayleigh-Taylor overturn with sticky air
(RayleighTaylor2D.jl:77-250): 500 km box + 100 km sticky air: air
(ρ=1, η=1e16) over dense crust (ρ=3300, η=1e21) over lighter mantle
(ρ=3200, η=1e20) whose interface at 200 km depth carries a 5 km sinusoidal
perturbation — gravitationally unstable, the light layer rises in a diapir.
Like the reference, the air layer is handled by the **variational**
(rock-ratio masked) solver — the air cells are excised from the system, so
the huge air/rock viscosity contrast never enters the PT iteration — with
``viscosity_relaxation=1e-2`` and the stabilization term off
(RayleighTaylor2D.jl's ``dt * free_surface`` with ``free_surface=false``).

``run_plume`` — rising plume with the *actual* free-surface stabilization
term (PlumeFreeSurface_2D.jl:106-205): lighter air (ρ=10, η=1e17) over
mantle (ρ=3300, η=1e21) with a buoyant circular plume (ρ=3200, η=1e20);
plain multi-phase solve with ``free_surface=True`` — the
Vy·∂(ρg)/∂y·θ·dt correction (Duretz et al.; ops/stokes.py::
_free_surface_correction) keeps the surface stable at CFL timesteps.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from justrelax_tpu.core.coeffs import PTStokesCoeffs
from justrelax_tpu.core.grid import Geometry
from justrelax_tpu.core.state import StokesState
from justrelax_tpu.ops.bc import Faces, VelocityBoundaryConditions
from justrelax_tpu.ops.rock_ratio import update_rock_ratio
from justrelax_tpu.particles.particles import (
    advect_rk2,
    init_particles,
    inject_particles,
    move_particles,
    phase_ratios_from_particles,
)
from justrelax_tpu.rheology.materials import (
    Material,
    MaterialStack,
    compute_density,
    phase_average,
)
from justrelax_tpu.rheology.phases import PhaseRatios, phase_ratios_from_field
from justrelax_tpu.solvers.stokes2d_variational import solve_variational
from justrelax_tpu.solvers.stokes2d_vep import solve_vep
from justrelax_tpu.utils.timestep import compute_dt

YR = 365.25 * 24 * 3600
AIR, CRUST, MANTLE = 0, 1, 2


def _phase_of_rt(px, py, A=5.0e3, lam=500.0e3):
    """RayleighTaylor2D.jl:40-64 init_phases! (0-based phase ids)."""
    depth = -py
    interface = -(A * jnp.sin(jnp.pi * px / lam)) + (200.0e3 - A)
    ph = jnp.full_like(px, float(CRUST))
    ph = jnp.where(depth <= 100.0e3, float(AIR), ph)
    ph = jnp.where(depth > interface, float(MANTLE), ph)
    return ph


def _phase_of_plume(px, py, cx=250.0e3, cdepth=250.0e3, radius=100.0e3):
    """PlumeFreeSurface_2D.jl:59-93 init_phases!."""
    depth = -py
    ph = jnp.full_like(px, float(CRUST))  # mantle
    ph = jnp.where(depth <= 100.0e3, float(AIR), ph)
    inside = (px - cx) ** 2 + (depth - cdepth) ** 2 < radius**2
    ph = jnp.where((depth > 100.0e3) & inside, float(MANTLE), ph)
    return ph


def _ratios_and_phi(particles, phase, geometry):
    rc, rv = phase_ratios_from_particles(particles, phase, 3, geometry)
    pr_full = phase_ratios_from_field(rc)
    pr = PhaseRatios(center=rc, vertex=rv, face_x=pr_full.face_x,
                     face_y=pr_full.face_y)
    return pr, update_rock_ratio(pr, air_phase=AIR)


def _lithostatic_P(material, pr_c, geometry, ni, dt_f):
    """init_P!: P = |ρg·z|·(z<0) at cell centers (RayleighTaylor2D.jl:32-36)."""
    rho = compute_density(material, phase_ratios=pr_c)
    z_c = jnp.asarray(np.broadcast_to(np.asarray(geometry.xci[1])[None, :], ni))
    return jnp.where(z_c < 0.0, rho * 9.81 * (-z_c), 0.0).astype(dt_f)


def run(nx=32, ny=32, nt=3, nxcell=24, max_xcell=48, min_xcell=12,
        dt0_kyr=10.0, dt_max_kyr=50.0, iter_max=50_000, nout=2_000,
        dtype=None):
    """Rayleigh-Taylor overturn, variational sticky-air path
    (RayleighTaylor2D.jl:77-250)."""
    thick_air = 100.0e3
    lx, ly = 500.0e3, 500.0e3 + thick_air
    ni = (nx, ny)
    geometry = Geometry(ni, (lx, ly), origin=(0.0, -ly))

    etas = (1.0e16, 1.0e21, 1.0e20)
    material = MaterialStack.make([
        Material(rho0=1.0, eta0=etas[0], gravity=9.81, G=jnp.inf, Kb=jnp.inf),
        Material(rho0=3.3e3, eta0=etas[1], gravity=9.81, G=jnp.inf, Kb=jnp.inf),
        Material(rho0=3.2e3, eta0=etas[2], gravity=9.81, G=jnp.inf, Kb=jnp.inf),
    ])

    particles = init_particles(geometry, nxcell, max_xcell, min_xcell)
    phase = _phase_of_rt(particles.px, particles.py)
    pr, phi = _ratios_and_phi(particles, phase, geometry)

    stokes = StokesState.make(ni, dtype=dtype)
    dt_f = stokes.P.dtype
    eta_tab = jnp.asarray(etas, dt_f)
    stokes = stokes.replace(
        viscosity=stokes.viscosity.replace(
            eta=phase_average(eta_tab, pr.center),
            eta_v=phase_average(eta_tab, pr.vertex),
        ),
        P=_lithostatic_P(material, pr.center, geometry, ni, dt_f),
    )

    # RayleighTaylor2D.jl:146: ϵ_abs=1e-6, ϵ_rel=1e-4, Re=3, r=0.7, CFL=0.98/√2.1
    pt = PTStokesCoeffs.make(
        geometry.li, geometry.di, Re=3.0, r=0.7, CFL=0.98 / math.sqrt(2.1),
        eps_abs=1.0e-6, eps_rel=1.0e-4,
    )
    # free_slip left/right/top, no_slip bottom (RayleighTaylor2D.jl:158-162)
    bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True),
        no_slip=Faces(bot=True),
        free_surface=True,
    )

    dt = dt0_kyr * 1.0e3 * YR
    dt_max = dt_max_kyr * 1.0e3 * YR
    info = None
    vmax_hist = []
    t = 0.0
    for _ in range(nt):
        stokes, info = solve_variational(
            stokes, pt, geometry, bc, material, pr.center, pr.vertex, phi, dt,
            iter_max=iter_max, iter_min=1_000, nout=nout,
            viscosity_relaxation=1.0e-2,
        )
        dt = min(float(compute_dt(stokes.V.components, geometry.di)), dt_max)
        particles = advect_rk2(particles, stokes.V.components, geometry, dt)
        particles, fields = move_particles(particles, geometry, {"phase": phase})
        phase = fields["phase"]
        particles, fields = inject_particles(
            particles, geometry, {}, phases=3,
            fields={"phase": phase}, phase_field="phase",
        )
        phase = fields["phase"]
        pr, phi = _ratios_and_phi(particles, phase, geometry)
        t += dt
        vmax_hist.append(float(jnp.abs(stokes.V.Vy).max()))

    return stokes, particles, phase, info, vmax_hist, t


def run_plume_variational(nx=32, ny=32, nt=2, nxcell=24, max_xcell=48,
                          min_xcell=12, iter_max=50_000, nout=2_000,
                          dtype=None):
    """Rising plume on the variational path WITH the masked stabilization
    term active (PlumeFreeSurface_VariationalStokes.jl:192-210 — the one
    reference free-surface script that passes ``free_surface=true`` to the
    variational solver)."""
    thick_air = 100.0e3
    lx, ly = 500.0e3, 400.0e3 + thick_air
    ni = (nx, ny)
    geometry = Geometry(ni, (lx, ly), origin=(0.0, -ly))

    etas = (1.0e17, 1.0e21, 1.0e20)
    material = MaterialStack.make([
        Material(rho0=1.0e1, eta0=etas[0], gravity=9.81, G=jnp.inf, Kb=jnp.inf),
        Material(rho0=3.3e3, eta0=etas[1], gravity=9.81, G=jnp.inf, Kb=jnp.inf),
        Material(rho0=3.2e3, eta0=etas[2], gravity=9.81, G=jnp.inf, Kb=jnp.inf),
    ])

    particles = init_particles(geometry, nxcell, max_xcell, min_xcell)
    phase = _phase_of_plume(particles.px, particles.py)
    pr, phi = _ratios_and_phi(particles, phase, geometry)

    stokes = StokesState.make(ni, dtype=dtype)
    dt_f = stokes.P.dtype
    eta_tab = jnp.asarray(etas, dt_f)
    stokes = stokes.replace(
        viscosity=stokes.viscosity.replace(
            eta=phase_average(eta_tab, pr.center),
            eta_v=phase_average(eta_tab, pr.vertex),
        ),
        P=_lithostatic_P(material, pr.center, geometry, ni, dt_f),
    )
    pt = PTStokesCoeffs.make(
        geometry.li, geometry.di, Re=3.0 * math.pi, r=1.0,
        CFL=0.98 / math.sqrt(2.1), eps_abs=1.0e-6, eps_rel=1.0e-5,
    )
    bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True),
        free_surface=True,
    )

    dt = 1.0e3 * YR
    # cap the CFL dt: with ~nm/s plume velocities compute_dt reaches ~80 kyr
    # and the explicit Vy·∂(ϕρg)/∂y·dt stabilization term becomes unstable
    # (deviation from the reference script, which runs uncapped and has no
    # convergence asserts; the 10 kyr cap matches its RT/Crameri siblings)
    dt_max = 10.0e3 * YR
    info = None
    vmax_hist = []
    t = 0.0
    for _ in range(nt):
        stokes, info = solve_variational(
            stokes, pt, geometry, bc, material, pr.center, pr.vertex, phi,
            dt, iter_max=iter_max, iter_min=1_000, nout=nout,
            viscosity_relaxation=1.0e-2, air_phase=AIR, free_surface=True,
            mask_step_floor=0.05,
        )
        dt = min(float(compute_dt(stokes.V.components, geometry.di)) * 0.95,
                 dt_max)
        particles = advect_rk2(particles, stokes.V.components, geometry, dt)
        particles, fields = move_particles(particles, geometry, {"phase": phase})
        phase = fields["phase"]
        particles, fields = inject_particles(
            particles, geometry, {}, phases=3,
            fields={"phase": phase}, phase_field="phase",
        )
        phase = fields["phase"]
        pr, phi = _ratios_and_phi(particles, phase, geometry)
        t += dt
        vmax_hist.append(float(jnp.abs(stokes.V.Vy).max()))

    return stokes, particles, phase, info, vmax_hist, t


def run_plume(nx=32, ny=32, nt=3, nxcell=24, max_xcell=48, min_xcell=12,
              iter_max=50_000, nout=1_000, dtype=None):
    """Rising plume with free-surface stabilization
    (PlumeFreeSurface_2D.jl:106-205)."""
    thick_air = 100.0e3
    lx, ly = 500.0e3, 400.0e3 + thick_air
    ni = (nx, ny)
    geometry = Geometry(ni, (lx, ly), origin=(0.0, -ly))

    etas = (1.0e17, 1.0e21, 1.0e20)
    material = MaterialStack.make([
        Material(rho0=1.0e1, eta0=etas[0], gravity=9.81, G=jnp.inf, Kb=jnp.inf),
        Material(rho0=3.3e3, eta0=etas[1], gravity=9.81, G=jnp.inf, Kb=jnp.inf),
        Material(rho0=3.2e3, eta0=etas[2], gravity=9.81, G=jnp.inf, Kb=jnp.inf),
    ])

    particles = init_particles(geometry, nxcell, max_xcell, min_xcell)
    phase = _phase_of_plume(particles.px, particles.py)
    pr_c, pr_v = phase_ratios_from_particles(particles, phase, 3, geometry)

    stokes = StokesState.make(ni, dtype=dtype)
    dt_f = stokes.P.dtype
    eta_tab = jnp.asarray(etas, dt_f)
    stokes = stokes.replace(
        viscosity=stokes.viscosity.replace(
            eta=phase_average(eta_tab, pr_c),
            eta_v=phase_average(eta_tab, pr_v),
        ),
        P=_lithostatic_P(material, pr_c, geometry, ni, dt_f),
    )

    # PlumeFreeSurface_2D.jl:157: ϵ_rel=1e-6, Re=15π, r=1, CFL=0.98/√2.1
    pt = PTStokesCoeffs.make(
        geometry.li, geometry.di, Re=15.0 * math.pi, r=1.0,
        CFL=0.98 / math.sqrt(2.1), eps_abs=1.0e-6, eps_rel=1.0e-6,
    )
    bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True),
        free_surface=True,
    )

    dt = 1.0e3 * YR  # PlumeFreeSurface_2D.jl:185
    info = None
    vmax_hist = []
    t = 0.0
    for _ in range(nt):
        stokes, info = solve_vep(
            stokes, pt, geometry, bc, material, pr_c, pr_v, dt,
            free_surface=True, iter_max=iter_max, iter_min=200, nout=nout,
        )
        dt = float(compute_dt(stokes.V.components, geometry.di)) * 0.95
        particles = advect_rk2(particles, stokes.V.components, geometry, dt)
        particles, fields = move_particles(particles, geometry, {"phase": phase})
        phase = fields["phase"]
        particles, fields = inject_particles(
            particles, geometry, {}, phases=3,
            fields={"phase": phase}, phase_field="phase",
        )
        phase = fields["phase"]
        pr_c, pr_v = phase_ratios_from_particles(particles, phase, 3, geometry)
        t += dt
        vmax_hist.append(float(jnp.abs(stokes.V.Vy).max()))

    return stokes, particles, phase, info, vmax_hist, t
