"""Sticky-air (Schmeling-type) subduction driven by the DYREL solver — the
reference's DYREL application tier
(miniapps/DYREL2D/StickyAirSubduction/Subduction2D_DYREL.jl).

Isothermal, purely mechanical: a 3000×750 km box (50 km of sticky air above
y=0; origin (0, -700 km), Subduction2D_DYREL.jl:68-69) with three linear
viscous phases (Subduction2D_rheology.jl:1-26):

  asthenosphere  ρ=3200 kg/m³  η=1e21 Pa·s
  oceanic slab   ρ=3300 kg/m³  η=1e23 Pa·s
  sticky air     ρ=0           η=1e19 Pa·s

The already-subducting slab is two boxes (Subduction2D_rheology.jl:45-55):
the horizontal plate x ≥ 1000 km, -100 km ≤ y ≤ 0, plus the hanging tip
1000 ≤ x ≤ 1100 km down to -200 km. Phases ride particles; the coupled loop
(Subduction2D_DYREL.jl:149-199) is

  phase ratios → η from phases → ρg → solve_DYREL → CFL dt (×0.8) →
  RK2 particle advection → move/inject → phase-ratio refresh

with lithostatic pressure initialization (reverse-cumsum of ρg·dy,
Subduction2D_DYREL.jl:111) and free-slip on all faces. The reference runs
10 steps at 125×50 and is validated visually; tests/test_subduction2d_dyrel.py
asserts physics (slab tip descends, air stays slow) plus an APT cross-check
of the first solve.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from justrelax_tpu.core.grid import Geometry
from justrelax_tpu.core.state import StokesState
from justrelax_tpu.ops.bc import Faces, VelocityBoundaryConditions
from justrelax_tpu.particles.particles import (
    advect_rk2,
    init_particles,
    inject_particles,
    move_particles,
    phase_ratios_from_particles,
)
from justrelax_tpu.rheology.materials import Material, MaterialStack, phase_average, _as_stack
from justrelax_tpu.rheology.viscosity import phase_viscosity
from justrelax_tpu.solvers.dyrel import solve_dyrel
from justrelax_tpu.utils.timestep import compute_dt

KM = 1.0e3
YR = 365.25 * 24.0 * 3600.0

AST, SLAB, AIR = 0, 1, 2
N_PHASE = 3


def materials():
    """Subduction2D_rheology.jl:1-26 (linear viscous, constant density)."""
    return MaterialStack.make([
        Material(rho0=3.2e3, eta0=1.0e21, gravity=9.81),
        Material(rho0=3.3e3, eta0=1.0e23, gravity=9.81),
        Material(rho0=0.0, eta0=1.0e19, gravity=9.81),
    ])


def init_phase(px, py):
    """Per-particle phase (Subduction2D_rheology.jl:33-58): asthenosphere by
    default, air above y=0, slab in the plate/tip boxes."""
    phase = jnp.full_like(px, float(AST))
    phase = jnp.where(py > 0.0, float(AIR), phase)
    plate = (px >= 1000.0 * KM) & (py <= 0.0) & (py >= -100.0 * KM)
    tip = (
        (px >= 1000.0 * KM) & (px <= 1100.0 * KM)
        & (py <= 0.0) & (py >= -200.0 * KM)
    )
    return jnp.where(plate | tip, float(SLAB), phase)


def run(nx=50, ny=20, nt=3, seed=0, dtype=None, eps=1.0e-5):
    li = (3000.0 * KM, 750.0 * KM)
    ni = (nx, ny)
    geometry = Geometry(ni, li, origin=(0.0, -700.0 * KM))
    material = materials()

    particles = init_particles(geometry, nxcell=12, max_xcell=24, min_xcell=6,
                               seed=seed)
    p_phase = init_phase(particles.px, particles.py)

    stokes = StokesState.make(ni, dtype=dtype)
    f = stokes.P.dtype
    pr_c, pr_v = phase_ratios_from_particles(particles, p_phase, N_PHASE,
                                             geometry)

    # a phase field at centers for injection resampling
    X, Y = geometry.cell_centers_mesh()
    phase_c = np.asarray(init_phase(jnp.asarray(X), jnp.asarray(Y)))

    bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True)
    )

    info = None
    t = 0.0
    dt = 10.0e3 * YR  # reference initial dt (Subduction2D_DYREL.jl:78)
    tip_hist = []
    ycm_hist = []
    aux = {}
    for _ in range(nt):
        eta = phase_viscosity(material, jnp.ones(ni, f), None, pr_c, "tau")
        eta_v = phase_viscosity(
            material, jnp.ones((nx + 1, ny + 1), f), None, pr_v, "tau")
        rho = phase_average(_as_stack(material).params.rho0, pr_c)
        g = phase_average(_as_stack(material).params.gravity, pr_c)
        rho_gy = (rho * g).astype(f)
        # lithostatic P init (init_P! / reverse-cumsum,
        # Subduction2D_DYREL.jl:111): restart from hydrostatic each step so
        # the PH penalty loop starts near balance
        P_litho = jnp.cumsum(
            (rho_gy * geometry.di[1])[:, ::-1], axis=1)[:, ::-1]
        stokes = stokes.replace(
            P=P_litho.astype(f),
            viscosity=stokes.viscosity.replace(
                eta=eta.astype(f), eta_v=eta_v.astype(f)),
        )
        stokes, info = solve_dyrel(
            stokes, geometry, bc, material, pr_c, pr_v, jnp.inf,
            rho_g=(jnp.zeros(ni, f), rho_gy), eps=eps, nout=100,
            iter_max=50_000, total_iter_max=50_000,
        )
        # solve-time inputs, for independent residual verification in tests
        aux = {"rho_gy": rho_gy, "eta": eta, "eta_v": eta_v}
        dt = float(compute_dt(stokes.V.components, geometry.di)) * 0.8

        particles = advect_rk2(particles, stokes.V.components, geometry, dt)
        particles, fields = move_particles(particles, geometry,
                                           {"phase": p_phase})
        particles, fields = inject_particles(
            particles, geometry, {}, phases=jnp.asarray(phase_c, jnp.float64),
            fields=fields,
        )
        p_phase = fields["phase"]
        pr_c, pr_v = phase_ratios_from_particles(particles, p_phase, N_PHASE,
                                                 geometry)
        t += dt
        # slab-tip depth diagnostic: deepest particle that is slab phase
        # (noisy at fine grids — the deepest particle can be dropped by
        # cell compaction, jittering the minimum by ~±dy/4)
        is_slab = jnp.round(p_phase) == SLAB
        tip = float(jnp.where(is_slab & particles.active, particles.py,
                              jnp.inf).min())
        tip_hist.append(tip)
        # robust monotone-descent diagnostic: slab center-of-mass depth
        # from the cell phase ratios (insensitive to individual particle
        # dropout; strictly decreasing while the slab sinks)
        yc = jnp.asarray(geometry.xci[1])
        r_slab = pr_c[..., SLAB]
        ycm = float(jnp.sum(r_slab * yc[None, :]) / jnp.sum(r_slab))
        ycm_hist.append(ycm)

    aux["ycm_hist"] = ycm_hist
    return stokes, particles, p_phase, pr_c, info, tip_hist, aux
