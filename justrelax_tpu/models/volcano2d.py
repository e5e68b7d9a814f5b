"""Volcano2D / Caldera: the reference's flagship coupled model
(test_Volcano2D.jl:126-400 + miniapps/DYREL2D/volcano/Caldera_{setup,rheology}.jl,
analytic geometry instead of GeophysicalModelGenerator).

30×25 km box (5 km sticky air): 20-Myr half-space-cooled crust split at the
chamber depth, an elliptical magma chamber (phase 3) with a hotter eruptible
core (phase 4) at 5 km depth, air above a marker-chain-tracked topography.
Each step couples, as the reference does:

  particles T → grid → variational VEP Stokes (rock-ratio masked, melt-aware
  α via Caricchi ϕ) → particle stress rotation → CFL dt → PT thermal
  diffusion (Dirichlet chamber anomaly mask) → subgrid T diffusion →
  particle + marker-chain advection → phase ratios + rock ratio refresh →
  particle injection.

Oracle (test_Volcano2D.jl:400): final Stokes residual < 1e-4 at 16×8, 2
steps; plus physical checks (air at rest, buoyant chamber rising).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from justrelax_tpu.core.coeffs import PTStokesCoeffs, PTThermalCoeffs
from justrelax_tpu.core.grid import Geometry
from justrelax_tpu.core.state import StokesState, ThermalState
from justrelax_tpu.ops.bc import (
    Faces,
    TemperatureBoundaryConditions,
    VelocityBoundaryConditions,
    thermal_bcs,
)
from justrelax_tpu.ops.rock_ratio import update_rock_ratio
from justrelax_tpu.ops.stress_rotation import (
    compute_vorticity_center,
    rotate_stress_particles_2d,
)
from justrelax_tpu.particles.marker_chain import (
    advect_marker_chain,
    init_marker_chain,
    phases_from_marker_chain,
    update_phases_given_markerchain,
)
from justrelax_tpu.particles.particles import (
    advect_rk2,
    centroid2particle,
    inject_particles,
    init_particles,
    move_particles,
    particle2centroid,
    phase_ratios_from_particles,
    subgrid_characteristic_time,
    subgrid_diffusion,
)
from justrelax_tpu.rheology.materials import Material, MaterialStack
from justrelax_tpu.rheology.melting import MeltingCaricchi, NoMelting, compute_melt_fraction
from justrelax_tpu.rheology.phases import PhaseRatios
from justrelax_tpu.solvers.stokes2d_variational import solve_variational
from justrelax_tpu.solvers.thermal import heatdiffusion_PT
from justrelax_tpu.utils.timestep import compute_dt

KM = 1.0e3
YR = 3600.0 * 24.0 * 365.25
# phases (reference Caldera numbering, conduit/volcano off): 0 upper crust,
# 1 lower crust, 2 chamber, 3 eruptible magma, 4 air
UPPER, LOWER, CHAMBER, MAGMA, AIR = 0, 1, 2, 3, 4
N_PHASE = 5


def _setup(geometry, chamber_depth=5.0 * KM, chamber_radius=2.0 * KM,
           aspect_x=1.5, chamber_T=1273.0, sticky_air=5.0 * KM):
    """Analytic version of Caldera_setup.setup2D (flat, no chimney)."""
    X, Y = geometry.cell_centers_mesh()
    x, z = np.asarray(X), np.asarray(Y)  # z: -20 km .. +5 km
    lx = geometry.li[0]
    Tsurf, Tbot = 273.0, 273.0 + 1350.0
    kappa = 3.0 / (1050.0 * 2.7e3)
    age = 20.0e6 * YR

    depth = -z
    from math import erf

    erf_v = np.vectorize(erf)
    Thalf = Tsurf + (Tbot - Tsurf) * erf_v(
        np.maximum(depth, 0.0) / (2.0 * np.sqrt(kappa * age))
    )
    T = np.where(depth > 0, Thalf, Tsurf)

    phases = np.where(depth > chamber_depth, LOWER, UPPER)
    # chamber ellipse (phase 2, T = chamber_T - 100)
    in_chamber = (
        ((x - lx / 2) / (chamber_radius * aspect_x)) ** 2
        + ((depth - chamber_depth) / chamber_radius) ** 2
    ) <= 1.0
    phases[in_chamber] = CHAMBER
    T = np.where(in_chamber, chamber_T - 100.0, T)
    # eruptible core (phase 3, hotter)
    in_core = (
        ((x - lx / 2) / (chamber_radius / 1.25 * aspect_x)) ** 2
        + ((depth - (chamber_depth - chamber_radius / 2)) / (chamber_radius / 2)) ** 2
    ) <= 1.0
    phases[in_core] = MAGMA
    T = np.where(in_core, chamber_T, T)
    # sticky air above the initial flat topography z = 0
    phases[depth <= 0] = AIR
    T[depth <= 0] = Tsurf
    return phases, T


def _materials():
    """Simplified Caldera_rheology.jl: DP-plastic crust, weak magma, air."""
    crust = dict(
        rho0=2.65e3, alpha=3.0e-5, T0=273.0, Cp=1050.0, k=3.0,
        G=2.5e10, Kb=1.0 / 6.0e-11, gravity=9.81,
        disl_A=1.67e-24, disl_n=3.5, disl_E=1.87e5,
        is_plastic=1.0, C=10.0e6, friction_angle=30.0, eta_reg=1.0e16,
    )
    magma = dict(
        rho0=2.45e3, alpha=3.0e-5, T0=273.0, Cp=1150.0, k=1.5,
        G=1.0e10, Kb=1.0 / 6.0e-11, gravity=9.81, eta0=1.0e16,
    )
    air = dict(
        rho0=10.0, Cp=1.0e3, k=15.0, G=2.5e10, Kb=jnp.inf,
        gravity=9.81, eta0=1.0e17,
    )
    return MaterialStack.make(
        [
            Material(**crust),
            Material(**crust),
            Material(**magma),
            Material(**{**magma, "rho0": 2.4e3}),
            Material(**air),
        ]
    )


def run(nx=16, ny=8, nt=2, dtype=None, seed=0):
    lx, lz = 30.0 * KM, 25.0 * KM
    ni = (nx, ny)
    geometry = Geometry(ni, (lx, lz), origin=(0.0, -20.0 * KM))
    material = _materials()
    melting = (NoMelting(), NoMelting(), MeltingCaricchi(), MeltingCaricchi(), NoMelting())

    phases_c, T_c0 = _setup(geometry)

    # particles carrying phase + T + old stress
    particles = init_particles(geometry, nxcell=12, max_xcell=24, min_xcell=6,
                               seed=seed)
    p_phase = centroid2particle(jnp.asarray(phases_c, jnp.float64), particles, geometry)
    p_phase = jnp.round(p_phase)
    pT = centroid2particle(jnp.asarray(T_c0), particles, geometry)
    p_txx = jnp.zeros_like(particles.px)
    p_tyy = jnp.zeros_like(particles.px)
    p_txy = jnp.zeros_like(particles.px)

    # marker chain on the initial flat topography
    chain = init_marker_chain(geometry, 0.0)

    def ratios_and_phi(particles, p_phase):
        rc, rv = phase_ratios_from_particles(particles, p_phase, N_PHASE, geometry)
        # faces from the center field (array route)
        from justrelax_tpu.rheology.phases import phase_ratios_from_field

        pr_full = phase_ratios_from_field(rc)
        pr = PhaseRatios(center=rc, vertex=rv, face_x=pr_full.face_x,
                         face_y=pr_full.face_y)
        phi = update_rock_ratio(pr, air_phase=AIR)
        return pr, phi

    pr, phi = ratios_and_phi(particles, p_phase)

    stokes = StokesState.make(ni, dtype=dtype)
    dt_f = stokes.P.dtype
    eta0 = jnp.asarray(
        np.choose(phases_c, [1.0e21, 1.0e21, 1.0e16, 1.0e16, 1.0e17]), dt_f
    )
    stokes = stokes.replace(viscosity=stokes.viscosity.replace(eta=eta0))
    pt_stokes = PTStokesCoeffs.make(
        geometry.li, geometry.di, eps_abs=1.0e-4, eps_rel=1.0e-10,
        Re=math.pi / 2, r=0.7, CFL=0.98 / math.sqrt(2.1),
    )
    flow_bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True)
    )

    thermal = ThermalState.make(ni, dtype=dtype)
    T_air = 273.0
    Tg = np.full((nx + 2, ny + 2), T_air)
    Tg[1:-1, 1:-1] = T_c0
    thermal_bc = TemperatureBoundaryConditions(
        no_flux=Faces(left=True, right=True),
        constant_value=Faces(top=T_air, bot=float(T_c0[:, 0].max())),
    )
    Tj = thermal_bcs(jnp.asarray(Tg, dt_f), thermal_bc)
    thermal = thermal.replace(T=Tj, Told=Tj)

    # chamber Dirichlet anomaly mask (reference thermal_anomaly!): keep the
    # magma phases pinned at their temperatures inside the thermal solve
    hot = (phases_c == CHAMBER) | (phases_c == MAGMA)
    dirichlet = (
        jnp.asarray(hot.astype(float), dt_f),
        jnp.asarray(np.where(hot, T_c0, 0.0), dt_f),
    )

    dt = 500.0 * YR
    dt_max = 2.0e3 * YR
    info = None
    for _ in range(nt):
        # particles → grid temperature
        T_cc = particle2centroid(pT, particles, geometry)
        Tn = thermal_bcs(thermal.T.at[1:-1, 1:-1].set(T_cc), thermal_bc)
        thermal = thermal.replace(T=Tn)

        # melt fraction → density handled per-phase; variational VEP solve
        T_center = thermal.T[1:-1, 1:-1]
        phi_m = compute_melt_fraction(melting, T_center, phase_ratios=pr.center)
        stokes, info = solve_variational(
            stokes, pt_stokes, geometry, flow_bc, material,
            pr.center, pr.vertex, phi, dt, T=T_center,
            iter_max=100_000, nout=2_000,
            viscosity_cutoff=(1.0e16, 1.0e23),
        )

        # rotate old particle stresses with the grid vorticity
        w_c = compute_vorticity_center(
            stokes.V.Vx, stokes.V.Vy, 1.0 / geometry.di[0], 1.0 / geometry.di[1]
        )
        w_p = centroid2particle(w_c, particles, geometry)
        p_txx, p_tyy, p_txy = rotate_stress_particles_2d(
            p_txx, p_tyy, p_txy, w_p, dt
        )

        dt = float(compute_dt(stokes.V.components, geometry.di, dt_max)) * 0.5

        # thermal diffusion with the chamber anomaly pinned
        pt_thermal = PTThermalCoeffs.from_material(
            material, T_center, stokes.P, dt, geometry.di, geometry.li,
            phase_ratios=pr.center, eps=1.0e-8, CFL=0.95 / math.sqrt(2.0),
        )
        thermal, _ = heatdiffusion_PT(
            thermal, pt_thermal, thermal_bc, dt, geometry,
            material=material, P=stokes.P, phase_ratios=pr.center,
            dirichlet=dirichlet, iter_max=20_000, nout=200,
        )

        # subgrid diffusion of the particle temperature
        dt0 = subgrid_characteristic_time(
            material, T_center, stokes.P, pr.center, geometry.di
        )
        pT = subgrid_diffusion(
            pT, thermal.T[1:-1, 1:-1], thermal.dT[1:-1, 1:-1], dt0,
            particles, geometry, dt,
        )

        # advect particles + marker chain, refresh ratios and rock ratio
        V = (stokes.V.Vx, stokes.V.Vy)
        particles = advect_rk2(particles, V, geometry, dt)
        fields = {"phase": p_phase, "T": pT,
                  "txx": p_txx, "tyy": p_tyy, "txy": p_txy}
        particles, fields = move_particles(particles, geometry, fields)
        chain = advect_marker_chain(chain, V, geometry, dt)
        # per-particle topography correction against the advected chain
        # (Caldera2D.jl:194,435): rock particles above the surface / air
        # particles below it are deactivated, then re-seeded by the
        # injection below with the phase the chain implies
        particles, _n_corr = update_phases_given_markerchain(
            chain, particles, fields["phase"], AIR)
        above_c = phases_from_marker_chain(chain, geometry, 0, 1).astype(bool)
        rock_c = np.where(phases_c == AIR, UPPER, phases_c)
        phases_inject = jnp.where(
            above_c, float(AIR), jnp.asarray(rock_c, jnp.float64))
        particles, fields = inject_particles(
            particles, geometry,
            fields_from_centers={"T": thermal.T[1:-1, 1:-1]},
            phases=phases_inject, fields=fields,
        )
        p_phase, pT = fields["phase"], fields["T"]
        p_txx, p_tyy, p_txy = fields["txx"], fields["tyy"], fields["txy"]
        pr, phi = ratios_and_phi(particles, p_phase)

    return stokes, thermal, particles, chain, phi_m, info
