"""2D thermo-mechanical subduction (reference miniapps/subduction/2D,
linear-rheology variant, analytic initial geometry instead of
GeophysicalModelGenerator).

3000×675 km box: 15 km sticky air above a half-space-cooled (50 Myr)
80-km lithosphere, with a 250-km slab dipping 30° already inserted; mantle
η=1e20, lithosphere η=1e23 with T-dependent density (PT_Density,
T0=1747 K, α=2.4e-5), air handled by the variational rock-ratio mask.
Coupled loop: variational VEP Stokes → CFL dt → PT thermal diffusion →
WENO temperature advection.

No reference golden exists (the miniapp is visual); asserts are physical:
convergence below 1e-4, slab descends, air stays at rest.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from justrelax_tpu.advection.weno5 import weno_advect
from justrelax_tpu.core.coeffs import PTStokesCoeffs, PTThermalCoeffs
from justrelax_tpu.core.grid import Geometry
from justrelax_tpu.core.state import StokesState, ThermalState
from justrelax_tpu.ops.bc import (
    Faces,
    TemperatureBoundaryConditions,
    VelocityBoundaryConditions,
    thermal_bcs,
)
from justrelax_tpu.ops.interpolation import velocity2center
from justrelax_tpu.ops.rock_ratio import update_rock_ratio
from justrelax_tpu.rheology.materials import Material, MaterialStack
from justrelax_tpu.rheology.phases import phase_ratios_from_field
from justrelax_tpu.solvers.stokes2d_variational import solve_variational
from justrelax_tpu.solvers.thermal import heatdiffusion_PT
from justrelax_tpu.utils.timestep import compute_dt

KM = 1.0e3
MYR = 1.0e6 * 365.25 * 24 * 3600.0

# phases: 0 = asthenosphere, 1 = lithosphere, 2 = air
AST, LITH, AIR = 0, 1, 2


def _setup_phases_T(geometry):
    """Analytic initial state: half-space cooling + 30°-dipping slab."""
    X, Y = geometry.cell_centers_mesh()
    xkm, zkm = X / KM, Y / KM  # z: -660 .. +15
    Tsurf, Tbot = 293.0, 1747.0
    kappa = 2.5 / (750.0 * 3.2e3)
    age = 50.0 * MYR

    phases = np.full(X.shape, AST, dtype=int)
    T = np.full(X.shape, Tbot)

    depth = -zkm  # km, positive down; negative above sea level
    # half-space cooling temperature everywhere below the surface
    def erf_np(x):
        # Abramowitz-Stegun rational approximation (|err| < 1.5e-7)
        sign = np.sign(x)
        x = np.abs(x)
        t = 1.0 / (1.0 + 0.3275911 * x)
        y = 1.0 - (((((1.061405429 * t - 1.453152027) * t) + 1.421413741) * t - 0.284496736) * t + 0.254829592) * t * np.exp(-x * x)
        return sign * y

    with np.errstate(invalid="ignore"):
        Thalf = Tsurf + (Tbot - Tsurf) * erf_np(
            np.maximum(depth, 0.0) * KM / (2.0 * np.sqrt(kappa * age))
        )
    T = np.where(depth > 0, Thalf, Tsurf)

    # lithosphere: T < 1573 K below surface (≈ 80 km plate for 50 Myr)
    plate = (depth > 0) & (T < 1573.0) & (xkm > 100) & (xkm < 2900)
    phases[plate] = LITH

    # dipping slab: 30° from the trench at x = 1570 km, 250 km long, 80 thick
    trench = 1570.0
    s = (trench - xkm) / np.cos(np.radians(30.0))  # distance along slab top
    d_perp = (depth - (trench - xkm) * np.tan(np.radians(30.0)))
    in_slab = (xkm < trench) & (s > 0) & (s < 250.0) & (d_perp > 0) & (
        d_perp * np.cos(np.radians(30.0)) < 80.0
    )
    phases[in_slab & (depth > 0)] = LITH
    T = np.where(
        in_slab & (depth > 0),
        np.minimum(T, Tsurf + (Tbot - Tsurf) * 0.5),  # cold slab core
        T,
    )

    # sticky air
    phases[depth <= 0] = AIR
    T[depth <= 0] = Tsurf
    return phases, T


def run(nx=96, ny=32, nt=3, dtype=None):
    lx, lz = 3000.0 * KM, 675.0 * KM
    ni = (nx, ny)
    geometry = Geometry(ni, (lx, lz), origin=(0.0, -660.0 * KM))

    material = MaterialStack.make(
        [
            Material(rho0=3.2e3, eta0=1.0e20, Cp=750.0, k=2.5, gravity=9.81),
            Material(
                rho0=3.2e3, alpha=2.4e-5, T0=273.0 + 1474.0,
                eta0=1.0e23, G=jnp.inf, Cp=750.0, k=2.5, gravity=9.81,
            ),
            Material(rho0=100.0, eta0=1.0e19, Cp=3.0e3, k=1.0, gravity=9.81),
        ]
    )
    phases, T0 = _setup_phases_T(geometry)
    pr = phase_ratios_from_field(jnp.asarray(phases), 3)
    phi = update_rock_ratio(pr, air_phase=AIR)

    stokes = StokesState.make(ni, dtype=dtype)
    dt_f = stokes.P.dtype
    eta0 = jnp.asarray(
        np.choose(phases, [1.0e20, 1.0e23, 1.0e19]), dt_f
    )
    stokes = stokes.replace(viscosity=stokes.viscosity.replace(eta=eta0))
    pt_stokes = PTStokesCoeffs.make(
        geometry.li, geometry.di, eps_rel=1.0e-4, CFL=0.9 / math.sqrt(2.1)
    )
    flow_bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True)
    )

    thermal = ThermalState.make(ni, dtype=dtype)
    Tg = np.full((nx + 2, ny + 2), 1747.0)
    Tg[1:-1, 1:-1] = T0
    thermal_bc = TemperatureBoundaryConditions(
        no_flux=Faces(left=True, right=True),
        constant_value=Faces(top=293.0, bot=1747.0),
    )
    Tj = thermal_bcs(jnp.asarray(Tg, dt_f), thermal_bc)
    thermal = thermal.replace(T=Tj, Told=Tj)

    kappa = 2.5 / (750.0 * 3.2e3)
    dt_diff = 0.9 * min(geometry.di) ** 2 / kappa / 4.0

    info = None
    for _ in range(nt):
        T_c = thermal.T[1:-1, 1:-1]
        stokes, info = solve_variational(
            stokes, pt_stokes, geometry, flow_bc, material,
            pr.center, pr.vertex, phi, jnp.inf, T=T_c,
            iter_max=80_000, nout=1_000,
            viscosity_cutoff=(1.0e18, 1.0e24),
        )
        dt = float(compute_dt(stokes.V.components, geometry.di, dt_diff))

        pt_thermal = PTThermalCoeffs.from_material(
            material, T_c, stokes.P, dt, geometry.di, geometry.li,
            phase_ratios=pr.center, eps=1.0e-5, CFL=0.95 / math.sqrt(2.0),
        )
        thermal, _ = heatdiffusion_PT(
            thermal, pt_thermal, thermal_bc, dt, geometry,
            material=material, P=stokes.P, phase_ratios=pr.center,
            iter_max=10_000, nout=100,
        )
        Vx_c, Vy_c = velocity2center(stokes.V.Vx, stokes.V.Vy)
        Tc = weno_advect(thermal.T[1:-1, 1:-1], (Vx_c, Vy_c), geometry.di, dt)
        Tn = thermal_bcs(thermal.T.at[1:-1, 1:-1].set(Tc), thermal_bc)
        thermal = thermal.replace(T=Tn)

    return stokes, thermal, info, phases


def run_particles(nx=96, ny=32, nt=4, dtype=None, seed=0,
                  out_dir=None, checkpoint_every=2, restart_from=None):
    """Particle-transport subduction with mid-run checkpoint/restart — the
    reference miniapp pair Subduction2D.jl (checkpointing_jld2 +
    checkpointing_particles every step, :270-271) and Subduction2D_restart.jl
    (loads both and continues, :81-103).

    Particles carry phase + temperature; every step refreshes phase ratios
    and the rock-ratio mask from the particles (the full reference coupling,
    unlike :func:`run`'s fixed-phase WENO loop). With ``out_dir`` set, the
    solver+thermal state and the particle cloud are checkpointed atomically
    every ``checkpoint_every`` steps; ``restart_from`` resumes from such a
    checkpoint directory and continues to ``nt`` total steps — restart
    bit-equivalence is asserted in tests/test_subduction2d.py.
    """
    from justrelax_tpu.io.checkpoint import (
        checkpointing,
        checkpointing_particles,
        load_checkpoint,
        load_checkpoint_particles,
    )
    from justrelax_tpu.particles.particles import (
        advect_rk2,
        centroid2particle,
        init_particles,
        inject_particles,
        move_particles,
        particle2centroid,
        phase_ratios_from_particles,
        subgrid_characteristic_time,
        subgrid_diffusion,
    )
    from justrelax_tpu.rheology.phases import PhaseRatios

    lx, lz = 3000.0 * KM, 675.0 * KM
    ni = (nx, ny)
    geometry = Geometry(ni, (lx, lz), origin=(0.0, -660.0 * KM))
    material = MaterialStack.make(
        [
            Material(rho0=3.2e3, eta0=1.0e20, Cp=750.0, k=2.5, gravity=9.81),
            Material(
                rho0=3.2e3, alpha=2.4e-5, T0=273.0 + 1474.0,
                eta0=1.0e23, G=jnp.inf, Cp=750.0, k=2.5, gravity=9.81,
            ),
            Material(rho0=100.0, eta0=1.0e19, Cp=3.0e3, k=1.0, gravity=9.81),
        ]
    )
    phases, T0 = _setup_phases_T(geometry)

    stokes = StokesState.make(ni, dtype=dtype)
    dt_f = stokes.P.dtype
    thermal = ThermalState.make(ni, dtype=dtype)
    thermal_bc = TemperatureBoundaryConditions(
        no_flux=Faces(left=True, right=True),
        constant_value=Faces(top=293.0, bot=1747.0),
    )
    flow_bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True)
    )
    pt_stokes = PTStokesCoeffs.make(
        geometry.li, geometry.di, eps_rel=1.0e-4, CFL=0.9 / math.sqrt(2.1)
    )

    if restart_from is not None:
        import os

        stokes, thermal, t, dt_prev = load_checkpoint(
            os.path.join(restart_from, "checkpoint.npz"), stokes, thermal
        )
        particles, pfields, t_p, _, it0 = load_checkpoint_particles(
            os.path.join(restart_from, "particles.npz")
        )
        p_phase, pT = pfields["phase"], pfields["T"]
        assert t == t_p
    else:
        it0, t = 0, 0.0
        eta0 = jnp.asarray(np.choose(phases, [1.0e20, 1.0e23, 1.0e19]), dt_f)
        stokes = stokes.replace(viscosity=stokes.viscosity.replace(eta=eta0))
        Tg = np.full((nx + 2, ny + 2), 1747.0)
        Tg[1:-1, 1:-1] = T0
        Tj = thermal_bcs(jnp.asarray(Tg, dt_f), thermal_bc)
        thermal = thermal.replace(T=Tj, Told=Tj)
        particles = init_particles(geometry, nxcell=12, max_xcell=24,
                                   min_xcell=6, seed=seed)
        p_phase = jnp.round(
            centroid2particle(jnp.asarray(phases, jnp.float64), particles, geometry)
        )
        pT = centroid2particle(thermal.T, particles, geometry)

    def ratios_and_phi(particles, p_phase):
        rc, rv = phase_ratios_from_particles(particles, p_phase, 3, geometry)
        pr_full = phase_ratios_from_field(rc)
        pr = PhaseRatios(center=rc, vertex=rv, face_x=pr_full.face_x,
                         face_y=pr_full.face_y)
        return pr, update_rock_ratio(pr, air_phase=AIR)

    kappa = 2.5 / (750.0 * 3.2e3)
    dt_diff = 0.9 * min(geometry.di) ** 2 / kappa / 4.0

    info = None
    for it in range(it0, nt):
        pr, phi = ratios_and_phi(particles, p_phase)
        T_cc = particle2centroid(pT, particles, geometry)
        Tn = thermal_bcs(thermal.T.at[1:-1, 1:-1].set(T_cc), thermal_bc)
        thermal = thermal.replace(T=Tn)
        T_c = thermal.T[1:-1, 1:-1]

        stokes, info = solve_variational(
            stokes, pt_stokes, geometry, flow_bc, material,
            pr.center, pr.vertex, phi, jnp.inf, T=T_c,
            iter_max=80_000, nout=1_000,
            viscosity_cutoff=(1.0e18, 1.0e24),
        )
        dt = float(compute_dt(stokes.V.components, geometry.di, dt_diff))

        pt_thermal = PTThermalCoeffs.from_material(
            material, T_c, stokes.P, dt, geometry.di, geometry.li,
            phase_ratios=pr.center, eps=1.0e-5, CFL=0.95 / math.sqrt(2.0),
        )
        thermal, _ = heatdiffusion_PT(
            thermal, pt_thermal, thermal_bc, dt, geometry,
            material=material, P=stokes.P, phase_ratios=pr.center,
            iter_max=10_000, nout=100,
        )
        dt0 = subgrid_characteristic_time(
            material, T_c, stokes.P, pr.center, geometry.di
        )
        pT = subgrid_diffusion(
            pT, thermal.T, thermal.dT, dt0, particles, geometry, dt
        )

        V = (stokes.V.Vx, stokes.V.Vy)
        particles = advect_rk2(particles, V, geometry, dt)
        fields = {"phase": p_phase, "T": pT}
        particles, fields = move_particles(particles, geometry, fields)
        particles, fields = inject_particles(
            particles, geometry,
            fields_from_centers={"T": thermal.T[1:-1, 1:-1]},
            phases=jnp.asarray(phases, jnp.float64), fields=fields,
        )
        p_phase, pT = fields["phase"], fields["T"]
        t += dt

        if out_dir is not None and (it + 1) % checkpoint_every == 0:
            checkpointing(out_dir, stokes, thermal, t, dt)
            checkpointing_particles(
                out_dir, particles, fields={"phase": p_phase, "T": pT},
                t=t, dt=dt, it=it + 1,
            )

    return stokes, thermal, particles, (p_phase, pT), info
