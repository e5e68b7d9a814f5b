"""Caldera / Volcano2D driven by the DYREL solver — the reference's DYREL
application tier (miniapps/benchmarks/stokes2D/Volcano2D/Caldera2D_DYREL.jl).

Same analytic caldera configuration as :mod:`justrelax_tpu.models.volcano2d`
(20-Myr half-space-cooled crust, elliptical magma chamber with an eruptible
core, sticky air), but the Stokes stage is ``solve_dyrel`` — the
Powell–Hestenes + dynamic-relaxation solver with nonlinear viscosity
refresh — instead of the variational APT solve. Matching the reference DYREL
variant, the solve is UNMASKED (no rock ratio: the air is a weak phase that
carries equations; RockRatio-DYREL is WIP upstream with no exported path)
and the coupled loop runs, per step (Caldera2D_DYREL.jl:325-420):

  particles T → grid → solve_DYREL (nonlinear viscosity, cutoff, melt-aware
  args) → particle stress rotation → CFL dt → PT thermal diffusion with the
  chamber Dirichlet anomaly → subgrid particle-T diffusion → particle
  advection/injection → melt fraction → phase-ratio refresh.

(The reference's DYREL variant comments out the marker-chain advection and
phase-ratio refresh, Caldera2D_DYREL.jl:410-420; this analogue keeps the
refresh on — the stronger coupling — and is cross-checked against the
variational volcano2d result in tests/test_volcano2d_dyrel.py.)
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from justrelax_tpu.core.coeffs import PTThermalCoeffs
from justrelax_tpu.core.grid import Geometry
from justrelax_tpu.core.state import StokesState, ThermalState
from justrelax_tpu.models.volcano2d import (
    AIR,
    CHAMBER,
    KM,
    MAGMA,
    N_PHASE,
    YR,
    _materials,
    _setup,
)
from justrelax_tpu.ops.bc import (
    Faces,
    TemperatureBoundaryConditions,
    VelocityBoundaryConditions,
    thermal_bcs,
)
from justrelax_tpu.ops.stress_rotation import (
    compute_vorticity_center,
    rotate_stress_particles_2d,
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
from justrelax_tpu.rheology.melting import (
    MeltingCaricchi,
    NoMelting,
    compute_melt_fraction,
)
from justrelax_tpu.rheology.phases import PhaseRatios, phase_ratios_from_field
from justrelax_tpu.solvers.dyrel import solve_dyrel
from justrelax_tpu.solvers.thermal import heatdiffusion_PT


def run(nx=16, ny=8, nt=2, dtype=None, seed=0, eps=1.0e-4):
    lx, lz = 30.0 * KM, 25.0 * KM
    ni = (nx, ny)
    geometry = Geometry(ni, (lx, lz), origin=(0.0, -20.0 * KM))
    material = _materials()
    melting = (NoMelting(), NoMelting(), MeltingCaricchi(), MeltingCaricchi(),
               NoMelting())

    phases_c, T_c0 = _setup(geometry)

    particles = init_particles(geometry, nxcell=12, max_xcell=24, min_xcell=6,
                               seed=seed)
    p_phase = jnp.round(
        centroid2particle(jnp.asarray(phases_c, jnp.float64), particles, geometry)
    )
    # setup-time topography correction (Caldera2D_DYREL.jl:194 — active in
    # the reference's DYREL variant; the in-loop call at :412 is commented
    # out there, matching this loop): interpolation-smeared phases around
    # the initial surface are reconciled with the chain before the solve
    from justrelax_tpu.particles.marker_chain import (
        init_marker_chain,
        update_phases_given_markerchain,
    )

    chain0 = init_marker_chain(geometry, 0.0)
    particles, _ = update_phases_given_markerchain(
        chain0, particles, p_phase, AIR)
    pT = centroid2particle(jnp.asarray(T_c0), particles, geometry)
    p_txx = jnp.zeros_like(particles.px)
    p_tyy = jnp.zeros_like(particles.px)
    p_txy = jnp.zeros_like(particles.px)

    def ratios(particles, p_phase):
        rc, rv = phase_ratios_from_particles(particles, p_phase, N_PHASE, geometry)
        pr_full = phase_ratios_from_field(rc)
        return PhaseRatios(center=rc, vertex=rv, face_x=pr_full.face_x,
                           face_y=pr_full.face_y)

    pr = ratios(particles, p_phase)

    stokes = StokesState.make(ni, dtype=dtype)
    dt_f = stokes.P.dtype
    eta0 = jnp.asarray(
        np.choose(phases_c, [1.0e21, 1.0e21, 1.0e16, 1.0e16, 1.0e17]), dt_f
    )
    stokes = stokes.replace(viscosity=stokes.viscosity.replace(eta=eta0))

    # lithostatic pressure initialization (reference Caldera2D_DYREL.jl:231:
    # P .= reverse(cumsum(reverse(ρg_y·dz))) — the PH penalty iteration
    # starts ~5e8 Pa from hydrostatic otherwise and stalls at test budgets)
    from justrelax_tpu.rheology.materials import (
        _as_stack,
        compute_density,
        phase_average,
    )

    rho0 = compute_density(material, T=jnp.asarray(T_c0, dt_f),
                           P=stokes.P, phase_ratios=pr.center)
    g0 = phase_average(_as_stack(material).params.gravity, pr.center)
    rho_gy0 = rho0 * jnp.broadcast_to(g0, rho0.shape)
    P_litho = jnp.cumsum(
        (rho_gy0 * geometry.di[1])[:, ::-1], axis=1
    )[:, ::-1]
    stokes = stokes.replace(P=P_litho.astype(dt_f))
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

    hot = (phases_c == CHAMBER) | (phases_c == MAGMA)
    dirichlet = (
        jnp.asarray(hot.astype(float), dt_f),
        jnp.asarray(np.where(hot, T_c0, 0.0), dt_f),
    )

    from justrelax_tpu.utils.timestep import compute_dt

    dt = 500.0 * YR
    dt_max = 2.0e3 * YR
    info = None
    phi_m = None
    aux = {}
    for _ in range(nt):
        T_cc = particle2centroid(pT, particles, geometry)
        Tn = thermal_bcs(thermal.T.at[1:-1, 1:-1].set(T_cc), thermal_bc)
        thermal = thermal.replace(T=Tn)
        T_center = thermal.T[1:-1, 1:-1]
        phi_m = compute_melt_fraction(melting, T_center, phase_ratios=pr.center)

        # phase-blended T/P-dependent buoyancy (the variational solver
        # computes this internally; DYREL takes it explicitly like the
        # reference's ρg argument)
        from justrelax_tpu.rheology.materials import (
            _as_stack,
            compute_density,
            phase_average,
        )

        rho = compute_density(material, T=T_center, P=stokes.P,
                              phase_ratios=pr.center)
        g = phase_average(_as_stack(material).params.gravity, pr.center)
        rho_g = (jnp.zeros_like(rho), rho * jnp.broadcast_to(g, rho.shape))

        # DYREL Stokes: nonlinear viscosity refresh + cutoff, reference
        # kwargs (Caldera2D_DYREL.jl:330-350: λ_relaxation=1,
        # viscosity_relaxation=1e-3)
        stokes, info = solve_dyrel(
            stokes, geometry, flow_bc, material, pr.center, pr.vertex, dt,
            rho_g=rho_g, T=T_center, eps=eps, nout=200, iter_max=50_000,
            total_iter_max=50_000, lambda_relax=1.0,
            linear_viscosity=False, viscosity_relaxation=1.0e-3,
            viscosity_cutoff=(1.0e16, 1.0e23),
        )
        # solve-time buoyancy, for the independent force-balance oracle in
        # tests (the loop-end pr/T refresh would perturb ρg at interfaces)
        aux = {"rho_gy": rho_g[1]}

        w_c = compute_vorticity_center(
            stokes.V.Vx, stokes.V.Vy, 1.0 / geometry.di[0], 1.0 / geometry.di[1]
        )
        w_p = centroid2particle(w_c, particles, geometry)
        p_txx, p_tyy, p_txy = rotate_stress_particles_2d(
            p_txx, p_tyy, p_txy, w_p, dt
        )

        dt = float(compute_dt(stokes.V.components, geometry.di, dt_max)) * 0.5

        pt_thermal = PTThermalCoeffs.from_material(
            material, T_center, stokes.P, dt, geometry.di, geometry.li,
            phase_ratios=pr.center, eps=1.0e-8, CFL=0.95 / math.sqrt(2.0),
        )
        thermal, _ = heatdiffusion_PT(
            thermal, pt_thermal, thermal_bc, dt, geometry,
            material=material, P=stokes.P, phase_ratios=pr.center,
            dirichlet=dirichlet, iter_max=20_000, nout=200,
        )

        dt0 = subgrid_characteristic_time(
            material, T_center, stokes.P, pr.center, geometry.di
        )
        pT = subgrid_diffusion(
            pT, thermal.T[1:-1, 1:-1], thermal.dT[1:-1, 1:-1], dt0,
            particles, geometry, dt,
        )

        V = (stokes.V.Vx, stokes.V.Vy)
        particles = advect_rk2(particles, V, geometry, dt)
        fields = {"phase": p_phase, "T": pT,
                  "txx": p_txx, "tyy": p_tyy, "txy": p_txy}
        particles, fields = move_particles(particles, geometry, fields)
        particles, fields = inject_particles(
            particles, geometry,
            fields_from_centers={"T": thermal.T[1:-1, 1:-1]},
            phases=jnp.asarray(phases_c, jnp.float64), fields=fields,
        )
        p_phase, pT = fields["phase"], fields["T"]
        p_txx, p_tyy, p_txy = fields["txx"], fields["tyy"], fields["txy"]
        pr = ratios(particles, p_phase)

    return stokes, thermal, particles, phi_m, info, aux
