"""Nondimensional layered convection driven by the DYREL solver — the
reference's third DYREL application family
(miniapps/DYREL2D/convection/Layered_convection2D_DYREL.jl).

Same configuration as :mod:`justrelax_tpu.models.layered_convection_nondim`
(GEO_units nondimensionalization, three dislocation-creep layers, hot
anomaly seeding a plume), but the Stokes stage is ``solve_dyrel`` with the
nonlinear viscosity refresh, matching the reference kwargs
(Layered_convection2D_DYREL.jl:257-278: viscosity_relaxation=1e-2,
viscosity_cutoff, λ_relaxation=1) and taking buoyancy ρ(T)·g explicitly
(the reference's ρg argument, recomputed per step at :111 and inside the
DYREL solve). The rest of the coupled loop — CFL dt, PT thermal diffusion,
RK2 particle advection/injection, phase-ratio refresh — is shared with the
APT variant, which tests/test_layered_convection_dyrel.py cross-checks
against.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from justrelax_tpu.core.coeffs import PTThermalCoeffs
from justrelax_tpu.models.layered_convection_nondim import NPHASE
from justrelax_tpu.particles.particles import (
    advect_rk2,
    inject_particles,
    move_particles,
    phase_ratios_from_particles,
)
from justrelax_tpu.rheology.materials import (
    Material,
    MaterialStack,
    _as_stack,
    compute_conductivity,
    compute_density,
    compute_rhoCp,
    phase_average,
)
from justrelax_tpu.solvers.dyrel import solve_dyrel
from justrelax_tpu.solvers.thermal import heatdiffusion_PT
from justrelax_tpu.utils.timestep import compute_dt
from justrelax_tpu.utils.units import nondimensionalize


def run(nx=32, ny=32, nt=3, nxcell=24, max_xcell=48, min_xcell=12,
        dtype=None, eps=1.0e-5):
    """Reuses the APT model's setup (materials, geotherm, anomaly, particles)
    via a shared-seed re-construction, then drives DYREL per step."""
    # build the identical initial configuration by calling into the APT
    # model's setup path: import the module and replicate its run() preamble
    from justrelax_tpu.models import layered_convection_nondim as base
    import math

    from justrelax_tpu.core.grid import Geometry
    from justrelax_tpu.core.state import StokesState, ThermalState
    from justrelax_tpu.ops.bc import (
        Faces,
        TemperatureBoundaryConditions,
        VelocityBoundaryConditions,
        thermal_bcs,
    )
    from justrelax_tpu.particles.particles import init_particles
    from justrelax_tpu.utils.units import geo_units

    u = geo_units(length=40.0e3, viscosity=1.0e20, temperature=1000.0)
    lx = nondimensionalize(100.0e3, "length", u)
    ly = nondimensionalize(110.0e3, "length", u)
    g = nondimensionalize(9.81, "gravity", u)
    T_top = nondimensionalize(273.0, "temperature", u)
    T_bot = nondimensionalize(1492.0, "temperature", u)
    T_moho = nondimensionalize(923.0, "temperature", u)
    z_moho = nondimensionalize(35.0e3, "length", u)

    def phase_mat(rho, k, Cp, A, n, E, V):
        # identical parameters to layered_convection_nondim.run's phase_mat
        return Material(
            rho0=nondimensionalize(rho, "density", u),
            alpha=nondimensionalize(3.0e-5, "expansivity", u),
            T0=T_top,
            k=nondimensionalize(k, "conductivity", u),
            Cp=nondimensionalize(Cp, "heat_capacity", u),
            G=nondimensionalize(25.0e9, "stress", u),
            Kb=jnp.inf,
            gravity=g,
            **base._nd_creep(u, A, n, E, V),
        )

    material = MaterialStack.make([
        phase_mat(2700.0, 2.5, 1000.0, A=1.0e-28, n=4.0, E=223.0e3, V=0.0),
        phase_mat(2900.0, 2.5, 1000.0, A=2.0e-23, n=3.2, E=238.0e3, V=0.0),
        phase_mat(3300.0, 3.0, 1000.0, A=1.1e5 * 1.0e-6**3.5, n=3.5,
                  E=530.0e3, V=14.0e-6),
    ])

    ni = (nx, ny)
    geometry = Geometry(ni, (lx, ly), origin=(0.0, -ly))
    xci = geometry.xci

    particles = init_particles(geometry, nxcell, max_xcell, min_xcell)
    depth_p = -particles.py
    phase = jnp.where(
        depth_p < 0.5 * z_moho, 0.0, jnp.where(depth_p < z_moho, 1.0, 2.0)
    )
    pr_c, pr_v = phase_ratios_from_particles(particles, phase, NPHASE,
                                             geometry)

    Xc, Yc = jnp.meshgrid(
        jnp.asarray(np.r_[xci[0][0] - geometry.di[0], xci[0],
                          xci[0][-1] + geometry.di[0]]),
        jnp.asarray(np.r_[xci[1][0] - geometry.di[1], xci[1],
                          xci[1][-1] + geometry.di[1]]),
        indexing="ij",
    )
    depth = -Yc
    geo_crust = T_top + (T_moho - T_top) * depth / z_moho
    geo_mantle = T_moho + (T_bot - T_moho) * (depth - z_moho) / (ly - z_moho)
    T0 = jnp.where(depth < z_moho, geo_crust, geo_mantle)
    xc_a, yc_a, r_a = 0.5 * lx, -ly + 0.3 * ly, 0.1 * ly
    dT = nondimensionalize(200.0, "temperature", u)
    anom = ((Xc - xc_a) ** 2 + (Yc - yc_a) ** 2) < r_a**2
    T0 = jnp.where(anom, T0 + dT, T0)
    thermal = ThermalState.make(ni, dtype=dtype)
    T0 = T0.astype(thermal.T.dtype)
    thermal_bc = TemperatureBoundaryConditions(
        no_flux=Faces(left=True, right=True),
        constant_value=Faces(top=float(T_top), bot=float(T_bot)),
    )
    thermal = thermal.replace(T=thermal_bcs(T0, thermal_bc), Told=T0)

    stokes = StokesState.make(ni, dtype=dtype)
    f = stokes.P.dtype
    flow_bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True)
    )
    cutoff = (
        nondimensionalize(1.0e17, "viscosity", u),
        nondimensionalize(1.0e24, "viscosity", u),
    )
    # per-solve viscosity seed: the εII-based creep law at V=0 (→ clamped
    # to cutoff max), the DYREL-stable analogue of the reference's
    # compute_viscosity! at solve start (solver.jl:117). Crucially NOT a
    # mid-range η (constant, εII=1e-8/s-seeded, or the previous step's
    # converged field): the in-solve per-iteration τII refresh must start
    # from an η it only LOWERS, because the Gershgorin preconditioner is
    # refreshed only every nout — η racing upward leaves the stale
    # pseudo-timestep too large and the damped iteration blows up (measured
    # r04 at 32² for all three mid-range variants; the V=0 seed converges).
    from justrelax_tpu.rheology.viscosity import phase_viscosity

    def eta_seed(Tg):
        T_cells_ = Tg[1:-1, 1:-1]
        T_v_ = 0.25 * (Tg[:-1, :-1] + Tg[1:, :-1] + Tg[:-1, 1:] + Tg[1:, 1:])
        eta0 = jnp.clip(
            phase_viscosity(material, jnp.zeros(ni, f), T_cells_, pr_c,
                            "eps"), *cutoff)
        eta_v0 = jnp.clip(
            phase_viscosity(material, jnp.zeros((nx + 1, ny + 1), f),
                            T_v_, pr_v, "eps"), *cutoff)
        return eta0.astype(f), eta_v0.astype(f)

    def buoyancy(T_cells, pr_c):
        rho = compute_density(material, T=T_cells, phase_ratios=pr_c)
        gph = phase_average(_as_stack(material).params.gravity, pr_c)
        return (rho * gph).astype(f)

    # lithostatic pressure init ONCE before the time loop (reference
    # Layered_convection2D_DYREL.jl:186-189); P persists across steps —
    # a per-step reset leaves P inconsistent with the carried stresses and
    # the step-2 DYREL solve diverges (measured r04)
    rho_gy = buoyancy(thermal.T[1:-1, 1:-1], pr_c)
    P_litho = jnp.cumsum((rho_gy * geometry.di[1])[:, ::-1], axis=1)[:, ::-1]
    stokes = stokes.replace(P=P_litho.astype(f))

    info = None
    t = 0.0
    dt = 1.0
    vmax_hist = []
    for _ in range(nt):
        T_cells = thermal.T[1:-1, 1:-1]
        # per-step ρ(T)·g refresh (the reference recomputes ρg inside
        # solve_DYREL! from args; T is frozen during a solve so computing it
        # here is equivalent) + the per-solve η seed (see eta_seed above)
        rho_gy = buoyancy(T_cells, pr_c)
        eta_s, eta_vs = eta_seed(thermal.T)
        stokes = stokes.replace(
            viscosity=stokes.viscosity.replace(eta=eta_s, eta_v=eta_vs))
        stokes, info = solve_dyrel(
            stokes, geometry, flow_bc, material, pr_c, pr_v, dt,
            rho_g=(jnp.zeros(ni, f), rho_gy), T=T_cells, eps=eps, nout=200,
            iter_max=50_000, total_iter_max=50_000,
            linear_viscosity=False, viscosity_relaxation=1.0e-2,
            viscosity_cutoff=cutoff,
        )
        dt = float(compute_dt(stokes.V.components, geometry.di)) * 0.5
        K = compute_conductivity(material, T=T_cells, phase_ratios=pr_c)
        rhoCp = compute_rhoCp(material, T=T_cells, phase_ratios=pr_c)
        pt_thermal = PTThermalCoeffs.make(K, rhoCp, dt, geometry.di,
                                          geometry.li)
        thermal, _ = heatdiffusion_PT(
            thermal, pt_thermal, thermal_bc, dt, geometry, K=K,
            rho_Cp=rhoCp, iter_max=20_000, nout=200,
        )
        particles = advect_rk2(particles, stokes.V.components, geometry, dt)
        particles, fields = move_particles(particles, geometry,
                                           {"phase": phase})
        phase = fields["phase"]
        particles, fields = inject_particles(
            particles, geometry, {}, phases=NPHASE,
            fields={"phase": phase}, phase_field="phase",
        )
        phase = fields["phase"]
        pr_c, pr_v = phase_ratios_from_particles(particles, phase, NPHASE,
                                                 geometry)
        t += dt
        vmax_hist.append(float(jnp.abs(stokes.V.Vy).max()))

    return stokes, thermal, particles, phase, info, u, vmax_hist
