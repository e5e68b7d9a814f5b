"""Nondimensionalized layered-lithosphere convection with particles
(reference miniapps/convection/Particles2D_nonDim/Layered_convection2D.jl).

The reference variant demonstrates the GeoParams ``GEO_units`` workflow: every
physical input (geometry, gravity, density, creep parameters, conductivity,
boundary temperatures) is nondimensionalized with characteristic scales so
the PT solver operates near O(1); outputs are ``dimensionalize``d back. This
model reproduces that workflow with utils/units.py:

- CharDim = geo_units(length=40 km, viscosity=1e20 Pa·s, temperature=1000 K)
  (the reference script's scales);
- layered phases (upper crust / lower crust / lithospheric mantle) carried on
  particles, plus a hot spherical thermal anomaly that seeds a rising plume
  (reference init_T!/rectangular perturbation, Layered_convection2D.jl:38-76);
- dislocation-creep rheology per layer; the creep parameters transform as
  A' = A·σc^n·tc, E' = E/Θc, V' = V·σc/Θc so the *unchanged* viscosity code
  (exp(E/(R·T)) forms in rheology/viscosity.py) evaluates the dimensional
  law exactly on nondimensional fields;
- coupled loop: VEP Stokes → CFL dt → PT thermal (shear heating off) →
  particle advection/injection → phase ratios — the same pipeline as the
  dimensional Particles2D model (models/vankeken.py structure).

Returns nondimensional state plus the CharacteristicUnits so callers can
dimensionalize (the test checks the dimensional plume ascent rate).
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
    compute_conductivity,
    compute_rhoCp,
)
from justrelax_tpu.solvers.stokes2d_vep import solve_vep
from justrelax_tpu.solvers.thermal import heatdiffusion_PT
from justrelax_tpu.utils.timestep import compute_dt
from justrelax_tpu.utils.units import geo_units, nondimensionalize

NPHASE = 3  # upper crust / lower crust / mantle


def _nd_creep(u, A, n, E, V):
    """Nondimensionalize a power-law creep parameter set (see module doc)."""
    sigma_c = u.scale("stress")
    t_c = u.scale("time")
    theta_c = u.scale("temperature")
    return dict(
        disl_A=A * sigma_c**n * t_c,
        disl_n=n,
        disl_E=E / theta_c,
        disl_V=V * sigma_c / theta_c,
    )


def run(nx=32, ny=32, nt=3, nxcell=24, max_xcell=48, min_xcell=12, dtype=None):
    u = geo_units(length=40.0e3, viscosity=1.0e20, temperature=1000.0)

    # --- dimensional setup (SI), then nondimensionalize everything ----------
    lx_d, ly_d = 100.0e3, 110.0e3
    lx = nondimensionalize(lx_d, "length", u)
    ly = nondimensionalize(ly_d, "length", u)
    g = nondimensionalize(9.81, "gravity", u)
    T_top = nondimensionalize(273.0, "temperature", u)
    T_bot = nondimensionalize(1492.0, "temperature", u)
    T_moho = nondimensionalize(923.0, "temperature", u)
    z_moho = nondimensionalize(35.0e3, "length", u)

    def phase_mat(rho, k, Cp, A, n, E, V):
        return Material(
            rho0=nondimensionalize(rho, "density", u),
            alpha=nondimensionalize(3.0e-5, "expansivity", u),
            T0=T_top,
            k=nondimensionalize(k, "conductivity", u),
            Cp=nondimensionalize(Cp, "heat_capacity", u),
            G=nondimensionalize(25.0e9, "stress", u),
            Kb=jnp.inf,
            gravity=g,
            **_nd_creep(u, A, n, E, V),
        )

    material = MaterialStack.make([
        # upper crust: wet-quartzite-like dislocation creep
        phase_mat(2700.0, 2.5, 1000.0, A=1.0e-28, n=4.0, E=223.0e3, V=0.0),
        # lower crust: intermediate
        phase_mat(2900.0, 2.5, 1000.0, A=2.0e-23, n=3.2, E=238.0e3, V=0.0),
        # lithospheric mantle: dry olivine (Hirth & Kohlstedt 2003, SI)
        phase_mat(3300.0, 3.0, 1000.0, A=1.1e5 * 1.0e-6**3.5, n=3.5,
                  E=530.0e3, V=14.0e-6),
    ])

    ni = (nx, ny)
    geometry = Geometry(ni, (lx, ly), origin=(0.0, -ly))
    xci, xvi = geometry.xci, geometry.xvi

    # --- particles carry the layer phase ------------------------------------
    particles = init_particles(geometry, nxcell, max_xcell, min_xcell)
    depth_p = -particles.py
    phase = jnp.where(
        depth_p < 0.5 * z_moho, 0.0, jnp.where(depth_p < z_moho, 1.0, 2.0)
    )
    pr_c, pr_v = phase_ratios_from_particles(particles, phase, NPHASE, geometry)

    # --- initial temperature: piecewise-linear geotherm + hot ellipse -------
    Xc, Yc = jnp.meshgrid(
        jnp.asarray(np.r_[xci[0][0] - geometry.di[0], xci[0], xci[0][-1] + geometry.di[0]]),
        jnp.asarray(np.r_[xci[1][0] - geometry.di[1], xci[1], xci[1][-1] + geometry.di[1]]),
        indexing="ij",
    )
    depth = -Yc
    geo_crust = T_top + (T_moho - T_top) * depth / z_moho
    geo_mantle = T_moho + (T_bot - T_moho) * (depth - z_moho) / (ly - z_moho)
    T0 = jnp.where(depth < z_moho, geo_crust, geo_mantle)
    # spherical thermal anomaly (the plume seed), reference :69-76
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
    eta_i = nondimensionalize(1.0e21, "viscosity", u)
    stokes = stokes.replace(
        viscosity=stokes.viscosity.replace(
            eta=jnp.full(ni, eta_i, stokes.P.dtype),
            eta_v=jnp.full((nx + 1, ny + 1), eta_i, stokes.P.dtype),
        )
    )
    # lithostatic pressure init (reference init_P!, Layered_convection2D.jl:38-42)
    rho_mean = nondimensionalize(3100.0, "density", u)
    depth_c = jnp.asarray(np.broadcast_to(-np.asarray(xci[1])[None, :], ni))
    stokes = stokes.replace(P=(rho_mean * g * depth_c).astype(stokes.P.dtype))
    pt_stokes = PTStokesCoeffs.make(
        geometry.li, geometry.di, CFL=0.9 / math.sqrt(2.1),
        eps_abs=1.0e-5, eps_rel=1.0e-5,
    )
    flow_bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True)
    )

    cutoff = (
        nondimensionalize(1.0e17, "viscosity", u),
        nondimensionalize(1.0e24, "viscosity", u),
    )

    info = None
    t = 0.0
    dt = 1.0  # nondim; replaced by the CFL value after the first solve
    vmax_hist = []
    for _ in range(nt):
        T_cells = thermal.T[1:-1, 1:-1]
        stokes, info = solve_vep(
            stokes, pt_stokes, geometry, flow_bc, material, pr_c, pr_v,
            dt=dt, T=T_cells, iter_max=30_000, nout=500,
            viscosity_relaxation=1.0e-2, viscosity_cutoff=cutoff,
        )
        dt = float(compute_dt(stokes.V.components, geometry.di)) * 0.5
        K = compute_conductivity(material, T=T_cells, phase_ratios=pr_c)
        rhoCp = compute_rhoCp(material, T=T_cells, phase_ratios=pr_c)
        pt_thermal = PTThermalCoeffs.make(K, rhoCp, dt, geometry.di, geometry.li)
        thermal, _ = heatdiffusion_PT(
            thermal, pt_thermal, thermal_bc, dt, geometry, K=K, rho_Cp=rhoCp,
            iter_max=20_000, nout=200,
        )
        particles = advect_rk2(particles, stokes.V.components, geometry, dt)
        particles, fields = move_particles(particles, geometry, {"phase": phase})
        phase = fields["phase"]
        particles, fields = inject_particles(
            particles, geometry, {}, phases=NPHASE,
            fields={"phase": phase}, phase_field="phase",
        )
        phase = fields["phase"]
        pr_c, pr_v = phase_ratios_from_particles(particles, phase, NPHASE, geometry)
        t += dt
        vmax_hist.append(float(jnp.abs(stokes.V.Vy).max()))

    return stokes, thermal, particles, phase, info, u, vmax_hist
