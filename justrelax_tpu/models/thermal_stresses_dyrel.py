"""Thermal stresses around a magma chamber through DYREL — the reference's
thermal-stress DYREL application
(miniapps/DYREL2D/thermal_stress/Thermal_Stress_Magma_Chamber_nondim.jl).

Same Kiss et al. (2023) configuration as
:mod:`justrelax_tpu.models.thermal_stresses` (hot chamber in compressible
VE rock, gravity off, melt-dependent expansivity), but the Stokes stage is
``solve_dyrel`` with the α·ΔT/dt pressure source the reference drives via
``args.ΔT`` (_compute_RP!, DYREL/pressure_kernels.jl:113).

NONDIMENSIONAL, like the reference (its filename says so: GEO_units at
:205). This is load-bearing, not cosmetic: with zero gravity the only
forcing is α·ΔT/dt inside RP, and DYREL's reference exit criterion takes
``min(relative, ABSOLUTE)`` per residual (solver.jl:159-161) — in SI units
α·ΔT/dt ≈ 6e-13 1/s, so the absolute branch certifies the ZERO state as
converged instantly (measured r04). Nondimensionalized, the forcing is
O(1) and the criterion behaves. Outputs are dimensionalized at return so
tests can compare directly against the dimensional APT variant.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from justrelax_tpu.core.coeffs import PTThermalCoeffs
from justrelax_tpu.core.grid import Geometry
from justrelax_tpu.core.state import StokesState, ThermalState
from justrelax_tpu.ops.bc import (
    Faces,
    TemperatureBoundaryConditions,
    VelocityBoundaryConditions,
    thermal_bcs,
)
from justrelax_tpu.rheology.materials import Material, MaterialStack
from justrelax_tpu.rheology.melting import (
    MeltingCaricchi,
    NoMelting,
    compute_melt_fraction,
    melt_dependent_alpha,
)
from justrelax_tpu.rheology.phases import phase_ratios_from_field
from justrelax_tpu.solvers.dyrel import solve_dyrel
from justrelax_tpu.solvers.thermal import heatdiffusion_PT
from justrelax_tpu.utils.units import dimensionalize, geo_units, nondimensionalize

KM = 1.0e3
ROCK, MAGMA = 0, 1


def run(nx=64, ny=64, nt=2, dtype=None, eps=1.0e-5):
    u = geo_units(length=20.0 * KM, viscosity=1.0e21, temperature=1.0e3)

    def nd(v, q):
        return nondimensionalize(v, q, u)

    lx = ly = nd(20.0 * KM, "length")
    ni = (nx, ny)
    geometry = Geometry(ni, (lx, ly), origin=(-lx / 2, -ly / 2))
    X, Y = geometry.cell_centers_mesh()
    rad = nd(2.5 * KM, "length")
    chamber = np.asarray(X) ** 2 + np.asarray(Y) ** 2 < rad**2
    phases = np.where(chamber, MAGMA, ROCK)
    pr = phase_ratios_from_field(jnp.asarray(phases), 2)

    stokes = StokesState.make(ni, dtype=dtype)
    dt_f = stokes.P.dtype

    # identical physics to thermal_stresses.run (β_rock = β_magma = 6e-11)
    Kb = nd(1.0 / 6.0e-11, "stress")
    material = MaterialStack.make([
        Material(eta0=nd(1.0e21, "viscosity"), G=nd(2.5e10, "stress"),
                 Kb=Kb, rho0=0.0),
        Material(eta0=nd(1.0e18, "viscosity"), G=nd(1.0e10, "stress"),
                 Kb=Kb, rho0=0.0),
    ])
    eta = jnp.asarray(np.where(chamber, nd(1.0e18, "viscosity"),
                               nd(1.0e21, "viscosity")), dt_f)
    eta_v0 = jnp.full((nx + 1, ny + 1), nd(1.0e21, "viscosity"), dt_f)
    alpha_rock = nd(3.0e-5, "expansivity")
    alpha_melt = nd(6.0e-5, "expansivity")
    melting = (NoMelting(), MeltingCaricchi())

    stokes = stokes.replace(viscosity=stokes.viscosity.replace(
        eta=eta, eta_v=eta_v0))
    flow_bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True)
    )
    zeros_c = jnp.zeros(ni, dt_f)

    T_host = nd(273.15 + 350.0, "temperature")
    T_magma = nd(273.15 + 1200.0, "temperature")
    rr = np.sqrt(np.asarray(X) ** 2 + np.asarray(Y) ** 2)
    T0 = T_host + (T_magma - T_host) * 0.5 * (
        1.0 - np.tanh((rr - rad) / nd(0.5 * KM, "length")))
    thermal = ThermalState.make(ni, dtype=dtype)
    Tg = np.full((nx + 2, ny + 2), T_host)
    Tg[1:-1, 1:-1] = T0
    thermal_bc = TemperatureBoundaryConditions(
        constant_value=Faces(left=float(T_host), right=float(T_host),
                             top=float(T_host), bot=float(T_host))
    )
    Tj = thermal_bcs(jnp.asarray(Tg, dt_f), thermal_bc)
    thermal = thermal.replace(T=Tj, Told=Tj)

    rho = nd(2.65e3, "density")
    Cp = nd(1.05e3, "heat_capacity")
    k_th = nd(3.0, "conductivity")
    kappa = k_th / (rho * Cp)
    dt = 0.25 * min(geometry.di) ** 2 / kappa  # conduction-limited step
    Kfield = jnp.full(ni, k_th, dt_f)
    RhoCp = jnp.full(ni, rho * Cp, dt_f)

    info = None
    phi = None
    for _ in range(nt):
        Told = thermal.T
        pt_thermal = PTThermalCoeffs.make(
            Kfield, RhoCp, dt, geometry.di, geometry.li, eps=1.0e-8,
            CFL=0.95 / math.sqrt(2.0),
        )
        thermal, _ = heatdiffusion_PT(
            thermal, pt_thermal, thermal_bc, dt, geometry,
            K=Kfield, rho_Cp=RhoCp, iter_max=20_000, nout=200,
        )
        dT = (thermal.T - Told)[1:-1, 1:-1]

        # Caricchi melt parameterization has dimensional (K) constants
        T_dim = dimensionalize(thermal.T[1:-1, 1:-1], "temperature", u)
        phi = compute_melt_fraction(melting, T_dim, phase_ratios=pr.center)
        alpha = melt_dependent_alpha(alpha_rock, alpha_melt, phi)

        stokes, info = solve_dyrel(
            stokes, geometry, flow_bc, material, pr.center, pr.vertex, dt,
            rho_g=(zeros_c, zeros_c), alpha_dT=(alpha * dT).astype(dt_f),
            eps=eps, nout=200, iter_max=75_000, total_iter_max=75_000,
        )
        stokes = stokes.replace(P0=stokes.P)

    # dimensionalize the comparison fields (tests cross-check against the
    # dimensional APT variant)
    stokes = stokes.replace(
        P=dimensionalize(stokes.P, "pressure", u),
        V=stokes.V.replace(
            Vx=dimensionalize(stokes.V.Vx, "velocity", u),
            Vy=dimensionalize(stokes.V.Vy, "velocity", u),
        ),
    )
    thermal = thermal.replace(
        T=dimensionalize(thermal.T, "temperature", u))
    return stokes, thermal, phi, info, chamber
