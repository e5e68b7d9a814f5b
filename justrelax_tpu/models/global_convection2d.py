"""Global mantle convection with WENO-5 temperature advection
(reference miniapps/convection/GlobalConvection2D_WENO5.jl).

A 2890 km-deep mantle box with a half-space-cooling geotherm, a circular
thermal anomaly, and the miniapp's *custom* Arrhenius rheology

    η(T, P, z) = η0 · exp((Ea + P·Va)/(R·T) − Ea/(R·T0)) · corr(depth)

with corr = 1 above 660 km, 10 in the lower mantle, 0.1 below 2700 km,
clamped to the viscosity cutoff (GlobalConvection2D_WENO5.jl:12-35). The
reference treats this as a user-plugged `CustomRheology` evaluated inside
its solver; here the custom law is a model-level function and each timestep
runs a short Picard loop (η(T, P) → VE Stokes → updated P), which reaches the
same self-consistent state at the miniapp's loose tolerance (ϵ 1e-4).

Coupled loop per step (reference :215-275): buoyancy ρ(T, P)·g → VE Stokes →
CFL dt → PT thermal diffusion → WENO-5 advection of T at centers.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np
from scipy.special import erf

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
from justrelax_tpu.rheology.materials import Material, compute_density
from justrelax_tpu.solvers.stokes2d import solve_ve
from justrelax_tpu.solvers.thermal import heatdiffusion_PT
from justrelax_tpu.utils.timestep import compute_dt

R_GAS = 8.3145
YR = 3600.0 * 24.0 * 365.25


def custom_viscosity(T, P, depth, eta0=5.0e20, Ea=200.0e3, Va=2.6e-6,
                     T0=1.6e3, cutoff=(1.0e16, 1.0e24)):
    """The miniapp's CustomRheology viscosity (.jl:24-35)."""
    eta = eta0 * jnp.exp((Ea + P * Va) / (R_GAS * jnp.maximum(T, 1.0))
                         - Ea / (R_GAS * T0))
    corr = (
        (depth <= 660.0e3) * 1.0
        + ((depth > 660.0e3) & (depth <= 2740.0e3)) * 10.0
        + (depth > 2740.0e3) * 0.1
    )
    return jnp.clip(eta * corr, cutoff[0], cutoff[1])


def half_space_cooling_T(zc, kappa, Tm, Tp, Tmin):
    """Half-space-cooling initial T at cell-center depths (.jl:45-54)."""
    z = np.abs(np.asarray(zc))
    dTdz = (Tm - Tp) / 2890.0e3
    T_adiabat = Tp + dTdz * z
    t_cool = 100.0e6 * YR
    T_hs = Tmin + (Tm - Tmin) * erf(z * 0.5 / np.sqrt(kappa * t_cool))
    return np.minimum(T_adiabat, T_hs)


def run(n=32, ar=1, nt=5, picard=2, dtype=None):
    nx, ny = n * ar, n
    ni = (nx, ny)
    ly = 2890.0e3
    lx = ly * ar
    geometry = Geometry(ni, (lx, ly), origin=(0.0, -ly))
    xci, xvi = geometry.xci, geometry.xvi
    di = geometry.di

    # material (reference "Mantle": PT_Density ρ0=3.1e3 α=1.5e-5 T0=0,
    # Cp=1.2e3, k=3, G=70 GPa, ν=0.5 → Kb=∞)
    rho0, Cp0, k0, G0, g = 3.1e3, 1.2e3, 3.0, 70.0e9, 9.81
    material = Material(rho0=rho0, T0=0.0, alpha=1.5e-5, beta=0.0,
                        Cp=Cp0, k=k0, gravity=g)
    kappa = k0 / (Cp0 * rho0)
    dt_diff = 0.5 * min(di) ** 2 / kappa / 2.01
    viscosity_cutoff = (1.0e16, 1.0e24)

    # temperature: half-space cooling + circular anomaly (.jl:139-168)
    adiabat = 0.3
    Tp = 1900.0
    Tm = Tp + adiabat * 2890.0
    Tmin, Tmax = 300.0, 3.5e3
    Tc = np.broadcast_to(
        half_space_cooling_T(xci[1], kappa, Tm, Tp, Tmin)[None, :], ni
    ).copy()
    xc_a, yc_a, r_a = 0.5 * lx, -0.75 * ly, 150.0e3
    X, Y = np.meshgrid(xci[0], xci[1], indexing="ij")
    inside = (X - xc_a) ** 2 + (Y - yc_a) ** 2 <= r_a**2
    Tc *= 1.0 + 0.10 * inside  # δT = 10%
    Tc[:, 0] = Tmax
    Tc[:, -1] = Tmin

    thermal = ThermalState.make(ni, dtype=dtype)
    dt_f = thermal.T.dtype
    thermal_bc = TemperatureBoundaryConditions(
        no_flux=Faces(left=True, right=True),
        constant_value=Faces(top=Tmin, bot=Tmax),
    )
    T_full = jnp.zeros((nx + 2, ny + 2), dt_f).at[1:-1, 1:-1].set(
        jnp.asarray(Tc, dt_f)
    )
    T_full = thermal_bcs(T_full, thermal_bc)
    thermal = thermal.replace(T=T_full, Told=T_full)

    stokes = StokesState.make(ni, dtype=dtype)
    depth = jnp.asarray(np.broadcast_to(np.abs(xci[1])[None, :], ni), dt_f)
    # lithostatic init P = ρg·|z| (.jl:39-42,183-186)
    rho = compute_density(material, T=thermal.T[1:-1, 1:-1], P=stokes.P)
    stokes = stokes.replace(P=rho * g * depth)

    pt_stokes = PTStokesCoeffs.make(
        geometry.li, di, eps_abs=1.0e-4, eps_rel=1.0e-4,
        CFL=0.8 / math.sqrt(2.1),
    )
    flow_bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True)
    )
    G = jnp.full(ni, G0, dt_f)
    K = jnp.full(ni, jnp.inf, dt_f)

    t = 0.0
    dt = dt_diff
    info = None
    eta_hist = []
    for _ in range(nt):
        T_center = thermal.T[1:-1, 1:-1]
        # Picard: custom η(T, P, depth) ↔ VE Stokes (the reference does this
        # inside its PT loop with relaxation; 2 passes suffice at ϵ = 1e-4)
        for _p in range(picard):
            eta = custom_viscosity(T_center, stokes.P, depth,
                                   cutoff=viscosity_cutoff)
            stokes = stokes.replace(
                viscosity=stokes.viscosity.replace(eta=eta)
            )
            rho = compute_density(material, T=T_center, P=stokes.P)
            rho_g = (jnp.zeros(ni, dt_f), rho * g)
            stokes, info = solve_ve(
                stokes, pt_stokes, geometry, flow_bc, rho_g, G, K, dt,
                iter_max=50_000, nout=1_000,
            )
        dt = float(compute_dt(stokes.V.components, di, dt_diff))

        pt_thermal = PTThermalCoeffs.from_material(
            material, T_center, stokes.P, dt, di, geometry.li,
            eps=1.0e-5, CFL=1.0e-3 / math.sqrt(2.1),
        )
        thermal, _ = heatdiffusion_PT(
            thermal, pt_thermal, thermal_bc, dt, geometry,
            material=material, P=stokes.P, iter_max=10_000, nout=100,
        )

        # WENO-5 advection of T at centers (.jl:262-268)
        Vx_c, Vy_c = velocity2center(stokes.V.Vx, stokes.V.Vy)
        Tc_new = weno_advect(thermal.T[1:-1, 1:-1], (Vx_c, Vy_c), di, dt)
        T_new = thermal.T.at[1:-1, 1:-1].set(Tc_new)
        T_new = thermal_bcs(T_new, thermal_bc)
        thermal = thermal.replace(T=T_new)
        t += dt
        eta_hist.append(
            (float(jnp.min(stokes.viscosity.eta)), float(jnp.max(stokes.viscosity.eta)))
        )

    return geometry, stokes, thermal, info, t, eta_hist
