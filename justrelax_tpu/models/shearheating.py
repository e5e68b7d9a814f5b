"""Shear heating benchmark (Duretz et al. 2014; reference
miniapps/benchmarks/stokes2D/shear_heating + test_shearheating2D.jl).

70×40 km crustal block at 673 K under compressive pure shear (ε̇ = 5e-14)
with a rheologically weak circular inclusion (different dislocation-creep
law) at 40 km depth; viscous dissipation feeds the thermal solver.
Oracle (test_shearheating2D.jl): Stokes residual < 1e-4 and
shear_heating ≥ 0 everywhere.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from justrelax_tpu.core.coeffs import PTStokesCoeffs, PTThermalCoeffs
from justrelax_tpu.core.grid import Geometry
from justrelax_tpu.core.state import StokesState, ThermalState
from justrelax_tpu.ops.bc import (
    Faces,
    TemperatureBoundaryConditions,
    VelocityBoundaryConditions,
    flow_bcs,
    thermal_bcs,
)
from justrelax_tpu.ops.heating import compute_shear_heating
from justrelax_tpu.rheology.materials import Material, MaterialStack
from justrelax_tpu.rheology.phases import phase_ratios_from_field
from justrelax_tpu.rheology.viscosity import phase_viscosity
from justrelax_tpu.solvers.stokes2d_vep import solve_vep
from justrelax_tpu.solvers.thermal import heatdiffusion_PT
from justrelax_tpu.utils.timestep import compute_dt


def run(nx=32, ny=32, nt=5, dtype=None):
    lx, ly = 70.0e3, 40.0e3
    ni = (nx, ny)
    geometry = Geometry(ni, (lx, ly), origin=(0.0, -ly))
    xci, xvi = geometry.xci, geometry.xvi

    common = dict(rho0=2700.0, Cp=1050.0, k=2.5, gravity=9.81)
    material = MaterialStack.make(
        [
            Material(disl_A=3.2e-20, disl_n=3.0, disl_E=276.0e3, **common),
            Material(disl_A=3.16e-26, disl_n=3.3, disl_E=186.0e3, **common),
        ]
    )
    X, Y = geometry.cell_centers_mesh()
    depth = -Y
    incl = (X - lx / 2) ** 2 + (depth - 40.0e3 * ly / 40.0e3 * 0.625) ** 2 <= 3.0e3**2
    # inclusion at 25 km depth inside the 40 km box (reference: 40 km in a
    # 40-km-deep domain clips at the bottom; we keep it interior)
    incl = (X - lx / 2) ** 2 + (depth - 25.0e3) ** 2 <= 3.0e3**2
    pr = phase_ratios_from_field(jnp.asarray(incl.astype(int)), 2)

    stokes = StokesState.make(ni, dtype=dtype)
    dt_f = stokes.P.dtype

    thermal = ThermalState.make(ni, dtype=dtype)
    T0 = 273.0 + 400.0
    thermal_bc = TemperatureBoundaryConditions(
        no_flux=Faces(left=True, right=True),
        constant_value=Faces(top=T0, bot=T0),
    )
    Tj = thermal_bcs(jnp.full((nx + 2, ny + 2), T0, dt_f), thermal_bc)
    thermal = thermal.replace(T=Tj, Told=Tj)

    # initial viscosity from the background strain rate
    eps_bg = 5.0e-14
    T_c = thermal.T[1:-1, 1:-1]
    eta0 = phase_viscosity(
        material, jnp.full(ni, eps_bg, dt_f), T_c, pr.center, mode="eps"
    )
    eta0_v = phase_viscosity(
        material,
        jnp.full((nx + 1, ny + 1), eps_bg, dt_f),
        jnp.full((nx + 1, ny + 1), T0, dt_f),
        pr.vertex,
        mode="eps",
    )
    stokes = stokes.replace(
        viscosity=stokes.viscosity.replace(eta=eta0, eta_v=eta0_v)
    )

    # compressive pure-shear velocity (Shearheating2D.jl:94-96)
    xv = jnp.asarray(xvi[0], dt_f)
    yv = jnp.asarray(xvi[1], dt_f)
    Vx = jnp.broadcast_to((-(xv - lx / 2) * eps_bg)[:, None], (nx + 1, ny + 2))
    Vy = jnp.broadcast_to(((ly - jnp.abs(yv)) * eps_bg)[None, :], (nx + 2, ny + 1))
    flow_bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True)
    )
    Vx, Vy = flow_bcs((Vx, Vy), flow_bc)
    stokes = stokes.replace(V=stokes.V.replace(Vx=Vx, Vy=Vy))

    kappa = 2.5 / (1050.0 * 2700.0)
    dt_diff = 0.5 * min(geometry.di) ** 2 / kappa / 2.01

    info = None
    for _ in range(nt):
        T_c = thermal.T[1:-1, 1:-1]
        stokes, info = solve_vep(
            stokes, pt_stokes := PTStokesCoeffs.make(
                geometry.li, geometry.di, eps_rel=1.0e-9, eps_abs=1.0e-5, CFL=0.9 / math.sqrt(2.1)
            ),
            geometry, flow_bc, material, pr.center, pr.vertex, jnp.inf,
            T=T_c, iter_max=100_000, nout=500,
            viscosity_cutoff=(1.0e18, 1.0e24),
        )
        dt = float(compute_dt(stokes.V.components, geometry.di, dt_diff))

        H_s = compute_shear_heating(
            stokes.tau.xx, stokes.tau.yy, stokes.tau.xy_c,
            stokes.tau_o.xx, stokes.tau_o.yy, stokes.tau_o.xy_c,
            stokes.eps.xx, stokes.eps.yy, stokes.eps.xy,
            material, jnp.inf, phase_ratios=pr.center,
        )
        thermal = thermal.replace(shear_heating=H_s)

        pt_thermal = PTThermalCoeffs.from_material(
            material, thermal.T[1:-1, 1:-1], stokes.P, dt, geometry.di, geometry.li,
            phase_ratios=pr.center, eps=1.0e-5, CFL=1.0e-3 / math.sqrt(2.1),
        )
        thermal, _ = heatdiffusion_PT(
            thermal, pt_thermal, thermal_bc, dt, geometry,
            material=material, P=stokes.P, phase_ratios=pr.center,
            iter_max=10_000, nout=100,
        )
    return stokes, thermal, info
