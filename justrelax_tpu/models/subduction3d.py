"""3D thermo-mechanical subduction (reference miniapps/subduction/3D/
Subduction3D.jl, analytic initial geometry instead of
GeophysicalModelGenerator — the 2D setup of models/subduction2d.py extruded
along y).

3000×L_y×675 km box: 15 km sticky air above a half-space-cooled (50 Myr)
lithosphere with a 250-km slab dipping 30°; mantle η=1e20, lithosphere
η=1e23 with T-dependent density, air handled by the masked 3D VEP solver
(``solve_vep_3d(phi=RockRatio3D)``). Coupled loop: masked 3D Stokes →
CFL dt → 3D PT thermal diffusion.

This is BASELINE.json's north-star configuration ("converged 3D Stokes
subduction run"); multi-chip execution of the same kernels is validated by
parallel/stokes3d.py + tests/test_distributed3d.py.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from justrelax_tpu.core.coeffs import PTStokesCoeffs, PTThermalCoeffs
from justrelax_tpu.core.grid import Geometry
from justrelax_tpu.core.state import StokesState, ThermalState
from justrelax_tpu.models.subduction2d import _setup_phases_T, AST, LITH, AIR
from justrelax_tpu.ops.bc import (
    Faces,
    TemperatureBoundaryConditions,
    VelocityBoundaryConditions,
    thermal_bcs,
)
from justrelax_tpu.ops.rock_ratio import update_rock_ratio_3d
from justrelax_tpu.rheology.materials import Material, MaterialStack
from justrelax_tpu.rheology.phases import phase_ratios_from_field
from justrelax_tpu.solvers.stokes3d_vep import solve_vep_3d
from justrelax_tpu.solvers.thermal import heatdiffusion_PT
from justrelax_tpu.utils.timestep import compute_dt

KM = 1.0e3


def run(nx=48, ny=8, nz=16, nt=2, dtype=None):
    lx, ly, lz = 3000.0 * KM, 500.0 * KM, 675.0 * KM
    ni = (nx, ny, nz)
    geometry = Geometry(ni, (lx, ly, lz), origin=(0.0, 0.0, -660.0 * KM))

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
    # extrude the 2D analytic setup along y using an (nx, nz) slice geometry
    g2 = Geometry((nx, nz), (lx, lz), origin=(0.0, -660.0 * KM))
    phases2, T2 = _setup_phases_T(g2)
    phases = np.repeat(phases2[:, None, :], ny, axis=1)
    T0 = np.repeat(T2[:, None, :], ny, axis=1)

    pr = phase_ratios_from_field(jnp.asarray(phases), 3)
    phi = update_rock_ratio_3d(pr, air_phase=AIR)

    stokes = StokesState.make(ni, dtype=dtype)
    dt_f = stokes.P.dtype
    eta0 = jnp.asarray(np.choose(phases, [1.0e20, 1.0e23, 1.0e19]), dt_f)
    stokes = stokes.replace(viscosity=stokes.viscosity.replace(eta=eta0))
    pt_stokes = PTStokesCoeffs.make(
        geometry.li, geometry.di, eps_rel=1.0e-4, eps_abs=1.0e-5,
        CFL=0.9 / math.sqrt(3.1),
    )
    flow_bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True,
                        front=True, back=True)
    )

    thermal = ThermalState.make(ni, dtype=dtype)
    Tg = np.full((nx + 2, ny + 2, nz + 2), 1747.0)
    Tg[1:-1, 1:-1, 1:-1] = T0
    thermal_bc = TemperatureBoundaryConditions(
        no_flux=Faces(left=True, right=True, front=True, back=True),
        constant_value=Faces(top=293.0, bot=1747.0),
    )
    Tj = thermal_bcs(jnp.asarray(Tg, dt_f), thermal_bc)
    thermal = thermal.replace(T=Tj, Told=Tj)

    kappa = 2.5 / (750.0 * 3.2e3)
    dt_diff = 0.9 * min(geometry.di) ** 2 / kappa / 6.0

    info = None
    for _ in range(nt):
        T_c = thermal.T[1:-1, 1:-1, 1:-1]
        stokes, info = solve_vep_3d(
            stokes, pt_stokes, geometry, flow_bc, material,
            pr.center, (pr.edge_yz, pr.edge_xz, pr.edge_xy),
            jnp.inf, T=T_c,
            iter_max=60_000, iter_min=500, nout=1_000,
            viscosity_cutoff=(1.0e18, 1.0e24), phi=phi,
        )
        dt = float(compute_dt(stokes.V.components, geometry.di, dt_diff))

        pt_thermal = PTThermalCoeffs.from_material(
            material, T_c, stokes.P, dt, geometry.di, geometry.li,
            phase_ratios=pr.center, eps=1.0e-5, CFL=0.95 / math.sqrt(3.0),
        )
        thermal, _ = heatdiffusion_PT(
            thermal, pt_thermal, thermal_bc, dt, geometry,
            material=material, P=stokes.P, phase_ratios=pr.center,
            iter_max=10_000, nout=100,
        )
    return stokes, thermal, info, phases
