"""3D shear heating benchmark (Duretz et al. 2014; reference
miniapps/benchmarks/stokes3D/shear_heating/Shearheating3D.jl +
test_shearheating3D.jl:237-251).

70×60×40 km crustal block at 673 K under compressive pure shear with a
rheologically weak spherical inclusion; viscous dissipation feeds the 3D
PT thermal solver. Nonlinear viscosity is handled by Picard outer
iterations (viscosity refreshed from T and strain rate between solves)
around the VE 3D APT solver. Oracle (as in the reference test): final
Stokes residual < 1e-4 and shear_heating ≥ 0 everywhere.
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
    flow_bcs,
    thermal_bcs,
)
from justrelax_tpu.ops.heating import (
    compute_shear_heating_3d,
    shear_components_to_centers_3d,
)
from justrelax_tpu.rheology.materials import Material, MaterialStack
from justrelax_tpu.rheology.phases import phase_ratios_from_field
from justrelax_tpu.rheology.viscosity import phase_viscosity
from justrelax_tpu.solvers.stokes3d import solve_ve_3d
from justrelax_tpu.solvers.thermal import heatdiffusion_PT
from justrelax_tpu.utils.timestep import compute_dt


def run(nx=16, ny=16, nz=16, nt=3, rc=3.0e3, dtype=None):
    lx, ly, lz = 70.0e3, 60.0e3, 40.0e3
    ni = (nx, ny, nz)
    geometry = Geometry(ni, (lx, ly, lz), origin=(0.0, 0.0, -lz))
    xvi = geometry.xvi

    common = dict(rho0=2700.0, Cp=1050.0, k=2.5, gravity=9.81, G=jnp.inf)
    material = MaterialStack.make(
        [
            Material(disl_A=3.2e-20, disl_n=3.0, disl_E=276.0e3, **common),
            Material(disl_A=3.16e-26, disl_n=3.3, disl_E=186.0e3, **common),
        ]
    )
    X, Y, Z = geometry.cell_centers_mesh()
    incl = (
        (np.asarray(X) - lx / 2) ** 2
        + (np.asarray(Y) - ly / 2) ** 2
        + (np.asarray(Z) + 25.0e3) ** 2
        <= rc**2
    )
    pr = phase_ratios_from_field(jnp.asarray(incl.astype(int)), 2)

    stokes = StokesState.make(ni, dtype=dtype)
    dt_f = stokes.P.dtype

    thermal = ThermalState.make(ni, dtype=dtype)
    T0 = 273.0 + 400.0
    thermal_bc = TemperatureBoundaryConditions(
        no_flux=Faces(left=True, right=True, front=True, back=True),
        constant_value=Faces(top=T0, bot=T0),
    )
    Tj = thermal_bcs(jnp.full((nx + 2, ny + 2, nz + 2), T0, dt_f), thermal_bc)
    thermal = thermal.replace(T=Tj, Told=Tj)

    eps_bg = 5.0e-14
    flow_bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True,
                        front=True, back=True)
    )
    # compressive pure shear: shortening along x, extrusion along z
    xv = jnp.asarray(xvi[0], dt_f)
    zv = jnp.asarray(xvi[2], dt_f)
    Vx = jnp.broadcast_to(
        (-(xv - lx / 2) * eps_bg)[:, None, None], (nx + 1, ny + 2, nz + 2)
    )
    Vy = jnp.zeros((nx + 2, ny + 1, nz + 2), dt_f)
    Vz = jnp.broadcast_to(
        ((zv + lz / 2) * eps_bg)[None, None, :], (nx + 2, ny + 2, nz + 1)
    )
    Vx, Vy, Vz = flow_bcs((Vx, Vy, Vz), flow_bc)
    stokes = stokes.replace(V=stokes.V.replace(Vx=Vx, Vy=Vy, Vz=Vz))

    pt_stokes = PTStokesCoeffs.make(
        geometry.li, geometry.di, eps_rel=1.0e-9, eps_abs=1.0e-5,
        CFL=0.9 / math.sqrt(3.1),
    )
    kappa = 2.5 / (1050.0 * 2700.0)
    dt_diff = 0.5 * min(geometry.di) ** 2 / kappa / 3.01
    zeros = jnp.zeros(ni, dt_f)
    K_inf = jnp.asarray(jnp.inf, dt_f)
    G_field = jnp.full(ni, jnp.inf, dt_f)
    visc_cut = (1.0e18, 1.0e24)

    from justrelax_tpu.ops import stokes3d as k3

    def strain_rate_6(stokes):
        V = stokes.V
        inv_di = tuple(1.0 / d for d in geometry.di)
        grad_V = k3.compute_grad_V_3d(V.Vx, V.Vy, V.Vz, inv_di)
        return k3.compute_strain_rate_3d(grad_V, V.Vx, V.Vy, V.Vz, inv_di)

    info = None
    eII = jnp.full(ni, eps_bg, dt_f)
    for _ in range(nt):
        T_c = thermal.T[1:-1, 1:-1, 1:-1]
        # Picard refresh: viscosity from current T and strain-rate invariant
        for _pic in range(2):
            eta = jnp.clip(
                phase_viscosity(material, eII, T_c, pr.center, mode="eps"),
                *visc_cut,
            )
            stokes = stokes.replace(viscosity=stokes.viscosity.replace(eta=eta))
            stokes, info = solve_ve_3d(
                stokes, pt_stokes, geometry, flow_bc, (zeros, zeros, zeros),
                G_field, K_inf, jnp.inf, iter_max=20_000, nout=500,
            )
            exx, eyy, ezz, eyz, exz, exy = strain_rate_6(stokes)
            eII = jnp.maximum(
                k3.tensor_invariant_staggered_3d(exx, eyy, ezz, eyz, exz, exy),
                1.0e-18,
            )
        dt = float(compute_dt(stokes.V.components, geometry.di, dt_diff))

        tau = stokes.tau
        yz_c, xz_c, xy_c = shear_components_to_centers_3d(tau.yz, tau.xz, tau.xy)
        exx, eyy, ezz, eyz, exz, exy = strain_rate_6(stokes)
        eyz_c, exz_c, exy_c = shear_components_to_centers_3d(eyz, exz, exy)
        H_s = compute_shear_heating_3d(
            (tau.xx, tau.yy, tau.zz, yz_c, xz_c, xy_c),
            (tau.xx, tau.yy, tau.zz, yz_c, xz_c, xy_c),  # G=inf: elastic part 0
            (exx, eyy, ezz, eyz_c, exz_c, exy_c),
            material, jnp.inf, phase_ratios=pr.center,
        )
        thermal = thermal.replace(shear_heating=H_s)

        pt_thermal = PTThermalCoeffs.from_material(
            material, T_c, stokes.P, dt, geometry.di, geometry.li,
            phase_ratios=pr.center, eps=1.0e-5, CFL=0.95 / math.sqrt(3.0),
        )
        thermal, _ = heatdiffusion_PT(
            thermal, pt_thermal, thermal_bc, dt, geometry,
            material=material, P=stokes.P, phase_ratios=pr.center,
            iter_max=10_000, nout=100,
        )
    return stokes, thermal, info
