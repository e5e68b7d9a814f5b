"""3D layered-lithosphere convection with particles
(reference miniapps/convection/Particles3D/Layered_convection3D.jl).

The 3D member of the layered-convection family: a lithosphere column
(upper crust / lower crust / mantle, phases on particles) with a hot
spherical anomaly seeding a plume, coupled multi-phase VEP Stokes (3D fused
center+edge stress kernel) → CFL timestep → PT thermal diffusion →
RK2 particle transport → phase-ratio refresh. Dimensional SI inputs (the
nondimensional workflow is demonstrated by the 2D twin,
models/layered_convection_nondim.py).
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
from justrelax_tpu.particles.particles3d import (
    advect_rk2_3d,
    init_particles_3d,
    inject_particles_3d,
    move_particles_3d,
    phase_ratios_from_particles_3d,
)
from justrelax_tpu.rheology.materials import (
    Material,
    MaterialStack,
    compute_conductivity,
    compute_rhoCp,
)
from justrelax_tpu.rheology.phases import phase_ratios_from_field
from justrelax_tpu.solvers.stokes3d_vep import solve_vep_3d
from justrelax_tpu.solvers.thermal import heatdiffusion_PT
from justrelax_tpu.utils.timestep import compute_dt

NPHASE = 3


def run(nx=16, ny=16, nz=16, nt=2, nxcell=8, max_xcell=16, min_xcell=4,
        dtype=None):
    lx, ly, lz = 100.0e3, 100.0e3, 110.0e3
    ni = (nx, ny, nz)
    geometry = Geometry(ni, (lx, ly, lz), origin=(0.0, 0.0, -lz))
    xci, xvi = geometry.xci, geometry.xvi

    z_moho = 35.0e3
    T_top, T_moho, T_bot = 273.0, 923.0, 1492.0

    def layer(rho, A, n, E, V):
        return Material(
            rho0=rho, alpha=3.0e-5, T0=T_top, Cp=1000.0, k=3.0,
            G=25.0e9, Kb=jnp.inf, gravity=9.81,
            disl_A=A, disl_n=n, disl_E=E, disl_V=V,
        )

    material = MaterialStack.make([
        layer(2700.0, 1.0e-28, 4.0, 223.0e3, 0.0),      # upper crust
        layer(2900.0, 2.0e-23, 3.2, 238.0e3, 0.0),      # lower crust
        layer(3300.0, 1.1e5 * 1.0e-6**3.5, 3.5, 530.0e3, 14.0e-6),  # mantle
    ])

    # particles carry the layer phase
    particles = init_particles_3d(geometry, nxcell, max_xcell, min_xcell)
    depth_p = -particles.pz
    phase = jnp.where(
        depth_p < 0.5 * z_moho, 0.0, jnp.where(depth_p < z_moho, 1.0, 2.0)
    )
    pr_center, _ = phase_ratios_from_particles_3d(particles, phase, NPHASE, geometry)
    pr = phase_ratios_from_field(pr_center)

    # geotherm + hot spherical anomaly at 0.7·lz depth
    Xg, Yg, Zg = jnp.meshgrid(
        *[(jnp.arange(n + 2) - 0.5) * (L / n) + o
          for n, L, o in zip(ni, (lx, ly, lz), (0.0, 0.0, -lz))],
        indexing="ij",
    )
    depth = -Zg
    geo_c = T_top + (T_moho - T_top) * depth / z_moho
    geo_m = T_moho + (T_bot - T_moho) * (depth - z_moho) / (lz - z_moho)
    T0 = jnp.where(depth < z_moho, geo_c, geo_m)
    anom = ((Xg - 0.5 * lx) ** 2 + (Yg - 0.5 * ly) ** 2
            + (Zg + 0.7 * lz) ** 2) < (0.12 * lz) ** 2
    T0 = T0 + jnp.where(anom, 250.0, 0.0)
    thermal = ThermalState.make(ni, dtype=dtype)
    T0 = T0.astype(thermal.T.dtype)
    thermal_bc = TemperatureBoundaryConditions(
        no_flux=Faces(left=True, right=True, front=True, back=True),
        constant_value=Faces(top=T_top, bot=T_bot),
    )
    thermal = thermal.replace(T=thermal_bcs(T0, thermal_bc), Told=T0)

    stokes = StokesState.make(ni, dtype=dtype)
    dt_f = stokes.P.dtype
    eta_i = jnp.full(ni, 1.0e21, dt_f)
    stokes = stokes.replace(viscosity=stokes.viscosity.replace(eta=eta_i))
    depth_c = jnp.asarray(
        np.broadcast_to(-np.asarray(xci[2])[None, None, :], ni)
    ).astype(dt_f)
    stokes = stokes.replace(P=(3100.0 * 9.81 * depth_c).astype(dt_f))

    pt = PTStokesCoeffs.make(
        geometry.li, geometry.di, CFL=0.9 / math.sqrt(3.1),
        eps_abs=1.0e-5, eps_rel=1.0e-5,
    )
    flow_bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, front=True, back=True,
                        top=True, bot=True)
    )
    cutoff = (1.0e17, 1.0e24)

    info = None
    dt = 1.0e10  # ~300 yr initial elastic step; replaced by CFL after
    vmax_hist = []
    for _ in range(nt):
        T_cells = thermal.T[1:-1, 1:-1, 1:-1]
        stokes, info = solve_vep_3d(
            stokes, pt, geometry, flow_bc, material, pr.center,
            (pr.edge_yz, pr.edge_xz, pr.edge_xy), dt,
            T=T_cells, iter_max=20_000, iter_min=200, nout=500,
            viscosity_relaxation=1.0e-2, viscosity_cutoff=cutoff,
        )
        dt = float(compute_dt(stokes.V.components, geometry.di)) * 0.5
        K = compute_conductivity(material, T=T_cells, phase_ratios=pr.center)
        rhoCp = compute_rhoCp(material, T=T_cells, phase_ratios=pr.center)
        pt_th = PTThermalCoeffs.make(K, rhoCp, dt, geometry.di, geometry.li)
        thermal, _ = heatdiffusion_PT(
            thermal, pt_th, thermal_bc, dt, geometry, K=K, rho_Cp=rhoCp,
            iter_max=10_000, nout=200,
        )
        particles = advect_rk2_3d(particles, stokes.V.components, geometry, dt)
        particles, fields = move_particles_3d(particles, geometry, {"phase": phase})
        phase = fields["phase"]
        particles, fields = inject_particles_3d(
            particles, geometry, {}, phases=NPHASE,
            fields={"phase": phase}, phase_field="phase",
        )
        phase = fields["phase"]
        pr_center, _ = phase_ratios_from_particles_3d(
            particles, phase, NPHASE, geometry
        )
        pr = phase_ratios_from_field(pr_center)
        vmax_hist.append(float(jnp.abs(stokes.V.Vz).max()))

    return stokes, thermal, particles, phase, info, vmax_hist
