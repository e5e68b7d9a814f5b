"""3D thermal diffusion benchmarks (reference test_diffusion3D.jl +
test_diffusion3D_multiphase.jl).

A 100 km cube with a linear geotherm (1600→1900 K down the cell-center
column), Dirichlet top/bottom (300 K / 3500 K), insulating sides, constant
radiogenic heating 1e-6 W/m³ and a +100 K spherical perturbation of radius
10 km at the domain center; 10 implicit steps of 50 kyr with the PT solver.

Golden values (single-phase, test_diffusion3D.jl:150-151; ghosted 34³ T,
0-based indices):
  T[15, 15, 15] ≈ 1813.2470160788096   (rtol 1e-3)
  T[16, 16, 16] ≈ 1831.2568044653274

Multiphase (particle-carried second phase inside the sphere: PT_Density
ρ0 = 3.0e3/3.3e3, radiogenic 1e-6/1e-7; test_diffusion3D_multiphase.jl:214-215):
  T[15, 15, 15] ≈ 1816.8262937737384
  T[16, 16, 16] ≈ 1834.4197141500213
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from justrelax_tpu.core.coeffs import PTThermalCoeffs
from justrelax_tpu.core.grid import Geometry
from justrelax_tpu.core.state import ThermalState
from justrelax_tpu.ops.bc import Faces, TemperatureBoundaryConditions, thermal_bcs
from justrelax_tpu.rheology.materials import Material, MaterialStack
from justrelax_tpu.solvers.thermal import heatdiffusion_PT

KYR = 1.0e3 * 3600 * 24 * 365.25
MYR = 1.0e3 * KYR


def _setup_thermal(ni, li, dtype):
    nx, ny, nz = ni
    geometry = Geometry(ni, li, origin=(0.0, 0.0, -li[2]))
    xci = geometry.xci

    thermal = ThermalState.make(ni, dtype=dtype)
    thermal = thermal.replace(H=jnp.full(ni, 1.0e-6, dtype))

    # linear geotherm on all x/y columns (incl. ghosts), interior z rows
    z = xci[2]
    profile = z * (1900.0 - 1600.0) / z.min() + 1600.0
    T = np.zeros((nx + 2, ny + 2, nz + 2))
    T[:, :, 1:-1] = profile[None, None, :]

    thermal_bc = TemperatureBoundaryConditions(
        no_flux=Faces(left=True, right=True, front=True, back=True),
        constant_value=Faces(top=300.0, bot=3500.0),
    )

    # spherical +100 K perturbation at the domain center
    xc, yc, zc = li[0] / 2, li[1] / 2, -li[2] / 2
    r = 10.0e3
    X, Y, Z = np.meshgrid(xci[0], xci[1], xci[2], indexing="ij")
    mask = (X - xc) ** 2 + (Y - yc) ** 2 + (Z - zc) ** 2 <= r**2
    T[1:-1, 1:-1, 1:-1] += 100.0 * mask
    Tj = thermal_bcs(jnp.asarray(T, thermal.T.dtype), thermal_bc)
    thermal = thermal.replace(T=Tj, Told=Tj)
    return geometry, thermal, thermal_bc, (xc, yc, zc, r)


def run(n=32, l=100.0e3, ttot=0.5 * MYR, dt=50 * KYR, dtype=None):
    """Single-phase variant (PT_Density ρ0=3.1e3, α=1.5e-5; Cp=1.2e3, k=3)."""
    ni = (n, n, n)
    geometry, thermal, thermal_bc, _ = _setup_thermal(ni, (l, l, l), dtype)
    material = Material(rho0=3.1e3, alpha=1.5e-5, beta=0.0, T0=0.0,
                        Cp=1.2e3, k=3.0)

    # PT coefficients from constant K and ρCp (reference: ρ0 = 3.3e3 here)
    K = jnp.full(ni, 3.0, dtype)
    rho_Cp = jnp.full(ni, 3.3e3 * 1.2e3, dtype)
    pt_thermal = PTThermalCoeffs.make(
        K, rho_Cp, dt, geometry.di, geometry.li, CFL=0.95 / math.sqrt(3.1)
    )
    P = jnp.zeros(ni, thermal.T.dtype)
    nt = int(math.ceil(ttot / dt))
    info = None
    for _ in range(nt):
        thermal, info = heatdiffusion_PT(
            thermal, pt_thermal, thermal_bc, dt, geometry,
            material=material, P=P,
        )
    return thermal, info


def run_multiphase(n=32, l=100.0e3, ttot=0.5 * MYR, dt=50 * KYR, dtype=None):
    """Particle-carried second phase inside the perturbation sphere."""
    from justrelax_tpu.particles.particles3d import (
        init_particles_3d,
        phase_ratios_from_particles_3d,
    )

    ni = (n, n, n)
    geometry, thermal, thermal_bc, (xc, yc, zc, r) = _setup_thermal(
        ni, (l, l, l), dtype
    )
    material = MaterialStack.make([
        Material(rho0=3.0e3, alpha=1.5e-5, Cp=1.2e3, k=3.0, H_r=1.0e-6),
        Material(rho0=3.3e3, alpha=1.5e-5, Cp=1.2e3, k=3.0, H_r=1.0e-7),
    ])
    # NOTE: the reference 3D multiphase test keeps thermal.H = 1e-6 AND the
    # per-phase radioactive heat — both enter the source
    # (DiffusionPT_kernels.jl:240-242); the 2D twin sets no H.

    particles = init_particles_3d(geometry, nxcell=12, max_xcell=12, min_xcell=1)
    phase = jnp.where(
        (particles.px - xc) ** 2 + (particles.py - yc) ** 2
        + (particles.pz - zc) ** 2 <= r**2,
        1.0, 0.0,
    )
    pr_c, _ = phase_ratios_from_particles_3d(particles, phase, 2, geometry)

    def face_avg(axis):
        pad = [(0, 0)] * 4
        pad[axis] = (1, 1)
        E = jnp.pad(pr_c, pad, mode="edge")
        lo = [slice(None)] * 4
        hi = [slice(None)] * 4
        lo[axis], hi[axis] = slice(None, -1), slice(1, None)
        return 0.5 * (E[tuple(lo)] + E[tuple(hi)])

    pr_faces = tuple(face_avg(a) for a in range(3))
    P = jnp.zeros(ni, thermal.T.dtype)
    nt = int(math.ceil(ttot / dt))
    info = None
    for _ in range(nt):
        pt_thermal = PTThermalCoeffs.from_material(
            material, thermal.T[1:-1, 1:-1, 1:-1], P, dt,
            geometry.di, geometry.li,
            phase_ratios=pr_c, eps=1.0e-5, CFL=0.95 / math.sqrt(3.0),
        )
        thermal, info = heatdiffusion_PT(
            thermal, pt_thermal, thermal_bc, dt, geometry,
            material=material, P=P,
            phase_ratios=pr_c, phase_ratios_faces=pr_faces,
            iter_max=10_000, nout=100,
        )
    return thermal, info
