"""2D multi-phase thermal diffusion benchmark
(reference test_diffusion2D_multiphase.jl).

Same setup as models/diffusion2d.py but with a second phase inside the 10 km
perturbation circle: PT_Density ρ0 = 3.0e3 / 3.3e3, radiogenic heating 1e-6 /
1e-7 W/m³, phase ratios carried on particles. Golden values
(test_diffusion2D_multiphase.jl:173-175):
  T[17, 17] ≈ 1814.029, T[16, 16] ≈ 1823.548 (atol 0.1).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from justrelax_tpu.core.coeffs import PTThermalCoeffs
from justrelax_tpu.core.grid import Geometry
from justrelax_tpu.core.state import ThermalState
from justrelax_tpu.ops.bc import Faces, TemperatureBoundaryConditions, thermal_bcs
from justrelax_tpu.particles.particles import init_particles, phase_ratios_from_particles
from justrelax_tpu.rheology.materials import Material, MaterialStack
from justrelax_tpu.solvers.thermal import heatdiffusion_PT

KYR = 1.0e3 * 3600 * 24 * 365.25
MYR = 1.0e3 * KYR


def run(nx=32, ny=32, lx=100.0e3, ly=100.0e3, ttot=1 * MYR, dt=50 * KYR, dtype=None):
    ni = (nx, ny)
    geometry = Geometry(ni, (lx, ly), origin=(0.0, -ly))
    xci = geometry.xci

    material = MaterialStack.make(
        [
            Material(rho0=3.0e3, alpha=1.5e-5, Cp=1.2e3, k=3.0, H_r=1.0e-6),
            Material(rho0=3.3e3, alpha=1.5e-5, Cp=1.2e3, k=3.0, H_r=1.0e-7),
        ]
    )

    thermal = ThermalState.make(ni, dtype=dtype)
    z = xci[1]
    profile = z * (1900.0 - 1600.0) / z.min() + 1600.0
    T = np.zeros((nx + 2, ny + 2))
    T[:, 1:-1] = profile[None, :]
    thermal_bc = TemperatureBoundaryConditions(
        no_flux=Faces(left=True, right=True),
        constant_value=Faces(top=300.0, bot=3500.0),
    )
    xc, yc = lx / 2, -ly / 2
    r = 10.0e3
    X, Y = np.meshgrid(xci[0], xci[1], indexing="ij")
    mask = (X - xc) ** 2 + (Y - yc) ** 2 <= r**2
    T[1:-1, 1:-1] += 100.0 * mask
    Tj = thermal_bcs(jnp.asarray(T, thermal.T.dtype), thermal_bc)
    thermal = thermal.replace(T=Tj, Told=Tj)

    # particle-carried phases: phase 1 inside the circle
    particles = init_particles(geometry, nxcell=24, max_xcell=36, min_xcell=12)
    phase = jnp.where(
        (particles.px - xc) ** 2 + (particles.py - yc) ** 2 <= r**2, 1.0, 0.0
    )
    pr_c, _ = phase_ratios_from_particles(particles, phase, 2, geometry)
    # face ratios from center averages (constant conductivity — unused weight)
    prx = 0.5 * (
        jnp.pad(pr_c, ((1, 1), (0, 0), (0, 0)), mode="edge")[:-1]
        + jnp.pad(pr_c, ((1, 1), (0, 0), (0, 0)), mode="edge")[1:]
    )
    pry = 0.5 * (
        jnp.pad(pr_c, ((0, 0), (1, 1), (0, 0)), mode="edge")[:, :-1]
        + jnp.pad(pr_c, ((0, 0), (1, 1), (0, 0)), mode="edge")[:, 1:]
    )

    P = jnp.zeros(ni, thermal.T.dtype)
    nt = int(math.ceil(ttot / dt))
    info = None
    for _ in range(nt):
        pt_thermal = PTThermalCoeffs.from_material(
            material, thermal.T[1:-1, 1:-1], P, dt, geometry.di, geometry.li,
            phase_ratios=pr_c, eps=1.0e-5, CFL=0.95 / math.sqrt(2.0),
        )
        thermal, info = heatdiffusion_PT(
            thermal, pt_thermal, thermal_bc, dt, geometry,
            material=material, P=P,
            phase_ratios=pr_c, phase_ratios_faces=(prx, pry),
            iter_max=10_000, nout=100,
        )
    return thermal, info
