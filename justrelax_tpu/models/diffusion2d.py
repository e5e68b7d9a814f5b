"""2D thermal diffusion benchmark (reference test_diffusion2D.jl).

A 100×100 km domain with a linear geotherm (1600→1900 K across the cell-center
column), Dirichlet top/bottom (300 K / 3500 K), insulating sides, constant
radiogenic heating 1e-6 W/m³ and a +100 K circular thermal perturbation of
radius 10 km at the domain center; 20 implicit steps of 50 kyr solved with the
PT diffusion solver using a T-dependent density (PT_Density: ρ0=3.1e3,
α=1.5e-5) with Cp=1.2e3, k=3.

Golden values (reference test_diffusion2D.jl:133-134):
  T[17, 17] ≈ 1817.9448461176817  (0-based, ghosted 34×34 array)
  T[16, 16] ≈ 1827.4674313638786
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from justrelax_tpu.core.coeffs import PTThermalCoeffs
from justrelax_tpu.core.grid import Geometry
from justrelax_tpu.core.state import ThermalState
from justrelax_tpu.ops.bc import Faces, TemperatureBoundaryConditions, thermal_bcs
from justrelax_tpu.rheology.materials import Material
from justrelax_tpu.solvers.thermal import heatdiffusion_PT

KYR = 1.0e3 * 3600 * 24 * 365.25
MYR = 1.0e3 * KYR


def setup(nx=32, ny=32, lx=100.0e3, ly=100.0e3, dtype=None):
    ni = (nx, ny)
    geometry = Geometry(ni, (lx, ly), origin=(0.0, -ly))
    xci, _ = geometry.xci, geometry.xvi

    material = Material(rho0=3.1e3, alpha=1.5e-5, beta=0.0, T0=0.0, Cp=1.2e3, k=3.0)

    thermal = ThermalState.make(ni, dtype=dtype)
    thermal = thermal.replace(H=jnp.full(ni, 1.0e-6, dtype))

    # linear geotherm on all columns (incl. x-ghosts), interior rows
    z = xci[1]
    profile = z * (1900.0 - 1600.0) / z.min() + 1600.0
    T = np.zeros((nx + 2, ny + 2))
    T[:, 1:-1] = profile[None, :]
    thermal = thermal.replace(T=jnp.asarray(T, dtype))

    thermal_bc = TemperatureBoundaryConditions(
        no_flux=Faces(left=True, right=True),
        constant_value=Faces(top=300.0, bot=3500.0),
    )
    thermal = thermal.replace(T=thermal_bcs(thermal.T, thermal_bc))

    # elliptical (circular) thermal perturbation at the domain center
    xc, yc = lx / 2, -ly / 2
    r = 10.0e3
    X, Y = np.meshgrid(xci[0], xci[1], indexing="ij")
    mask = (X - xc) ** 2 + (Y - yc) ** 2 <= r**2
    T = np.array(thermal.T)
    T[1:-1, 1:-1] += 100.0 * mask
    thermal = thermal.replace(T=jnp.asarray(T, dtype))

    return geometry, material, thermal, thermal_bc


def run(nx=32, ny=32, lx=100.0e3, ly=100.0e3, ttot=1 * MYR, dt=50 * KYR, dtype=None):
    geometry, material, thermal, thermal_bc = setup(nx, ny, lx, ly, dtype)
    ni = geometry.ni

    # PT coefficients from constant K and ρCp (reference uses ρ0=3.3e3 here)
    K = jnp.full(ni, 3.0, dtype)
    rho_Cp = jnp.full(ni, 3.3e3 * 1.2e3, dtype)
    pt_thermal = PTThermalCoeffs.make(
        K, rho_Cp, dt, geometry.di, geometry.li, CFL=0.95 / math.sqrt(2.1)
    )

    P = jnp.zeros(ni, dtype)
    nt = int(math.ceil(ttot / dt))
    info = None
    for _ in range(nt):
        thermal, info = heatdiffusion_PT(
            thermal,
            pt_thermal,
            thermal_bc,
            dt,
            geometry,
            material=material,
            P=P,
        )
    return thermal, info
