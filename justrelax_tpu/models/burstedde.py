"""Burstedde 3D Stokes benchmark with analytic solution
(reference miniapps/benchmarks/stokes3D/burstedde/Burstedde.jl; Burstedde et
al. 2013, GJI).

Unit cube, smoothly varying viscosity η = exp(1 − β Σ xᵢ(1−xᵢ)) with β=10,
polynomial manufactured body force, and the analytic velocity imposed on all
velocity-array boundary faces/rows. Oracle (test_stokes_burstedde.jl:26-36):
final absolute residual < 1e-8 at 16³.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from justrelax_tpu.core.coeffs import PTStokesCoeffs
from justrelax_tpu.core.grid import Geometry
from justrelax_tpu.core.state import StokesState
from justrelax_tpu.ops.bc import VelocityBoundaryConditions
from justrelax_tpu.solvers.stokes3d import solve_ve_3d

BETA = 10.0


def _viscosity(xc, yc, zc, beta):
    X, Y, Z = np.meshgrid(xc, yc, zc, indexing="ij")
    return np.exp(1.0 - beta * (X * (1 - X) + Y * (1 - Y) + Z * (1 - Z))), (X, Y, Z)


def _body_forces(X, Y, Z, eta, beta):
    detadx = -beta * (1 - 2 * X) * eta
    detady = -beta * (1 - 2 * Y) * eta
    detadz = -beta * (1 - 2 * Z) * eta
    fx = (
        (Y * Z + 3 * X**2 * Y**3 * Z)
        - eta * (2 + 6 * X * Y)
        - detadx * (2 + 4 * X + 2 * Y + 6 * X**2 * Y)
        - detady * (X + X**3 + Y + 2 * X * Y**2)
        - detadz * (-3 * Z - 10 * X * Y * Z)
    )
    fy = (
        (X * Z + 3 * X**3 * Y**2 * Z)
        - eta * (2 + 2 * X**2 + 2 * Y**2)
        - detadx * (X + X**3 + Y + 2 * X * Y**2)
        - detady * (2 + 2 * X + 4 * Y + 4 * X**2 * Y)
        - detadz * (-3 * Z - 5 * X**2 * Z)
    )
    fz = (
        (X * Y + X**3 * Y**3)
        - eta * (-10 * Y * Z)
        - detadx * (-3 * Z - 10 * X * Y * Z)
        - detady * (-3 * Z - 5 * X**2 * Z)
        - detadz * (-4 - 6 * X - 6 * Y - 10 * X**2 * Y)
    )
    return fx, fy, fz


def _vx(x, y):
    return x + x**2 + x * y + x**3 * y


def _vy(x, y):
    return y + x * y + y**2 + x**2 * y**2


def _vz(x, y, z):
    return -2 * z - 3 * x * z - 3 * y * z - 5 * x**2 * y * z


def _boundary_velocity(geometry, dtype):
    """Analytic velocity on the outermost layers of each velocity array,
    zero inside (reference velocity!, Burstedde.jl:95-148)."""
    (nx, ny, nz) = geometry.ni
    xv, yv, zv = geometry.xvi
    # ghosted center coordinates
    gx, gy, gz = (
        np.concatenate(([c[0] - d], c, [c[-1] + d]))
        for c, d in zip(geometry.xci, geometry.di)
    )

    def fill(shape, coords, fn):
        A = np.zeros(shape)
        X, Y, Z = np.meshgrid(*coords, indexing="ij")
        vals = fn(X, Y, Z)
        m = np.zeros(shape, dtype=bool)
        for ax in range(3):
            sl = [slice(None)] * 3
            sl[ax] = 0
            m[tuple(sl)] = True
            sl[ax] = shape[ax] - 1
            m[tuple(sl)] = True
        A[m] = vals[m]
        return A

    Vx = fill((nx + 1, ny + 2, nz + 2), (xv, gy, gz), lambda X, Y, Z: _vx(X, Y))
    Vy = fill((nx + 2, ny + 1, nz + 2), (gx, yv, gz), lambda X, Y, Z: _vy(X, Y))
    Vz = fill((nx + 2, ny + 2, nz + 1), (gx, gy, zv), lambda X, Y, Z: _vz(X, Y, Z))
    return jnp.asarray(Vx, dtype), jnp.asarray(Vy, dtype), jnp.asarray(Vz, dtype)


def run(nx=16, ny=16, nz=16, iter_max=100_000, nout=1_000, dtype=None):
    ni = (nx, ny, nz)
    geometry = Geometry(ni, (1.0, 1.0, 1.0))
    stokes = StokesState.make(ni, dtype=dtype)
    dt_f = stokes.P.dtype

    eta_np, (X, Y, Z) = _viscosity(*geometry.xci, BETA)
    fx, fy, fz = _body_forces(X, Y, Z, eta_np, BETA)
    stokes = stokes.replace(
        viscosity=stokes.viscosity.replace(eta=jnp.asarray(eta_np, dt_f))
    )
    # ρg enters the momentum residual as −ρg; the analytic Burstedde solution
    # satisfies ∇·τ − ∇P = −f, so pass −f (the reference miniapp passes +f,
    # which mirrors the problem — its test is excluded from CI,
    # runtests.jl:60-62)
    rho_g = tuple(jnp.asarray(-f, dt_f) for f in (fx, fy, fz))

    Vx, Vy, Vz = _boundary_velocity(geometry, dt_f)
    stokes = stokes.replace(V=stokes.V.replace(Vx=Vx, Vy=Vy, Vz=Vz))

    pt_stokes = PTStokesCoeffs.make(geometry.li, geometry.di, CFL=1.0 / math.sqrt(3.0))
    flow_bc = VelocityBoundaryConditions()  # all faces: imposed analytic values
    G = jnp.full(ni, jnp.inf, dt_f)
    K = jnp.full(ni, jnp.inf, dt_f)

    stokes, info = solve_ve_3d(
        stokes, pt_stokes, geometry, flow_bc, rho_g, G, K, jnp.inf,
        iter_max=iter_max, nout=nout, mean_free_RP=True, boundary_shear=True,
    )
    return geometry, stokes, info


def analytic_velocity(geometry):
    """Analytic interior solution for error norms."""
    xv, yv, zv = geometry.xvi
    xc, yc, zc = geometry.xci
    Vx = _vx(*np.meshgrid(xv, yc, indexing="ij"))
    Vy = _vy(*np.meshgrid(xc, yv, indexing="ij"))
    return Vx, Vy
