"""Taylor-Green 3D manufactured Stokes benchmark (reference
miniapps/benchmarks/stokes3D/taylor_green/TaylorGreen.jl; FVCA8 benchmark,
Angeli et al., HAL cea-02434556).

η = 1 on [0,1]³ with body force f = (−36π² cos(2πx) sin(2πy) sin(2πz), 0, 0)
and Dirichlet boundary velocities from the analytic solution

  u = (−2 cos sin sin,  sin cos sin,  sin sin cos)·(2πx, 2πy, 2πz)
  p = −6π sin(2πx) sin(2πy) sin(2πz)

(divergence-free; η·Δu − ∇p = f — derivation in the test). Like Burstedde,
our momentum residual is ∇·τ − ∇P − ρg, so the force enters as ρg = −f, and
``boundary_shear=True`` updates the Dirichlet boundary's shear stresses.
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

TWO_PI = 2.0 * np.pi


def _vx(x, y, z):
    return -2.0 * np.cos(TWO_PI * x) * np.sin(TWO_PI * y) * np.sin(TWO_PI * z)


def _vy(x, y, z):
    return np.sin(TWO_PI * x) * np.cos(TWO_PI * y) * np.sin(TWO_PI * z)


def _vz(x, y, z):
    return np.sin(TWO_PI * x) * np.sin(TWO_PI * y) * np.cos(TWO_PI * z)


def _pressure(x, y, z):
    return -6.0 * np.pi * np.sin(TWO_PI * x) * np.sin(TWO_PI * y) * np.sin(TWO_PI * z)


def _boundary_velocity(geometry, dtype):
    """Analytic velocity on EVERY node (interior values are the initial
    guess AND the fixed boundary data — the solver never writes boundary
    faces)."""
    xc, yc, zc = geometry.xci
    xv, yv, zv = geometry.xvi
    dx, dy, dz = geometry.di
    gx = np.concatenate(([xc[0] - dx], xc, [xc[-1] + dx]))
    gy = np.concatenate(([yc[0] - dy], yc, [yc[-1] + dy]))
    gz = np.concatenate(([zc[0] - dz], zc, [zc[-1] + dz]))

    def mesh(f, xs, ys, zs):
        X, Y, Z = np.meshgrid(xs, ys, zs, indexing="ij")
        return f(X, Y, Z)

    Vx = mesh(_vx, xv, gy, gz)
    Vy = mesh(_vy, gx, yv, gz)
    Vz = mesh(_vz, gx, gy, zv)
    # zero the interior so the solver does the work; keep boundary + ghosts
    Vx[1:-1, 1:-1, 1:-1] = 0.0
    Vy[1:-1, 1:-1, 1:-1] = 0.0
    Vz[1:-1, 1:-1, 1:-1] = 0.0
    return (
        jnp.asarray(Vx, dtype), jnp.asarray(Vy, dtype), jnp.asarray(Vz, dtype)
    )


def run(n=16, iter_max=100_000, nout=1_000, dtype=None, geometry=None):
    """``geometry`` overrides the uniform unit-cube grid — pass a
    ``NonuniformGeometry`` to exercise the vector-spacing 3D kernels against
    the same manufactured solution (the forcing/BCs are sampled on whatever
    coordinates the geometry provides)."""
    if geometry is None:
        ni = (n, n, n)
        geometry = Geometry(ni, (1.0, 1.0, 1.0))
    else:
        ni = geometry.ni
    stokes = StokesState.make(ni, dtype=dtype)
    dt_f = stokes.P.dtype

    X, Y, Z = geometry.cell_centers_mesh()
    fx = (
        -36.0 * np.pi**2
        * np.cos(TWO_PI * np.asarray(X))
        * np.sin(TWO_PI * np.asarray(Y))
        * np.sin(TWO_PI * np.asarray(Z))
    )
    zeros = np.zeros(ni)
    rho_g = tuple(jnp.asarray(-f, dt_f) for f in (fx, zeros, zeros))

    stokes = stokes.replace(
        viscosity=stokes.viscosity.replace(eta=jnp.ones(ni, dt_f))
    )
    Vx, Vy, Vz = _boundary_velocity(geometry, dt_f)
    stokes = stokes.replace(V=stokes.V.replace(Vx=Vx, Vy=Vy, Vz=Vz))

    pt_stokes = PTStokesCoeffs.make(
        geometry.li, geometry.di, CFL=1.0 / math.sqrt(3.0)
    )
    flow_bc = VelocityBoundaryConditions()  # imposed analytic boundary values
    G = jnp.full(ni, jnp.inf, dt_f)
    K = jnp.full(ni, jnp.inf, dt_f)
    stokes, info = solve_ve_3d(
        stokes, pt_stokes, geometry, flow_bc, rho_g, G, K, jnp.inf,
        iter_max=iter_max, nout=nout, mean_free_RP=True, boundary_shear=True,
    )
    return geometry, stokes, info


def analytic_fields(geometry):
    xc, yc, zc = geometry.xci
    xv, yv, zv = geometry.xvi
    Vx = _vx(*np.meshgrid(xv, yc, zc, indexing="ij"))
    Vy = _vy(*np.meshgrid(xc, yv, zc, indexing="ij"))
    Vz = _vz(*np.meshgrid(xc, yc, zv, indexing="ij"))
    P = _pressure(*np.meshgrid(xc, yc, zc, indexing="ij"))
    return Vx, Vy, Vz, P
