"""SolVi 3D: spherical viscous inclusion under far-field pure shear.

Reference miniapp miniapps/benchmarks/stokes3D/solvi/SolVi3D.jl (Schmid &
Podladchikov 2003 benchmark family): Δη = 1e-3 inclusion of radius rc in a
10³ box, smoothed viscosity (10 Jacobi passes, SolVi3D.jl:10-44), visco-
elastic solve with G = 1, dt = ∞, Kb = ∞; the reference test
(test/test_stokes_solvi3D.jl:55) checks norm_Rx < 1e-8 at 16³ within 5000
iterations.

The background field here is the incompressible plane-strain pure shear
Vx = ε̇·x, Vy = 0, Vz = −ε̇·z. (The reference's 3D ``pureshear_bc!``
imposes (ε̇x, ε̇y, −ε̇z) — divergent, pure_shear.jl:11-33 — which its test
never notices because it only checks the x-momentum residual.)
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from justrelax_tpu.core.coeffs import PTStokesCoeffs
from justrelax_tpu.core.grid import Geometry
from justrelax_tpu.core.state import StokesState
from justrelax_tpu.ops.bc import Faces, VelocityBoundaryConditions, flow_bcs

__all__ = ["run", "smooth_viscosity_3d", "pureshear_bc_3d"]


def smooth_viscosity_3d(eta, n_pass: int = 10, fact: float = 1.0):
    """Interior Jacobi smoothing: η ← η + (1/6.1/fact)·Σ ∂²η along each axis
    (reference smooth!, SolVi3D.jl:10-13)."""
    c = 1.0 / 6.1 / fact
    for _ in range(n_pass):
        lap = (
            eta[:-2, 1:-1, 1:-1] - 2 * eta[1:-1, 1:-1, 1:-1] + eta[2:, 1:-1, 1:-1]
            + eta[1:-1, :-2, 1:-1] - 2 * eta[1:-1, 1:-1, 1:-1] + eta[1:-1, 2:, 1:-1]
            + eta[1:-1, 1:-1, :-2] - 2 * eta[1:-1, 1:-1, 1:-1] + eta[1:-1, 1:-1, 2:]
        )
        eta = eta.at[1:-1, 1:-1, 1:-1].add(c * lap)
    return eta


def pureshear_bc_3d(Vx, Vy, Vz, xvi, eps_bg):
    """Incompressible plane-strain pure shear: Vx = ε̇·xv on all Vx nodes,
    Vz = −ε̇·zv on all Vz nodes, Vy = 0 (see module docstring re: the
    reference's divergent variant)."""
    xv = jnp.asarray(xvi[0], Vx.dtype)
    zv = jnp.asarray(xvi[2], Vz.dtype)
    Vx = jnp.broadcast_to(
        (eps_bg * xv)[:, None, None], Vx.shape
    ).astype(Vx.dtype)
    Vz = jnp.broadcast_to(
        (-eps_bg * zv)[None, None, :], Vz.shape
    ).astype(Vz.dtype)
    return Vx, jnp.zeros_like(Vy), Vz


def run(
    nx=16, ny=16, nz=16, d_eta=1.0e-3, rc=1.0, eps_bg=1.0,
    lx=10.0, ly=10.0, lz=10.0, iter_max=5_000, nout=100, dtype=None,
):
    from justrelax_tpu.solvers.stokes3d import solve_ve_3d

    ni = (nx, ny, nz)
    li = (lx, ly, lz)
    geometry = Geometry(ni, li)
    stokes = StokesState.make(ni, dtype=dtype)
    dt_f = stokes.P.dtype

    # spherical inclusion at the box center, then 10 smoothing passes
    X = geometry.cell_centers_mesh()
    rr = np.sqrt(
        (np.asarray(X[0]) - lx / 2) ** 2
        + (np.asarray(X[1]) - ly / 2) ** 2
        + (np.asarray(X[2]) - lz / 2) ** 2
    )
    eta = jnp.asarray(np.where(rr <= rc, d_eta, 1.0), dt_f)
    eta = smooth_viscosity_3d(eta)
    stokes = stokes.replace(viscosity=stokes.viscosity.replace(eta=eta))

    Vx, Vy, Vz = pureshear_bc_3d(
        stokes.V.Vx, stokes.V.Vy, stokes.V.Vz, geometry.xvi, eps_bg
    )
    flow_bc = VelocityBoundaryConditions(
        free_slip=Faces(
            left=True, right=True, top=True, bot=True, front=True, back=True
        )
    )
    Vx, Vy, Vz = flow_bcs((Vx, Vy, Vz), flow_bc)
    stokes = stokes.replace(V=stokes.V.replace(Vx=Vx, Vy=Vy, Vz=Vz))

    pt_stokes = PTStokesCoeffs.make(
        li, geometry.di, CFL=1.0 / math.sqrt(3.0), eps_rel=1.0e-12, eps_abs=1.0e-9
    )
    zeros = jnp.zeros(ni, dt_f)
    G = jnp.full(ni, 1.0, dt_f)
    K = jnp.asarray(jnp.inf, dt_f)
    stokes, info = solve_ve_3d(
        stokes, pt_stokes, geometry, flow_bc, (zeros, zeros, zeros),
        G, K, jnp.inf, iter_max=iter_max, nout=nout,
    )
    return geometry, stokes, info
