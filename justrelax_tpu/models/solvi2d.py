"""SolVi 2D: circular viscous inclusion under far-field pure shear
(reference miniapps/benchmarks/stokes2D/solvi; Schmid & Podladchikov 2003).

The analytic interior solution is UNIFORM: strain rate amplified by
2η_m/(η_m + η_i) and deviatoric stress

  τ_in = 2 η_i ε̇_in = 4 η_i η_m / (η_m + η_i) · ε̇_bg,

with zero interior pressure perturbation. With the inclusion small relative
to the box (r_c ≪ L) and pure-shear far-field velocities on the boundary,
the numerical interior must reproduce that uniform state — the classic
quantitative inclusion oracle (also used to study pressure-jump accuracy,
Deubelbeiss & Kaus 2008).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from justrelax_tpu.core.coeffs import PTStokesCoeffs
from justrelax_tpu.core.grid import Geometry
from justrelax_tpu.core.state import StokesState
from justrelax_tpu.ops.bc import VelocityBoundaryConditions, pureshear_bc
from justrelax_tpu.solvers.stokes2d import solve_ve

__all__ = ["run", "interior_amplitude"]


def interior_amplitude(eta_m: float, eta_i: float, eps_bg: float) -> float:
    """Analytic uniform interior deviatoric stress amplitude."""
    return 4.0 * eta_i * eta_m / (eta_m + eta_i) * eps_bg


def run(n=64, d_eta=1.0e-3, rc=0.1, eps_bg=1.0, L=2.0, iter_max=500_000,
        nout=5_000, dtype=None):
    ni = (n, n)
    geometry = Geometry(ni, (L, L), origin=(-L / 2, -L / 2))
    stokes = StokesState.make(ni, dtype=dtype)
    dt_f = stokes.P.dtype

    X, Y = geometry.cell_centers_mesh()
    inside = np.asarray(X) ** 2 + np.asarray(Y) ** 2 <= rc**2
    eta = jnp.asarray(np.where(inside, d_eta, 1.0), dt_f)
    stokes = stokes.replace(viscosity=stokes.viscosity.replace(eta=eta))

    Vx, Vy = pureshear_bc(stokes.V.Vx, stokes.V.Vy, geometry.xvi, eps_bg)
    stokes = stokes.replace(V=stokes.V.replace(Vx=Vx, Vy=Vy))

    pt = PTStokesCoeffs.make(
        geometry.li, geometry.di, CFL=1.0 / math.sqrt(2.1),
        eps_abs=1.0e-9, eps_rel=1.0e-12,
    )
    flow_bc = VelocityBoundaryConditions()  # boundary velocities imposed
    G = jnp.full(ni, jnp.inf, dt_f)
    K = jnp.asarray(jnp.inf, dt_f)
    zeros = jnp.zeros(ni, dt_f)
    stokes, info = solve_ve(
        stokes, pt, geometry, flow_bc, (zeros, zeros), G, K, jnp.inf,
        iter_max=iter_max, nout=nout,
    )
    return geometry, stokes, info, inside
