"""Elastic stress build-up benchmark
(reference miniapps/benchmarks/stokes2D/elastic_buildup/Elastic_BuildUp.jl).

Pure-shear box with Maxwell visco-elastic rheology and no gravity: the
deviatoric stress grows as the analytic Maxwell curve
τ(t) = 2 ε̇ η (1 − exp(−G t/η)). Oracle (test_stokes_elastic_buildup.jl:25-54):
mean relative error of max|τyy| vs the analytic curve ≤ 5e-3 at 32²,
η=1e21, G=1e10, ε̇=1e-14, 10 kyr in 0.05 kyr steps.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from justrelax_tpu.core.coeffs import PTStokesCoeffs
from justrelax_tpu.core.grid import Geometry
from justrelax_tpu.core.state import StokesState
from justrelax_tpu.ops.bc import Faces, VelocityBoundaryConditions, flow_bcs, pureshear_bc
from justrelax_tpu.solvers.stokes2d import solve_ve

YR = 365.25 * 3600 * 24
KYR = 1.0e3 * YR


def analytic_solution(eps_bg, t, G, eta):
    return 2.0 * eps_bg * eta * (1.0 - math.exp(-G * t / eta))


def run(
    nx=32,
    ny=32,
    lx=100.0e3,
    ly=100.0e3,
    endtime_kyr=10.0,
    eta0=1.0e21,
    eps_bg=1.0e-14,
    G=10.0e9,
    iter_max=150_000,
    nout=1000,
    dtype=None,
):
    ni = (nx, ny)
    geometry = Geometry(ni, (lx, ly))
    stokes = StokesState.make(ni, dtype=dtype)
    pt_stokes = PTStokesCoeffs.make(
        geometry.li, geometry.di, CFL=1.0 / math.sqrt(2.1), eps_abs=1.0e-6, eps_rel=1.0e-6
    )
    dt_f = stokes.P.dtype
    eta = jnp.full(ni, eta0, dt_f)
    stokes = stokes.replace(viscosity=stokes.viscosity.replace(eta=eta))
    Gc = jnp.full(ni, G, dt_f)
    Kb = jnp.full(ni, jnp.inf, dt_f)
    rho_g = (jnp.zeros(ni, dt_f), jnp.zeros(ni, dt_f))

    flow_bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True)
    )
    Vx, Vy = pureshear_bc(stokes.V.Vx, stokes.V.Vy, geometry.xvi, eps_bg)
    Vx, Vy = flow_bcs((Vx, Vy), flow_bc)
    stokes = stokes.replace(V=stokes.V.replace(Vx=Vx, Vy=Vy))

    t = 0.0
    av_tyy, sol_tyy, tt = [], [], []
    ttot = endtime_kyr * KYR
    info = None
    while t < ttot:
        dt = 0.05 * KYR if t < 10 * KYR else 1.0 * KYR
        stokes, info = solve_ve(
            stokes,
            pt_stokes,
            geometry,
            flow_bc,
            rho_g,
            Gc,
            Kb,
            dt,
            iter_max=iter_max,
            nout=nout,
        )
        t += dt
        av_tyy.append(float(jnp.abs(stokes.tau.yy).max()))
        sol_tyy.append(analytic_solution(eps_bg, t, G, eta0))
        tt.append(t / KYR)
    return stokes, av_tyy, sol_tyy, tt, info
