"""VEP shear band solved with DYREL (reference test_shearband2D_DYREL.jl).

Same geometry as models/shearband.py with Kb=5, Gi=G0/2, η_vp=1e-2, and
boundary-only pure-shear velocity initialization (interior zeroed).

Golden values (test_shearband2D_DYREL.jl:211-217):
  extrema(τII) ≈ (1.5383533580936255, 1.639) atol 1e-3
  max τxx at last step ≈ 1.6377101324888117 atol 1e-4
  sol = 1.8358, final residual < 1e-6.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from justrelax_tpu.core.grid import Geometry
from justrelax_tpu.core.state import StokesState
from justrelax_tpu.models.shearband import _circle_phase_ratios
from justrelax_tpu.ops.bc import Faces, VelocityBoundaryConditions, flow_bcs
from justrelax_tpu.rheology.plasticity import second_invariant_staggered
from justrelax_tpu.rheology.materials import Material, MaterialStack
from justrelax_tpu.solvers.dyrel import solve_dyrel


def run(n=32, nt=10, eps_bg=1.0, dtype=None):
    ni = (n, n)
    geometry = Geometry(ni, (1.0, 1.0))
    xci, xvi = geometry.xci, geometry.xvi

    tau_y, phi = 1.6, 30.0
    eta0, G0 = 1.0, 1.0
    Gi = G0 / 2.0
    eta_reg = 1.0e-2
    dt = eta0 / G0 / 4.0
    C = tau_y / math.cos(math.radians(phi))
    common = dict(
        rho0=0.0, Kb=5.0, eta0=eta0, is_plastic=1.0, C=C,
        friction_angle=phi, dilation_angle=0.0, eta_reg=eta_reg,
    )
    material = MaterialStack.make([Material(G=G0, **common), Material(G=Gi, **common)])

    radius = 0.1
    pr_c = jnp.asarray(_circle_phase_ratios(xci[0], xci[1], (0.5, 0.5), radius))
    pr_v = jnp.asarray(_circle_phase_ratios(xvi[0], xvi[1], (0.5, 0.5), radius))

    stokes = StokesState.make(ni, dtype=dtype)
    dt_f = stokes.P.dtype
    xv = jnp.asarray(xvi[0], dt_f)
    yv = jnp.asarray(xvi[1], dt_f)
    Vx = jnp.broadcast_to((eps_bg * xv)[:, None], (n + 1, n + 2))
    Vy = jnp.broadcast_to((-eps_bg * yv)[None, :], (n + 2, n + 1))
    # boundary-only initialization (test_shearband2D_DYREL.jl:146-148)
    Vx = Vx.at[1:-1, 1:-1].set(0.0)
    Vy = Vy.at[1:-1, 1:-1].set(0.0)
    flow_bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True)
    )
    Vx, Vy = flow_bcs((Vx, Vy), flow_bc)
    stokes = stokes.replace(V=stokes.V.replace(Vx=Vx, Vy=Vy))

    t = 0.0
    tau_max_hist, sol_hist = [], []
    info = None
    for _ in range(nt):
        stokes, info = solve_dyrel(
            stokes, geometry, flow_bc, material, pr_c, pr_v, dt,
            eps=1.0e-6, nout=50, rel_drop=0.5,
        )
        tau_max_hist.append(float(stokes.tau.xx.max()))
        t += dt
        sol_hist.append(2.0 * eps_bg * eta0 * (1.0 - math.exp(-G0 * t / eta0)))

    def g4(A):
        return (A[:-1, :-1], A[1:, :-1], A[:-1, 1:], A[1:, 1:])

    tau_II = second_invariant_staggered(stokes.tau.xx, stokes.tau.yy, g4(stokes.tau.xy))
    return stokes, info, tau_max_hist, sol_hist, tau_II


def run_dpcap(n=32, nt=10, eps_bg=1.0):
    """Dilatant DP-with-tension-cap shear band under DYREL
    (reference test_shearband2D_DPCap_DYREL.jl:59-206): the APT DPCap
    scenario (ψ = 3°, pT = −0.5, Kb = 4, Gi = G0/2, η_vp = 1e-3, dt = 1/8)
    solved with dynamic relaxation; full-field pure-shear velocity init.
    Envelope (:197-205): converged < 1e-5, τII_max < 2, ε_pl_max > 0,
    EVol_max > 0, ε_vol_pl ≥ 0 (dilation)."""
    ni = (n, n)
    geometry = Geometry(ni, (1.0, 1.0))
    xci, xvi = geometry.xci, geometry.xvi

    tau_y, phi, psi = 1.6, 30.0, 3.0
    eta0, G0 = 1.0, 1.0
    Gi = G0 / 2.0
    eta_reg = 1.0e-3
    dt = eta0 / G0 / 8.0
    C = tau_y / math.cos(math.radians(phi))
    common = dict(
        rho0=0.0, Kb=4.0, eta0=eta0, is_plastic=1.0, C=C,
        friction_angle=phi, dilation_angle=psi, eta_reg=eta_reg,
        tension_pT=-0.5,
    )
    material = MaterialStack.make([Material(G=G0, **common), Material(G=Gi, **common)])

    radius = 0.1
    pr_c = jnp.asarray(_circle_phase_ratios(xci[0], xci[1], (0.5, 0.5), radius))
    pr_v = jnp.asarray(_circle_phase_ratios(xvi[0], xvi[1], (0.5, 0.5), radius))

    stokes = StokesState.make(ni)
    dt_f = stokes.P.dtype
    xv = jnp.asarray(xvi[0], dt_f)
    yv = jnp.asarray(xvi[1], dt_f)
    Vx = jnp.broadcast_to((eps_bg * xv)[:, None], (n + 1, n + 2))
    Vy = jnp.broadcast_to((-eps_bg * yv)[None, :], (n + 2, n + 1))
    flow_bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True)
    )
    Vx, Vy = flow_bcs((Vx, Vy), flow_bc)
    stokes = stokes.replace(V=stokes.V.replace(Vx=Vx, Vy=Vy))

    info = None
    for _ in range(nt):
        stokes, info = solve_dyrel(
            stokes, geometry, flow_bc, material, pr_c, pr_v, dt,
            eps=1.0e-6, nout=50, rel_drop=0.5,
        )

    def g4(A):
        return (A[:-1, :-1], A[1:, :-1], A[:-1, 1:], A[1:, 1:])

    tau_II = second_invariant_staggered(stokes.tau.xx, stokes.tau.yy, g4(stokes.tau.xy))
    return stokes, info, tau_II
