"""DYREL self-tuning dynamic-relaxation Stokes solver, 2D
(Duretz et al. 2025; reference /root/reference/src/DYREL/).

Outer Powell–Hestenes pressure iterations around inner damped
dynamic-relaxation velocity solves, with on-the-fly tuning:

- penalty γ_eff from local viscosity and bulk modulus
  (constructors.jl:231-258): γ_num = γfact·η, γ_phy = Kb·dt,
  γ_eff = harmonic(γ_num, γ_phy);
- Gershgorin bounds of the velocity Schur-complement operator give the
  diagonal preconditioner D and λmax per velocity node (Gershgorin.jl:21-155);
- a Rayleigh quotient of the damped increments estimates λmin
  (solver.jl:358-364), setting the damping c = 2√λmin·c_fact and the optimal
  pseudo-step dτ = 2/√λmax·CFL with α = (2−c·dτ)/(2+c·dτ),
  β = 2dτ/(2+c·dτ) (Gershgorin.jl:216-230);
- the fused stress kernel evaluates visco-elasto-plastic stress at centers
  AND vertices (vertex normal stresses are stored, unlike the APT path) and
  assembles the small pressure correction θc = γ_eff·RP + ΔPψ
  (stress_kernels.jl:25-341);
- after each inner solve, P += γ_eff·RP (Powell–Hestenes update).

The whole nested iteration runs on device: outer/inner `lax.while_loop`s with
`nout`-chunked tuning updates.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from justrelax_tpu.core.state import StokesState
from justrelax_tpu.ops.bc import VelocityBoundaryConditions, flow_bcs
from justrelax_tpu.ops.stencil import av_a, expand_edges, interior_add
from justrelax_tpu.rheology.materials import (
    _as_stack,
    get_bulk_modulus,
    get_shear_modulus,
)
from justrelax_tpu.rheology.plasticity import second_invariant
from justrelax_tpu.solvers.stokes2d import StokesSolveInfo, _norm

Array = Any

__all__ = ["solve_dyrel"]


def _clamped_av(A):
    return av_a(expand_edges(A))


# --- penalty / preconditioner ----------------------------------------------
def compute_bulk_viscosity_and_penalty(material, pr_center, eta, gfact, dt):
    Kbdt = get_bulk_modulus(material, pr_center) * dt
    eta_mean = jnp.mean(jnp.where(jnp.isinf(eta), 0.0, eta)) / jnp.mean(
        jnp.where(jnp.isinf(eta), 0.0, 1.0)
    )
    eta_local = jnp.where(jnp.isinf(eta), eta_mean, eta)
    gamma_num = gfact * eta_local
    gamma_phy = jnp.where(jnp.isinf(Kbdt), gamma_num, Kbdt)
    gamma_eff = gamma_phy * gamma_num / (gamma_phy + gamma_num)
    return Kbdt, gamma_eff


def gershgorin_schur_2d(eta, eta_v, gamma_eff, pr_center, pr_vertex, material,
                        di, dt, spacings=None):
    """Diagonal preconditioners (Dx, Dy) and Gershgorin λmax estimates for
    the velocity Schur complement (Gershgorin.jl:21-155).

    ``spacings = (dcx, dcy, dvx, dvy)`` activates the nonuniform-grid bound
    with the reference's per-face spacing families (Gershgorin.jl:45-46
    dx=di_center[i], dy=di_vertex[j] at x faces; :106-107 mirrored at y
    faces)."""
    nx, ny = eta.shape
    if spacings is None:
        _dx_x = _dx_y = 1.0 / di[0]
        _dy_x = _dy_y = 1.0 / di[1]
    else:
        # Per-face MAX inverse spacing over both families touching the row:
        # the momentum rows mix center and vertex spacings (∂x at a face is
        # 1/dvx_f times a stress built with 1/dcx of either neighbor cell),
        # so a valid Gershgorin upper bound must majorize every product;
        # the max-family form is exact on uniform grids and conservative
        # (smaller dτ) where spacings vary.
        dcx, dcy, dvx, dvy = spacings
        inv_dcx, inv_dvx = 1.0 / dcx, 1.0 / dvx
        inv_dcy, inv_dvy = 1.0 / dcy, 1.0 / dvy
        _dx_x = jnp.maximum(
            inv_dvx[1:-1], jnp.maximum(inv_dcx[:-1], inv_dcx[1:])
        )  # (nx-1, 1) interior x faces
        _dy_x = jnp.maximum(
            inv_dcy, jnp.maximum(inv_dvy[:, :-1], inv_dvy[:, 1:])
        )  # (1, ny)
        _dy_y = jnp.maximum(
            inv_dvy[:, 1:-1], jnp.maximum(inv_dcy[:, :-1], inv_dcy[:, 1:])
        )  # (1, ny-1) interior y faces
        _dx_y = jnp.maximum(
            inv_dcx, jnp.maximum(inv_dvx[:-1], inv_dvx[1:])
        )  # (nx, 1)
    c43, c23 = 4.0 / 3.0, 2.0 / 3.0

    G_c = get_shear_modulus(material, pr_center)
    G_v = get_shear_modulus(material, pr_vertex)
    eta_ve_c = 1.0 / (1.0 / eta + 1.0 / (G_c * dt))
    eta_ve_v = 1.0 / (1.0 / eta_v + 1.0 / (G_v * dt))

    # --- Dx on interior x faces: (nx-1, ny) --------------------------------
    eN = eta_ve_v[1:-1, 1:]  # ηv[i+1, j+1]
    eS = eta_ve_v[1:-1, :-1]  # ηv[i+1, j]
    eW = eta_ve_c[:-1, :]  # η[i, j]
    eE = eta_ve_c[1:, :]  # η[i+1, j]
    gW = gamma_eff[:-1, :]
    gE = gamma_eff[1:, :]
    Dx = (eN + eS) * _dy_x * _dy_x + (gE + gW + c43 * (eE + eW)) * _dx_x * _dx_x
    Cxx = (
        jnp.abs(eN * _dy_x * _dy_x)
        + jnp.abs(eS * _dy_x * _dy_x)
        + jnp.abs((gE + c43 * eE) * _dx_x * _dx_x)
        + jnp.abs((gW + c43 * eW) * _dx_x * _dx_x)
        + jnp.abs(Dx)
    )
    Cxy = (
        jnp.abs((gE - c23 * eE + eN) * _dx_x * _dy_x)
        + jnp.abs((gE - c23 * eE + eS) * _dx_x * _dy_x)
        + jnp.abs((gW + eN - c23 * eW) * _dx_x * _dy_x)
        + jnp.abs((gW + eS - c23 * eW) * _dx_x * _dy_x)
    )
    lmax_x = (Cxx + Cxy) / Dx

    # --- Dy on interior y faces: (nx, ny-1) --------------------------------
    eE2 = eta_ve_v[1:, 1:-1]  # ηv[i+1, j+1]
    eW2 = eta_ve_v[:-1, 1:-1]  # ηv[i, j+1]
    eS2 = eta_ve_c[:, :-1]  # η[i, j]
    eN2 = eta_ve_c[:, 1:]  # η[i, j+1]
    gS = gamma_eff[:, :-1]
    gN = gamma_eff[:, 1:]
    Dy = (gN + gS + c43 * (eN2 + eS2)) * _dy_y * _dy_y + (eE2 + eW2) * _dx_y * _dx_y
    Cyy = (
        jnp.abs(eE2 * _dx_y * _dx_y)
        + jnp.abs(eW2 * _dx_y * _dx_y)
        + jnp.abs((gN + c43 * eN2) * _dy_y * _dy_y)
        + jnp.abs((gS + c43 * eS2) * _dy_y * _dy_y)
        + jnp.abs(Dy)
    )
    Cyx = (
        jnp.abs((gN + eE2 - c23 * eN2) * _dx_y * _dy_y)
        + jnp.abs((gN - c23 * eN2 + eW2) * _dx_y * _dy_y)
        + jnp.abs((gS + eE2 - c23 * eS2) * _dx_y * _dy_y)
        + jnp.abs((gS - c23 * eS2 + eW2) * _dx_y * _dy_y)
    )
    lmax_y = (Cyx + Cyy) / Dy
    return Dx, Dy, lmax_x, lmax_y


def _alpha_beta(lmax, cV, CFL):
    dtau = 2.0 / jnp.sqrt(lmax) * CFL
    beta = 2.0 * dtau / (2.0 + cV * dtau)
    alpha = (2.0 - cV * dtau) / (2.0 + cV * dtau)
    return dtau, alpha, beta


# --- local VEP stress (per phase, ratio-weighted) ---------------------------
def _local_stress(eps_ij, tau_o_ij, eta, P, lam, lam_relax, material, pr, dt, EII):
    """Vectorized compute_local_stress (stress_kernels.jl:224-341): phase loop
    with ratio weights; each phase uses its own G, Kb and plasticity."""
    m = _as_stack(material).params
    nphase = m.G.shape[0]
    deg = jnp.pi / 180.0
    outs = None
    exx, eyy, exy = eps_ij
    oxx, oyy, oxy = tau_o_ij
    for p in range(nphase):
        r = pr[..., p]
        G = jnp.where((m.G[p] == 0) | jnp.isnan(m.G[p]), jnp.inf, m.G[p])
        Kb = jnp.where((m.Kb[p] == 0) | jnp.isnan(m.Kb[p]), jnp.inf, m.Kb[p])
        is_pl = m.is_plastic[p] > 0
        eta_reg = m.eta_reg[p]
        C = m.C[p]
        sphi = jnp.sin(m.friction_angle[p] * deg)
        cphi = jnp.cos(m.friction_angle[p] * deg)
        spsi = jnp.sin(m.dilation_angle[p] * deg)

        eta_ve = 1.0 / (1.0 / eta + 1.0 / (G * dt))
        inv2Gdt = jnp.where(jnp.isinf(G), 0.0, 1.0 / (2.0 * G * dt))
        exx_e = exx + oxx * inv2Gdt
        eyy_e = eyy + oyy * inv2Gdt
        exy_e = exy + oxy * inv2Gdt
        eII = second_invariant(exx_e, eyy_e, exy_e)
        live = eII != 0.0

        txx = 2.0 * eta_ve * exx_e
        tyy = 2.0 * eta_ve * eyy_e
        txy = 2.0 * eta_ve * exy_e
        tII = second_invariant(txx, tyy, txy)
        # DP cone, optionally closed by the elliptic tension cap at P = pT
        # (GeoParams DruckerPragerCap; see plasticity._tension_cap_yield)
        tau_cone = C * cphi + P * sphi
        pT = jnp.where(m.tension_pT[p] == 0.0, -jnp.inf, m.tension_pT[p])
        ratio = jnp.clip(P / pT, 0.0, 1.0)
        root = jnp.sqrt(jnp.maximum(1.0 - ratio**2, 1e-12))
        tau_cap = jnp.where(P < 0.0, C * cphi * root, jnp.inf)
        on_cap = tau_cap < tau_cone
        F = tII - jnp.minimum(tau_cone, tau_cap)
        dFdP_cap = C * cphi * P / jnp.where(jnp.isinf(pT), jnp.inf, pT**2) / root
        dQdP = jnp.where(on_cap, dFdP_cap, -spsi)
        dFdP = jnp.where(on_cap, dFdP_cap, -sphi)
        vol = jnp.where(jnp.isinf(Kb), 0.0, Kb * dt * dFdP * dQdP)
        yielding = is_pl & (F >= 0.0) & live
        lam_new = lam_relax * (F / (eta_ve + eta_reg + vol)) + (1.0 - lam_relax) * lam
        lam_p = jnp.where(yielding, lam_new, 0.0)
        corrected = lam_p > 0.0
        tII_safe = jnp.where(tII == 0, 1.0, tII)
        dQdt = 0.5 / tII_safe
        epl_xx = jnp.where(corrected, lam_p * dQdt * txx, 0.0)
        epl_yy = jnp.where(corrected, lam_p * dQdt * tyy, 0.0)
        epl_xy = jnp.where(corrected, lam_p * dQdt * txy, 0.0)
        txx = txx - 2.0 * eta_ve * epl_xx
        tyy = tyy - 2.0 * eta_ve * epl_yy
        txy = txy - 2.0 * eta_ve * epl_xy
        tII = second_invariant(txx, tyy, txy)
        dPpsi = jnp.where(
            corrected & ~jnp.isinf(Kb), -lam_p * dQdP * Kb * dt, 0.0
        )
        eps_vol = jnp.where(yielding, -lam_p * dQdP, 0.0)
        eII_raw = second_invariant(exx, eyy, exy)
        eta_vep = tII * 0.5 / jnp.where(eII_raw == 0, 1.0, eII_raw)

        vals = (txx, tyy, txy, epl_xx, epl_yy, epl_xy, tII, lam_p, dPpsi, eta_vep, eps_vol)
        vals = tuple(jnp.where(live, v, z) for v, z in zip(
            vals, (0.0,) * 9 + (eta, 0.0)
        ))
        contrib = tuple(r * v for v in vals)
        outs = contrib if outs is None else tuple(a + b for a, b in zip(outs, contrib))
    return outs


class _DyrelFields(NamedTuple):
    gamma_eff: Array
    etab: Array
    Dx: Array
    Dy: Array
    lmax_x: Array
    lmax_y: Array


@partial(
    jax.jit,
    static_argnames=(
        "geometry", "flow_bc", "iter_max", "total_iter_max", "nout",
        "max_ph", "gfact", "CFL", "c_fact", "eps", "lambda_relax",
        "linear_viscosity", "viscosity_relaxation", "viscosity_cutoff",
    ),
)
def solve_dyrel(
    stokes: StokesState,
    geometry,
    flow_bc: VelocityBoundaryConditions,
    material,
    pr_center: Array,
    pr_vertex: Array,
    dt,
    rho_g: Optional[Tuple[Array, Array]] = None,
    gfact: float = 20.0,
    CFL: float = 0.99,
    c_fact: float = 0.5,
    eps: float = 1.0e-6,
    iter_max: int = 50_000,
    total_iter_max: int = 50_000,
    nout: int = 100,
    rel_drop: float = 1.0e-2,
    lambda_relax: float = 1.0,
    max_ph: int = 1000,
    linear_viscosity: bool = True,
    viscosity_relaxation: float = 1.0e-2,
    viscosity_cutoff: Tuple[float, float] = (-jnp.inf, jnp.inf),
    T: Optional[Array] = None,
    alpha_dT: Optional[Array] = None,
) -> Tuple[StokesState, StokesSolveInfo]:
    """DYREL solve (reference ``solve_DYREL!``, solver.jl:44-293).

    With ``linear_viscosity=False`` the creep viscosities η/ηv are refreshed
    from the freshly-computed stress every iteration (reference fused
    compute_stress_viscosity_DRYEL!, stress_kernels.jl:95-135) and the
    Gershgorin bounds / damping matrices are re-evaluated at every residual
    check (solver.jl:254).

    ``alpha_dT = α·ΔT`` (cell-centered) adds the Kiss et al. (2023)
    thermal-stress pressure source α·ΔT/dt to the pressure residual
    (reference _compute_RP!, DYREL/pressure_kernels.jl:113 — the args.ΔT
    path the thermal-stress magma-chamber miniapp drives).
    """
    nx, ny = stokes.P.shape
    dtype = stokes.P.dtype
    di = geometry.di
    if hasattr(geometry, "di_center"):  # nonuniform vector-spacing grid
        # same spacing families as the APT solvers (reference DYREL kernels
        # take _di.center/_di.vertex throughout, velocity_kernels.jl:33-58)
        dcx = jnp.asarray(geometry.di_center[0])[:, None]
        dcy = jnp.asarray(geometry.di_center[1])[None, :]
        dvx = jnp.asarray(geometry.di_vertex[0])[:, None]
        dvy = jnp.asarray(geometry.di_vertex[1])[None, :]
        inv_dx, inv_dy = 1.0 / dcx, 1.0 / dcy
        inv_dx_v, inv_dy_v = 1.0 / dvx, 1.0 / dvy
        mom_dx_x, mom_dy_x = 1.0 / dvx[1:-1], 1.0 / dcy   # x residual families
        mom_dy_y, mom_dx_y = 1.0 / dvy[:, 1:-1], 1.0 / dcx
        gersh_spacings = (dcx, dcy, dvx, dvy)
    else:
        inv_dx, inv_dy = 1.0 / di[0], 1.0 / di[1]
        inv_dx_v, inv_dy_v = inv_dx, inv_dy
        mom_dx_x, mom_dy_x = inv_dx, inv_dy
        mom_dy_y, mom_dx_y = inv_dy, inv_dx
        gersh_spacings = None
    v_dofs = ((nx - 2) * (ny - 1), (nx - 1) * (ny - 2))
    p_dof = nx * ny

    eta, eta_v = stokes.viscosity.eta, stokes.viscosity.eta_v
    P0 = stokes.P
    Q = stokes.Q
    to_c = (stokes.tau_o.xx, stokes.tau_o.yy, stokes.tau_o.xy_c)
    to_v = (stokes.tau_o.xx_v, stokes.tau_o.yy_v, stokes.tau_o.xy)
    EII = stokes.EII_pl
    if rho_g is None:
        rho_gx = jnp.zeros((nx, ny), dtype)
        rho_gy = jnp.zeros((nx, ny), dtype)
    else:
        rho_gx, rho_gy = rho_g

    etab, gamma_eff = compute_bulk_viscosity_and_penalty(
        material, pr_center, eta, gfact, dt
    )
    Dx, Dy, lmax_x, lmax_y = gershgorin_schur_2d(
        eta, eta_v, gamma_eff, pr_center, pr_vertex, material, di, dt,
        spacings=gersh_spacings,
    )

    EII_v = _clamped_av(EII)

    # thermal-stress pressure source α·ΔT/dt (pressure_kernels.jl:113)
    rp_src = Q / dt if alpha_dT is None else (Q + alpha_dT) / dt

    def strain_RP(Vx, Vy, P):
        exx = (Vx[1:, 1:-1] - Vx[:-1, 1:-1]) * inv_dx
        eyy = (Vy[1:-1, 1:] - Vy[1:-1, :-1]) * inv_dy
        div = exx + eyy
        third = div / 3.0
        exx, eyy = exx - third, eyy - third
        exy = 0.5 * (
            (Vx[:, 1:] - Vx[:, :-1]) * inv_dy_v
            + (Vy[1:, :] - Vy[:-1, :]) * inv_dx_v
        )
        RP = -div - (P - P0) / etab + rp_src
        return exx, eyy, exy, RP

    def stress_pass(exx, eyy, exy, P, lam, lam_v, eta_c_, eta_v_):
        # vertex pass (writes vertex stresses + λv + ε_pl.xy)
        eps_v = (_clamped_av(exx), _clamped_av(eyy), exy)
        P_v = _clamped_av(P)
        out_v = _local_stress(
            eps_v, to_v, eta_v_, P_v, lam_v, lambda_relax, material, pr_vertex, dt, EII_v
        )
        # center pass
        eps_c = (exx, eyy, av_a(exy))
        out_c = _local_stress(
            eps_c, to_c, eta_c_, P, lam, lambda_relax, material, pr_center, dt, EII
        )
        return out_c, out_v

    T_v = None if T is None else _clamped_av(T)

    def refresh_viscosity(eta_c_, eta_v_, out_c, out_v):
        """τII-based creep refresh (reference _update_τII_viscosity)."""
        from justrelax_tpu.rheology.viscosity import compute_viscosity_fields

        return compute_viscosity_fields(
            eta_c_, eta_v_, material,
            out_c[0], out_c[1], out_c[2],
            out_v[0], out_v[1], out_v[2],
            pr_center, pr_vertex, T=T, T_v=T_v, mode="tau",
            relaxation=viscosity_relaxation, cutoff=viscosity_cutoff,
        )

    def momentum_residual(P, theta_c, tau_c, tau_v):
        txx, tyy, _ = tau_c
        txy = tau_v[2]
        Ptot_x = (P[1:, :] - P[:-1, :] + theta_c[1:, :] - theta_c[:-1, :]) * mom_dx_x
        Rx = (
            (txx[1:, :] - txx[:-1, :]) * mom_dx_x
            + (txy[1:-1, 1:] - txy[1:-1, :-1]) * mom_dy_x
            - Ptot_x
            - 0.5 * (rho_gx[1:, :] + rho_gx[:-1, :])
        )
        Ptot_y = (P[:, 1:] - P[:, :-1] + theta_c[:, 1:] - theta_c[:, :-1]) * mom_dy_y
        Ry = (
            (tyy[:, 1:] - tyy[:, :-1]) * mom_dy_y
            + (txy[1:, 1:-1] - txy[:-1, 1:-1]) * mom_dx_y
            - Ptot_y
            - 0.5 * (rho_gy[:, 1:] + rho_gy[:, :-1])
        )
        return Rx, Ry

    class Inner(NamedTuple):
        Vx: Array
        Vy: Array
        lam: Array
        lam_v: Array
        dVx: Array
        dVy: Array
        Rx: Array
        Ry: Array
        Rx0: Array
        Ry0: Array
        cV: Array
        err: Array
        errV00x: Array
        errV00y: Array
        it: Array
        itg: Array
        eta: Array
        eta_v: Array
        Dx_f: Array
        Dy_f: Array
        lmx: Array
        lmy: Array

    class Outer(NamedTuple):
        inner: Inner
        P: Array
        err: Array
        err_min: Array
        rel_drop: Array
        itPH: Array
        errV0x: Array
        errV0y: Array
        errPt0: Array

    def dr_iteration(c: Inner, P, dtx, ax, bx, dty, ay, by):
        exx, eyy, exy, RP = strain_RP(c.Vx, c.Vy, P)
        out_c, out_v = stress_pass(exx, eyy, exy, P, c.lam, c.lam_v, c.eta, c.eta_v)
        if linear_viscosity:
            eta_n, eta_vn = c.eta, c.eta_v
        else:
            eta_n, eta_vn = refresh_viscosity(c.eta, c.eta_v, out_c, out_v)
        theta_c = gamma_eff * RP + out_c[8]  # γ·RP + ΔPψ
        Rx, Ry = momentum_residual(P, theta_c, out_c[:3], out_v[:3])
        Rx = Rx / c.Dx_f
        Ry = Ry / c.Dy_f
        dVx = ax * c.dVx + Rx
        dVy = ay * c.dVy + Ry
        Vx = interior_add(c.Vx, dVx * bx * dtx)
        Vy = interior_add(c.Vy, dVy * by * dty)
        Vx, Vy = flow_bcs((Vx, Vy), flow_bc)
        return c._replace(
            Vx=Vx, Vy=Vy, lam=out_c[7], lam_v=out_v[7], dVx=dVx, dVy=dVy,
            Rx=Rx, Ry=Ry,
            eta=eta_n, eta_v=eta_vn,
        )

    nout_i = int(nout)

    def inner_solve(P, inner0, eps_vel):
        def cond(carry):
            c, tun = carry
            return (c.err > eps_vel) & (c.it < iter_max)

        def body(carry):
            c, tun = carry
            dtx, ax, bx, dty, ay, by = tun
            c = c._replace(Rx0=c.Rx, Ry0=c.Ry)

            def one(_, cc):
                return dr_iteration(cc, P, dtx, ax, bx, dty, ay, by)

            c = lax.fori_loop(0, nout_i, one, c)
            if not linear_viscosity:
                Dx2, Dy2, lmx2, lmy2 = gershgorin_schur_2d(
                    c.eta, c.eta_v, gamma_eff, pr_center, pr_vertex, material,
                    di, dt,
                )
                c = c._replace(Dx_f=Dx2, Dy_f=Dy2, lmx=lmx2, lmy=lmy2)
            errVx = _norm(c.Dx_f * c.Rx) / math.sqrt(v_dofs[0])
            errVy = _norm(c.Dy_f * c.Ry) / math.sqrt(v_dofs[1])
            first = c.itg == 0  # reference: errV00 captured once per solve
            errV00x = jnp.where(first, errVx, c.errV00x)
            errV00y = jnp.where(first, errVy, c.errV00y)
            err = jnp.maximum(errVx / errV00x, errVy / errV00y)
            # Rayleigh-quotient λmin → damping c
            dVx_full = c.dVx * bx * dtx
            dVy_full = c.dVy * by * dty
            num = jnp.sum(dVx_full * (c.Rx - c.Rx0)) + jnp.sum(dVy_full * (c.Ry - c.Ry0))
            den = jnp.sum(dVx_full**2) + jnp.sum(dVy_full**2)
            lmin = jnp.abs(num) / jnp.where(den == 0, 1.0, den)
            cV = 2.0 * jnp.sqrt(lmin) * c_fact
            dtx2, ax2, bx2 = _alpha_beta(c.lmx, cV, CFL)
            dty2, ay2, by2 = _alpha_beta(c.lmy, cV, CFL)
            c = c._replace(
                err=err, errV00x=errV00x, errV00y=errV00y,
                it=c.it + nout_i, itg=c.itg + nout_i, cV=cV,
            )
            return (c, (dtx2, ax2, bx2, dty2, ay2, by2))

        dtx, ax, bx = _alpha_beta(inner0.lmx, inner0.cV, CFL)
        dty, ay, by = _alpha_beta(inner0.lmy, inner0.cV, CFL)
        init = (inner0._replace(it=jnp.asarray(0, jnp.int32), err=jnp.asarray(jnp.inf, dtype)),
                (dtx, ax, bx, dty, ay, by))
        c, _ = lax.while_loop(cond, body, init)
        return c

    def outer_cond(o: Outer):
        return (o.err > eps) & (o.itPH < max_ph) & (o.inner.itg < total_iter_max)

    def outer_body(o: Outer):
        c = o.inner
        # PH residual check
        exx, eyy, exy, RP = strain_RP(c.Vx, c.Vy, o.P)
        out_c, out_v = stress_pass(exx, eyy, exy, o.P, c.lam, c.lam_v, c.eta, c.eta_v)
        Rx, Ry = momentum_residual(o.P, out_c[8], out_c[:3], out_v[:3])
        errVx = _norm(Rx) / math.sqrt(v_dofs[0])
        errVy = _norm(Ry) / math.sqrt(v_dofs[1])
        errPt = _norm(RP) / math.sqrt(p_dof)
        # reference: err0 captured at itPH==1 (errPt0 re-captured at itPH==2),
        # err = max over min(err/err0, err) — relative OR absolute
        tiny = jnp.finfo(dtype).tiny  # f32-safe (1e-300 underflows there)
        errV0x = jnp.where(o.itPH == 0, errVx + tiny, o.errV0x)
        errV0y = jnp.where(o.itPH == 0, errVy + tiny, o.errV0y)
        errPt0 = jnp.where(o.itPH <= 1, errPt + tiny, o.errPt0)
        err = jnp.maximum(
            jnp.maximum(
                jnp.minimum(errVx / errV0x, errVx),
                jnp.minimum(errVy / errV0y, errVy),
            ),
            jnp.minimum(errPt / errPt0, errPt),
        )
        rel = jnp.where(err > o.err_min * 1.05, jnp.maximum(o.rel_drop * 0.1, 1.0e-3), o.rel_drop)
        err_min = jnp.minimum(o.err_min, err)
        eps_vel = err * rel

        # the reference BREAKS right after the residual check (solver.jl:172)
        # — once converged, no further inner solve or PH update touches the
        # measured state, so the returned fields are exactly the ones the
        # exit criterion certified (an unguarded trailing update is bounded
        # by one inner-solve step + γ_eff·RP, small at convergence, but it
        # makes the returned state one unmeasured iterate past the record).
        def _advance(cP):
            c_in, _ = cP
            c_new = inner_solve(o.P, c_in, eps_vel)
            _, _, _, RP2 = strain_RP(c_new.Vx, c_new.Vy, o.P)
            return c_new, o.P + gamma_eff * RP2

        c, P = lax.cond(err > eps, _advance, lambda cP: cP, (c, o.P))
        return Outer(
            inner=c, P=P, err=err, err_min=err_min, rel_drop=rel, itPH=o.itPH + 1,
            errV0x=errV0x, errV0y=errV0y, errPt0=errPt0,
        )

    z_c = jnp.zeros((nx, ny), dtype)
    z_v = jnp.zeros((nx + 1, ny + 1), dtype)
    inner0 = Inner(
        Vx=stokes.V.Vx, Vy=stokes.V.Vy,
        lam=jnp.zeros_like(z_c), lam_v=jnp.zeros_like(z_v),
        dVx=jnp.zeros((nx - 1, ny), dtype), dVy=jnp.zeros((nx, ny - 1), dtype),
        Rx=jnp.zeros((nx - 1, ny), dtype), Ry=jnp.zeros((nx, ny - 1), dtype),
        Rx0=jnp.zeros((nx - 1, ny), dtype), Ry0=jnp.zeros((nx, ny - 1), dtype),
        cV=jnp.asarray(0.0, dtype),
        err=jnp.asarray(jnp.inf, dtype),
        errV00x=jnp.asarray(1.0, dtype), errV00y=jnp.asarray(1.0, dtype),
        it=jnp.asarray(0, jnp.int32), itg=jnp.asarray(0, jnp.int32),
        eta=eta, eta_v=eta_v, Dx_f=Dx, Dy_f=Dy, lmx=lmax_x, lmy=lmax_y,
    )
    o = Outer(
        inner=inner0, P=stokes.P,
        err=jnp.asarray(jnp.inf, dtype), err_min=jnp.asarray(jnp.inf, dtype),
        rel_drop=jnp.asarray(rel_drop, dtype), itPH=jnp.asarray(0, jnp.int32),
        errV0x=jnp.asarray(1.0, dtype), errV0y=jnp.asarray(1.0, dtype),
        errPt0=jnp.asarray(1.0, dtype),
    )
    o = lax.while_loop(outer_cond, outer_body, o)

    # final state assembly
    c = o.inner
    exx, eyy, exy, RP = strain_RP(c.Vx, c.Vy, o.P)
    out_c, out_v = stress_pass(exx, eyy, exy, o.P, c.lam, c.lam_v, c.eta, c.eta_v)
    P_final = o.P + out_c[8]  # absorb ΔPψ (solver.jl:269)
    grad_V = (c.Vx[1:, 1:-1] - c.Vx[:-1, 1:-1]) * inv_dx + (
        c.Vy[1:-1, 1:] - c.Vy[1:-1, :-1]
    ) * inv_dy
    exy_c = av_a(exy)
    from justrelax_tpu.rheology.plasticity import second_invariant_staggered

    def g4(A):
        return (A[:-1, :-1], A[1:, :-1], A[:-1, 1:], A[1:, 1:])

    eps_pl_v = out_v[5]  # vertex ε_pl.xy
    EII_new = EII + second_invariant_staggered(out_c[3], out_c[4], g4(eps_pl_v)) * dt

    tau = stokes.tau.replace(
        xx=out_c[0], yy=out_c[1], xy_c=out_c[2],
        xx_v=out_v[0], yy_v=out_v[1], xy=out_v[2],
        II=second_invariant_staggered(out_c[0], out_c[1], g4(out_v[2])),
    )
    tau_o = stokes.tau_o.replace(
        xx=out_c[0], yy=out_c[1], xy_c=out_c[2],
        xx_v=out_v[0], yy_v=out_v[1], xy=out_v[2],
    )
    eps_t = stokes.eps.replace(
        xx=exx, yy=eyy, xy=exy, xy_c=exy_c,
        II=second_invariant_staggered(exx, eyy, g4(exy)),
    )
    eps_pl_t = stokes.eps_pl.replace(
        xx=out_c[3], yy=out_c[4], xy=eps_pl_v, xy_c=av_a(eps_pl_v)
    )
    new_stokes = stokes.replace(
        P=P_final, P0=P0,
        V=stokes.V.replace(Vx=c.Vx, Vy=c.Vy),
        grad_V=grad_V,
        tau=tau, tau_o=tau_o, eps=eps_t, eps_pl=eps_pl_t,
        EII_pl=EII_new, EVol_pl=stokes.EVol_pl + dt * out_c[10],
        eps_vol_pl=out_c[10],
        lam=c.lam, lam_v=c.lam_v, dP_psi=out_c[8],
        viscosity=stokes.viscosity.replace(
            eta=c.eta, eta_v=c.eta_v, eta_vep=out_c[9]
        ),
        R=stokes.R.replace(RP=RP, Rx=c.Rx, Ry=c.Ry),
    )
    info = StokesSolveInfo(
        iters=c.itg, err=o.err,
        err_history=jnp.full((1,), jnp.nan, dtype),
        norm_Rx=jnp.full((1,), jnp.nan, dtype),
        norm_Ry=jnp.full((1,), jnp.nan, dtype),
        norm_RP=jnp.full((1,), jnp.nan, dtype),
    )
    return new_stokes, info
