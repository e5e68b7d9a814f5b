"""Fused center+vertex visco-elasto-plastic stress update (2D).

Vectorized re-design of the reference's flagship kernel
``update_stresses_center_vertex_ps!``
(/root/reference/src/stokes/StressKernels.jl:987-1139): one pass computes the
VE trial stress and Drucker-Prager return mapping at *both* cell centers and
vertices, with clamped-boundary center→vertex interpolation, relaxed plastic
multipliers λ/λv, dilatancy pressure correction, τII and the VEP viscosity.

Branchless: the reference's yield branch (``is_pl && τII≠0 && F>0``) becomes
``jnp.where`` masks. All divisions by τII are guarded (mask is False there).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax.numpy as jnp

from justrelax_tpu.ops.stencil import av_a, expand_edges, harm_a
from justrelax_tpu.rheology.materials import get_bulk_modulus, get_shear_modulus
from justrelax_tpu.rheology.plasticity import (
    flow_gradients_P,
    plastic_params_phase,
    second_invariant,
    yield_function,
)

Array = Any

__all__ = ["update_stresses_center_vertex", "VEPStressResult"]


class VEPStressResult(NamedTuple):
    txx: Array
    tyy: Array
    txy_c: Array
    txy_v: Array
    lam: Array
    lam_v: Array
    tau_II: Array
    eta_vep: Array
    P_corrected: Array
    eps_pl_xx: Array
    eps_pl_yy: Array
    eps_pl_xy_v: Array
    eps_vol_pl: Array


def _stress_increment(tau, tau_o, eta, eps, _Gdt, dtau_r):
    return dtau_r * (2.0 * eta * eps - (tau - tau_o) * eta * _Gdt - tau)


def _safe_div(a, b):
    return a / jnp.where(b == 0, 1.0, b)


def update_stresses_center_vertex(
    exx, eyy, exy_v,  # strain rate: centers, centers, vertices
    txx, tyy, txy_c, txy_v,  # current stress
    txx_o, tyy_o, txy_c_o, txy_v_o,  # old (previous timestep) stress
    Pr,  # pressure iterate θ (centers)
    eta,  # effective viscosity (centers)
    lam, lam_v,  # plastic multipliers (centers, vertices)
    EII_pl,  # accumulated plastic strain (centers)
    material,
    phase_ratios_center,  # (nx, ny, nphase) or None
    phase_ratios_vertex,  # (nx+1, ny+1, nphase) or None
    rel_lambda: float,
    dt,
    theta_dtau,
    extend=None,
) -> VEPStressResult:
    """``extend`` widens a center array by one node on every face before the
    4-point dual-grid average — the serial default replicates edge values
    (``expand_edges`` == the reference's ``av_clamped``/``harm_clamped``);
    the distributed solver passes a halo-aware extension that fetches real
    neighbor-device values in the interior and replicates only on physical
    boundaries, making the shared-vertex math bit-identical to serial."""
    if extend is None:
        extend = expand_edges
    # ---------------- vertex pass -----------------------------------------
    Pv = av_a(extend(Pr))  # av_clamped → all vertices
    exx_v = av_a(extend(exx))
    eyy_v = av_a(extend(eyy))
    txx_v = av_a(extend(txx))
    tyy_v = av_a(extend(tyy))
    txx_ov = av_a(extend(txx_o))
    tyy_ov = av_a(extend(tyy_o))
    EII_v = av_a(extend(EII_pl))

    ppv = plastic_params_phase(material, EII_v, phase_ratios_vertex)
    G_v = get_shear_modulus(material, phase_ratios_vertex)
    K_v = get_bulk_modulus(material, phase_ratios_vertex)
    _Gvdt = 1.0 / (G_v * dt)
    eta_v = harm_a(extend(eta))  # harm_clamped
    dtau_rv = 1.0 / (theta_dtau + eta_v * _Gvdt + 1.0)

    dtxx_v = _stress_increment(txx_v, txx_ov, eta_v, exx_v, _Gvdt, dtau_rv)
    dtyy_v = _stress_increment(tyy_v, tyy_ov, eta_v, eyy_v, _Gvdt, dtau_rv)
    dtxy_v = _stress_increment(txy_v, txy_v_o, eta_v, exy_v, _Gvdt, dtau_rv)
    txy_trial_v = txy_v + dtxy_v
    tau_II_v = second_invariant(txx_v + dtxx_v, tyy_v + dtyy_v, txy_trial_v)

    dFdP_v, dQdP_v = flow_gradients_P(ppv, Pv, tau_II_v)
    volume_v = jnp.where(jnp.isinf(K_v), 0.0, K_v * dt * dFdP_v * dQdP_v)
    F_v = yield_function(ppv, Pv, tau_II_v)

    yield_v = ppv.is_pl & (tau_II_v != 0.0) & (F_v > 0.0)
    lam_v_new = (1.0 - rel_lambda) * lam_v + rel_lambda * (
        jnp.maximum(F_v, 0.0) / (eta_v * dtau_rv + ppv.eta_reg + volume_v)
    )
    lam_v_new = jnp.where(yield_v, lam_v_new, lam_v)
    # ∂Q/∂τxy = pl_frac · dq_shear · τ_trial/(2 τII)  (dq_shear = 1 for the
    # consistent tensor gradient, 0.5 for the Material.dqdtau_alt bracket)
    dQdt_xy_v = ppv.pl_frac * 0.5 * ppv.dq_shear * _safe_div(txy_trial_v, tau_II_v)
    eps_pl_xy_v = jnp.where(yield_v, lam_v_new * dQdt_xy_v, 0.0)
    txy_v_new = txy_v + jnp.where(
        yield_v, dtxy_v - 2.0 * eta_v * eps_pl_xy_v * dtau_rv, dtxy_v
    )

    # ---------------- center pass -----------------------------------------
    ppc = plastic_params_phase(material, EII_pl, phase_ratios_center)
    G_c = get_shear_modulus(material, phase_ratios_center)
    K_c = get_bulk_modulus(material, phase_ratios_center)
    _Gdt = 1.0 / (G_c * dt)
    dtau_r = 1.0 / (theta_dtau + eta * _Gdt + 1.0)

    exy_c = av_a(exy_v)  # mean of 4 surrounding vertices
    dtxx = _stress_increment(txx, txx_o, eta, exx, _Gdt, dtau_r)
    dtyy = _stress_increment(tyy, tyy_o, eta, eyy, _Gdt, dtau_r)
    dtxy = _stress_increment(txy_c, txy_c_o, eta, exy_c, _Gdt, dtau_r)
    txx_t, tyy_t, txy_t = txx + dtxx, tyy + dtyy, txy_c + dtxy
    tau_II_t = second_invariant(txx_t, tyy_t, txy_t)

    dFdP, dQdP = flow_gradients_P(ppc, Pr, tau_II_t)
    volume = jnp.where(jnp.isinf(K_c), 0.0, K_c * dt * dFdP * dQdP)
    F = yield_function(ppc, Pr, tau_II_t)

    yield_c = ppc.is_pl & (tau_II_t != 0.0) & (F > 0.0)
    lam_new = (1.0 - rel_lambda) * lam + rel_lambda * (
        jnp.maximum(F, 0.0) / (eta * dtau_r + ppc.eta_reg + volume)
    )
    lam_new = jnp.where(yield_c, lam_new, lam)

    scale = ppc.pl_frac * 0.5
    eps_pl_xx = jnp.where(yield_c, lam_new * scale * _safe_div(txx_t, tau_II_t), 0.0)
    eps_pl_yy = jnp.where(yield_c, lam_new * scale * _safe_div(tyy_t, tau_II_t), 0.0)
    eps_pl_xy = jnp.where(
        yield_c, lam_new * scale * ppc.dq_shear * _safe_div(txy_t, tau_II_t), 0.0
    )

    corr = 2.0 * eta * dtau_r
    txx_new = jnp.where(yield_c, txx_t - corr * eps_pl_xx, txx_t)
    tyy_new = jnp.where(yield_c, tyy_t - corr * eps_pl_yy, tyy_t)
    txy_c_new = jnp.where(yield_c, txy_t - corr * eps_pl_xy, txy_t)
    eps_vol_pl = jnp.where(yield_c, -lam_new * dQdP, 0.0)

    tau_II = jnp.where(
        yield_c, second_invariant(txx_new, tyy_new, txy_c_new), tau_II_t
    )
    eps_II = second_invariant(exx, eyy, exy_c)
    eta_vep = tau_II * 0.5 * _safe_div(jnp.ones_like(eps_II), eps_II)
    P_corr = Pr - jnp.where(
        jnp.isinf(K_c), 0.0, K_c * dt * lam_new * dQdP
    )

    return VEPStressResult(
        txx=txx_new,
        tyy=tyy_new,
        txy_c=txy_c_new,
        txy_v=txy_v_new,
        lam=lam_new,
        lam_v=lam_v_new,
        tau_II=tau_II,
        eta_vep=eta_vep,
        P_corrected=P_corr,
        eps_pl_xx=eps_pl_xx,
        eps_pl_yy=eps_pl_yy,
        eps_pl_xy_v=eps_pl_xy_v,
        eps_vol_pl=eps_vol_pl,
    )
