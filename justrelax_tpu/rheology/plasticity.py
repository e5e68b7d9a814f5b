"""Drucker-Prager (regularized) plasticity, phase-weighted and branchless.

Vectorized equivalents of the reference's plastic machinery
(/root/reference/src/rheology/StressUpdate.jl): per-phase parameters with
linear softening are blended by phase ratios (``plastic_params_phase``,
StressUpdate.jl:146-188), the yield function F is a ratio-weighted sum with
F = τII for non-plastic phases (:381-453), and the flow gradients use tensor
convention (shear slots of ∂Q/∂τ halved; :455-551):

  F      = τII − Σ_pl r_p (C_p cosϕ_p + P sinϕ_p)
  ∂Q/∂τ  = pl_frac · τ_trial / (2 τII)
  ∂Q/∂P  = −sinψ̄ ,  ∂F/∂P = −sinϕ̄  (ratio-weighted over plastic phases)

All functions broadcast over the grid; phase parameters live in a
:class:`~justrelax_tpu.rheology.materials.MaterialStack`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple, Optional

import jax.numpy as jnp

from justrelax_tpu.rheology.materials import _as_stack, _bcast

Array = Any

__all__ = [
    "PlasticParams",
    "plastic_params_phase",
    "yield_function",
    "flow_gradients_P",
    "second_invariant",
    "DruckerPragerCap",
    "plastic_gradients",
    "yield_function_cap",
]


class PlasticParams(NamedTuple):
    is_pl: Array  # any plastic phase present (bool)
    pl_frac: Array  # Σ ratio over plastic phases
    C_cosphi: Array  # Σ_pl r·C·cosϕ (yield intercept)
    sinphi: Array  # Σ_pl r·sinϕ
    cosphi: Array  # Σ_pl r·cosϕ
    sinpsi: Array  # Σ_pl r·sinψ
    eta_reg: Array  # Σ_pl r·η_reg
    pT: Array  # Σ_pl r·pT tension-cap closure pressure (0 = no cap)
    dq_shear: Array  # ∂Q/∂τ shear-slot multiplier: 1 (consistent) … 0.5 (alt)


def _soften(val, min_v, slope_active, lo, hi, EII):
    """GeoParams LinearSoftening: linear decay of ``val`` to ``min_v`` over
    the accumulated-strain window [lo, hi]."""
    frac = jnp.clip((EII - lo) / jnp.maximum(hi - lo, 1e-30), 0.0, 1.0)
    soft = val + (min_v - val) * frac
    return jnp.where(slope_active, soft, val)


def plastic_params_phase(material, EII: Array, phase_ratios: Optional[Array]) -> PlasticParams:
    m = _as_stack(material).params
    is_pl_p = m.is_plastic > 0  # (nphase,)
    deg = jnp.pi / 180.0

    C_p = _bcast(m.C, EII)
    phi_p = _bcast(m.friction_angle, EII)
    # softening on cohesion / friction angle
    C_p = _soften(
        C_p,
        _bcast(m.soft_C_min, EII),
        _bcast(m.soft_C_active, EII) > 0,
        _bcast(m.soft_strain_lo, EII),
        _bcast(m.soft_strain_hi, EII),
        EII[..., None],
    )
    # GeoParams NonLinearSoftening: softened cohesion derived from ξ₀ alone
    # (the functor ignores the phase's C; reference soften_cohesion,
    # StressUpdate.jl:316-326), decaying ξ₀ → ξ₀ − Δ with plastic strain
    nl_xi0 = _bcast(m.soft_C_nl_xi0, EII)
    nl_delta = _bcast(m.soft_C_nl_delta, EII)
    nl_eps = jnp.maximum(_bcast(m.soft_C_nl_eps_ref, EII), 1e-30)
    C_nl = nl_xi0 - nl_delta * (1.0 - jnp.exp(-EII[..., None] / nl_eps))
    C_p = jnp.where(_bcast(m.soft_C_nl, EII) > 0, C_nl, C_p)
    phi_p = _soften(
        phi_p,
        _bcast(m.soft_phi_min, EII),
        _bcast(m.soft_phi_active, EII) > 0,
        _bcast(m.soft_strain_lo, EII),
        _bcast(m.soft_strain_hi, EII),
        EII[..., None],
    )
    sinphi_p = jnp.sin(phi_p * deg)
    cosphi_p = jnp.cos(phi_p * deg)
    sinpsi_p = jnp.sin(_bcast(m.dilation_angle, EII) * deg)
    eta_reg_p = _bcast(m.eta_reg, EII)
    w_pl = _bcast(jnp.where(is_pl_p, 1.0, 0.0), EII)

    if phase_ratios is None:
        r = jnp.ones_like(w_pl)
    else:
        r = phase_ratios
    rw = r * w_pl
    return PlasticParams(
        is_pl=jnp.sum(rw, axis=-1) > 0,
        pl_frac=jnp.sum(rw, axis=-1),
        C_cosphi=jnp.sum(rw * C_p * cosphi_p, axis=-1),
        sinphi=jnp.sum(rw * sinphi_p, axis=-1),
        cosphi=jnp.sum(rw * cosphi_p, axis=-1),
        sinpsi=jnp.sum(rw * sinpsi_p, axis=-1),
        eta_reg=jnp.sum(rw * eta_reg_p, axis=-1),
        pT=jnp.sum(rw * _bcast(m.tension_pT, EII), axis=-1),
        dq_shear=1.0 - 0.5 * jnp.sum(rw * _bcast(m.dqdtau_alt, EII), axis=-1)
        / jnp.maximum(jnp.sum(rw, axis=-1), 1e-30),
    )


def _tension_cap_yield(pp: PlasticParams, P: Array):
    """Tension-cap yield stress: elliptic closure of the DP cone at P = pT.

    GeoParams ``DruckerPragerCap(pT=...)`` (used by the reference's DPCap
    shearband, test_shearband2D_DPCap.jl:93-99, and the caldera miniapps)
    closes the yield envelope on the tension side; its exact v0.7.17 internals
    are not retrievable here (PARITY.md). We use the standard elliptic cap
    dropping from the cone's P=0 intercept C·cosϕ to zero strength at
    P = pT < 0:

        τ_cap(P) = C·cosϕ · √(1 − (P/pT)²)        (pT ≤ P < 0)

    and the active surface is min(cone, cap) on the tension side (P < 0);
    the compression cone is untouched. This reproduces the reference
    scenario's envelope (yield onset at P < 0 near the inclusion, dilation
    ε_vol_pl ≥ 0 via associated flow on the cap)."""
    ratio = jnp.clip(P / jnp.where(pp.pT == 0.0, -jnp.inf, pp.pT), 0.0, 1.0)
    cap = pp.C_cosphi * jnp.sqrt(jnp.maximum(1.0 - ratio**2, 0.0))
    return jnp.where(P < 0.0, cap, jnp.inf)


def yield_function(pp: PlasticParams, P: Array, tau_II: Array) -> Array:
    """Phase-weighted Drucker-Prager yield: F = τII − Σ_pl r(C cosϕ + P sinϕ);
    with a tension cap (``pT`` < 0) the envelope is min(cone, cap)."""
    tau_cone = pp.C_cosphi + P * pp.sinphi
    tau_y = jnp.minimum(tau_cone, _tension_cap_yield(pp, P))
    return tau_II - tau_y


def flow_gradients_P(pp: PlasticParams, P: Array, tau_II: Array):
    """(∂F/∂P, ∂Q/∂P) of the active surface: cone (−sinϕ, −sinψ) or, where
    the tension cap is lower, the associated cap gradient
    ∂F/∂P = −dτ_cap/dP = C·cosϕ·(P/pT²)/√(1−(P/pT)²) (< 0 at P < 0 →
    dilation via ε_vol_pl = −λ·∂Q/∂P ≥ 0)."""
    dFdP_cone = -pp.sinphi
    dQdP_cone = -pp.sinpsi
    pT = jnp.where(pp.pT == 0.0, -jnp.inf, pp.pT)
    ratio = jnp.clip(P / pT, 0.0, 1.0)
    root = jnp.sqrt(jnp.maximum(1.0 - ratio**2, 1e-12))
    dFdP_cap = pp.C_cosphi * P / jnp.where(
        jnp.isinf(pT), jnp.inf, pT**2
    ) / root
    on_cap = _tension_cap_yield(pp, P) < (pp.C_cosphi + P * pp.sinphi)
    dFdP = jnp.where(on_cap, dFdP_cap, dFdP_cone)
    dQdP = jnp.where(on_cap, dFdP_cap, dQdP_cone)  # associated on the cap
    return dFdP, dQdP


def second_invariant(xx, yy, xy):
    """2D second invariant (GeoParams convention): √(½(xx²+yy²) + xy²)."""
    return jnp.sqrt(0.5 * (xx**2 + yy**2) + xy**2)


def second_invariant_staggered(xx, yy, xy_gathered4):
    """Staggered invariant: shear contribution is the mean of the squared
    4 surrounding vertex values (GeoParams second_invariant_staggered)."""
    xy2 = sum(v**2 for v in xy_gathered4) / 4.0
    return jnp.sqrt(0.5 * (xx**2 + yy**2) + xy2)


# --- plastic flow gradients (cone / cap) ------------------------------------
@dataclass(frozen=True)
class DruckerPragerCap:
    """Elliptic compression cap closing the DP cone at high pressure
    (``DruckerPragerCap`` in the reference's rheology menu, SURVEY §GeoParams;
    the reference defers the gradients to GeoParams — here the cap is the
    standard elliptic end-cap in (P, τII) space:

      F_cap = √(((P − Pc)/a)² + (τII/b)²) − 1   for P > Pc,

    with semi-axes ``a`` (pressure) and ``b`` (stress), center ``Pc`` on the
    hydrostat, associated flow on the cap. The exact GeoParams coefficient
    convention is to be pinned from source next round (see PARITY.md)."""

    Pc: float
    a: float
    b: float


def plastic_gradients(
    txx_trial, tyy_trial, txy_trial, tau_II, P, pp: PlasticParams,
    cap: Optional[DruckerPragerCap] = None,
):
    """Flow/yield gradients for the return mapping, tensor convention
    (reference compute_plastic_gradients_phase, StressUpdate.jl:465-550:
    normal slots of GeoParams ∂Q∂τ kept, shear slots halved).

    Returns ``((dQdτ_xx, dQdτ_yy, dQdτ_xy), dQdP, dFdP)``. With ``cap``,
    cells at ``P > cap.Pc`` use the elliptic cap gradients (associated);
    the volume-closure term of the λ denominator is ``K·dt·dFdP·dQdP``.
    """
    it = 1.0 / jnp.maximum(tau_II, 1e-30)
    # DP cone, tensor convention: all slots τ/(2τII)
    half_it = 0.5 * it
    dQdt_cone = (txx_trial * half_it, tyy_trial * half_it, txy_trial * half_it)
    dQdP_cone = -pp.sinpsi
    dFdP_cone = -pp.sinphi
    if cap is None:
        return dQdt_cone, dQdP_cone, dFdP_cone

    # elliptic cap: F = √(((P−Pc)/a)² + (τII/b)²) − 1, associated (Q = F)
    dP = P - cap.Pc
    S = jnp.sqrt((dP / cap.a) ** 2 + (tau_II / cap.b) ** 2)
    S = jnp.maximum(S, 1e-30)
    dFdP_cap = dP / (cap.a**2 * S)
    # ∂F/∂τ_ij = (τII/(b²S)) · ∂τII/∂τ_ij, tensor convention as above
    fac = tau_II / (cap.b**2 * S) * half_it
    on_cap = dP > 0.0
    dQdt = tuple(
        jnp.where(on_cap, fac * t, g) for t, g in zip(
            (txx_trial, tyy_trial, txy_trial), dQdt_cone
        )
    )
    dQdP = jnp.where(on_cap, dFdP_cap, dQdP_cone)
    dFdP = jnp.where(on_cap, dFdP_cap, dFdP_cone)
    return dQdt, dQdP, dFdP


def yield_function_cap(pp: PlasticParams, P, tau_II, cap: DruckerPragerCap):
    """Composite cone+cap yield: the cap branch applies for P > Pc."""
    F_cone = yield_function(pp, P, tau_II)
    dP = P - cap.Pc
    F_cap = jnp.sqrt((dP / cap.a) ** 2 + (tau_II / cap.b) ** 2) - 1.0
    return jnp.where(dP > 0.0, F_cap, F_cone)
