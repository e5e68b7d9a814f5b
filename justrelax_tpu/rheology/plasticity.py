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
    )


def yield_function(pp: PlasticParams, P: Array, tau_II: Array) -> Array:
    """Phase-weighted Drucker-Prager yield: F = τII − Σ_pl r(C cosϕ + P sinϕ)."""
    return tau_II - pp.C_cosphi - P * pp.sinphi


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
