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

from typing import Any, NamedTuple, Optional

import jax.numpy as jnp

from justrelax_tpu.rheology.materials import _as_stack, _bcast

Array = Any

__all__ = ["PlasticParams", "plastic_params_phase", "yield_function", "second_invariant"]


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
