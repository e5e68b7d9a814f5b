"""Nonlinear effective viscosity (GeoParams CompositeRheology equivalent).

Vectorized version of the reference's viscosity layer
(/root/reference/src/rheology/Viscosity.jl): the effective creep viscosity is
evaluated from the local strain-rate (or stress) second invariant, blended
over phases, relaxed with linear continuation
``η ← ν·η_new + (1−ν)·η_old`` (reference ``continuation_linear``), and
clamped to a cutoff window. Both cell-center and vertex fields are updated.

Creep laws supported per phase (Material fields), composed harmonically as
serial CompositeRheology elements:
- linear viscous: η = η0
- dislocation (power-law) creep: η = A^(−1/n) · invII^(1/n − 1) · exp(E/(n R T))
  from εII, or η = A^(−1) τII^(1−n) exp(E/(R T)) ... evaluated consistently
  from the invariant handed in (`mode`);
- diffusion creep (linear, grain-size sensitive d^m);
- grain-boundary sliding (power law with d^−m, GeoParams
  GrainBoundarySliding), analytically invertible;
- Peierls low-temperature plasticity
  ε̇ = A τⁿ exp(−E/(RT)·(1−(τ/τP)^o)^q) (GeoParams PeierlsCreep): direct in
  "tau" mode, fixed-30-step Newton inversion on ln τ in "eps" mode
  (compiler-friendly: no data-dependent iteration count).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp

from justrelax_tpu.rheology.materials import _as_stack, _bcast, phase_average
from justrelax_tpu.rheology.plasticity import second_invariant

Array = Any

R_GAS = 8.314462618

__all__ = [
    "phase_viscosity", "compute_viscosity_fields", "continuation_linear",
    "continuation_log", "shared_powerlaw_exponent", "powerlaw_recip_coeffs",
]


def continuation_linear(x_new, x_old, nu):
    return nu * x_new + (1.0 - nu) * x_old


def continuation_log(x_new, x_old, nu):
    out = jnp.exp((1.0 - nu) * jnp.log(x_old) + nu * jnp.log(x_new))
    return jnp.where(jnp.isnan(out), x_old, out)


def phase_viscosity(
    material, invII: Array, T: Optional[Array], phase_ratios, mode: str,
    P: Optional[Array] = None,
):
    """Effective creep viscosity per cell from the invariant ``invII``.

    ``mode`` is "eps" (strain-rate invariant) or "tau" (stress invariant).
    Mechanisms per phase (GeoParams CompositeRheology serial elements):
    dislocation creep (with activation volume P·V when ``P`` given) and
    grain-size-sensitive diffusion creep, composed harmonically
    (1/η = 1/η_disl + 1/η_diff); phases with neither use the linear η0.
    Per-phase viscosities are blended HARMONICALLY over phase ratios
    (reference Viscosity.jl compute_phase_viscosity: inv(Σ rᵢ/ηᵢ), with a
    >0.999-dominant-phase early exit that the harmonic form reproduces
    exactly for one-hot ratios).
    """
    m = _as_stack(material).params
    eta0 = _bcast(m.eta0, invII)
    A = _bcast(m.disl_A, invII)
    n = _bcast(m.disl_n, invII)
    E = _bcast(m.disl_E, invII)
    V = _bcast(m.disl_V, invII)
    has_disl = A > 0
    A_safe = jnp.where(has_disl, A, 1.0)
    tiny = jnp.finfo(invII.dtype).tiny  # f32-safe floor
    inv_safe = jnp.maximum(invII[..., None], tiny)
    PV = 0.0 if P is None else P[..., None] * V
    if T is None:
        iRT = None
    else:
        iRT = 1.0 / (R_GAS * jnp.maximum(T[..., None], 1e-30))
    if mode == "eps":
        expo = 1.0 if iRT is None else jnp.exp((E + PV) * iRT / n)
        eta_disl = 0.5 * A_safe ** (-1.0 / n) * inv_safe ** (1.0 / n - 1.0) * expo
    else:
        expo = 1.0 if iRT is None else jnp.exp((E + PV) * iRT)
        eta_disl = 0.5 / A_safe * inv_safe ** (1.0 - n) * expo

    # diffusion creep: linear in stress, same form for either invariant
    Ad = _bcast(m.diff_A, invII)
    Ed = _bcast(m.diff_E, invII)
    Vd = _bcast(m.diff_V, invII)
    md = _bcast(m.diff_m, invII)
    d = _bcast(m.grain_size, invII)
    has_diff = Ad > 0
    Ad_safe = jnp.where(has_diff, Ad, 1.0)
    PVd = 0.0 if P is None else P[..., None] * Vd
    expo_d = 1.0 if iRT is None else jnp.exp((Ed + PVd) * iRT)
    eta_diff = 0.5 / Ad_safe * d**md * expo_d

    # grain-boundary sliding: power law with a grain-size factor, invertible
    # exactly like dislocation creep (GeoParams GrainBoundarySliding)
    Ag = _bcast(m.gbs_A, invII)
    ng = _bcast(m.gbs_n, invII)
    mg = _bcast(m.gbs_m, invII)
    Eg = _bcast(m.gbs_E, invII)
    Vg = _bcast(m.gbs_V, invII)
    has_gbs = Ag > 0
    Ag_safe = jnp.where(has_gbs, Ag, 1.0)
    PVg = 0.0 if P is None else P[..., None] * Vg
    if mode == "eps":
        expo_g = 1.0 if iRT is None else jnp.exp((Eg + PVg) * iRT / ng)
        eta_gbs = (
            0.5 * Ag_safe ** (-1.0 / ng) * d ** (mg / ng)
            * inv_safe ** (1.0 / ng - 1.0) * expo_g
        )
    else:
        expo_g = 1.0 if iRT is None else jnp.exp((Eg + PVg) * iRT)
        eta_gbs = 0.5 / Ag_safe * d**mg * inv_safe ** (1.0 - ng) * expo_g

    # Peierls creep: ε̇ = A τⁿ exp(−S·(1−(τ/τP)^o)^q), S = E/(RT)
    Ap = _bcast(m.peierls_A, invII)
    np_ = _bcast(m.peierls_n, invII)
    Ep = _bcast(m.peierls_E, invII)
    qp = _bcast(m.peierls_q, invII)
    op = _bcast(m.peierls_o, invII)
    tauP = _bcast(m.peierls_tauP, invII)
    has_pei = Ap > 0
    Ap_safe = jnp.where(has_pei, Ap, 1.0)
    S = 0.0 if iRT is None else Ep * iRT
    if mode == "tau":
        # direct: η = τ / (2 ε̇(τ))
        x = jnp.clip(inv_safe / tauP, 0.0, 1.0 - 1e-12)
        rate = Ap_safe * inv_safe**np_ * jnp.exp(-S * (1.0 - x**op) ** qp)
        eta_pei = inv_safe / (2.0 * jnp.maximum(rate, tiny))
    else:
        # invert τ(ε̇) with a fixed Newton loop on ln τ:
        #   f(lnτ) = ln A + n·lnτ − S(1−(τ/τP)^o)^q − ln ε̇
        #   f'     = n + S·q·o·(1−x^o)^(q−1)·x^o,  x = τ/τP  (monotone ↑)
        ln_eps = jnp.log(inv_safe)
        ln_tauP = jnp.log(jnp.where(jnp.isinf(tauP), 1e30, tauP))
        lt = ln_tauP + jnp.log(0.5)  # start mid-barrier
        ln_A = jnp.log(Ap_safe)
        for _ in range(30):
            x = jnp.clip(jnp.exp(lt - ln_tauP), 1e-12, 1.0 - 1e-9)
            base = 1.0 - x**op
            f = ln_A + np_ * lt - S * base**qp - ln_eps
            fp = np_ + S * qp * op * base ** (qp - 1.0) * x**op
            lt = lt - f / fp
            lt = jnp.minimum(lt, ln_tauP - 1e-9)  # stay below the barrier
        tau_pei = jnp.exp(lt)
        eta_pei = tau_pei / (2.0 * inv_safe)

    inv_eta = (
        jnp.where(has_disl, 1.0 / eta_disl, 0.0)
        + jnp.where(has_diff, 1.0 / eta_diff, 0.0)
        + jnp.where(has_gbs, 1.0 / eta_gbs, 0.0)
        + jnp.where(has_pei, 1.0 / eta_pei, 0.0)
    )
    any_creep = has_disl | has_diff | has_gbs | has_pei
    eta_p = jnp.where(any_creep, 1.0 / jnp.maximum(inv_eta, tiny), eta0)

    # harmonic phase blend with the reference's dominant-phase early exit
    # (compute_phase_viscosity, Viscosity.jl:600-619: ratio > 0.999 returns
    # that phase's viscosity exactly — also keeps one-hot cells bit-exact)
    if phase_ratios is None:
        return eta_p[..., 0]
    harm = 1.0 / jnp.maximum(
        jnp.sum(phase_ratios / jnp.maximum(eta_p, tiny), axis=-1), tiny
    )
    idx = jnp.argmax(phase_ratios, axis=-1)
    eta_full = jnp.broadcast_to(eta_p, phase_ratios.shape)
    eta_dom = jnp.take_along_axis(eta_full, idx[..., None], axis=-1)[..., 0]
    dominant = jnp.max(phase_ratios, axis=-1) > 0.999
    return jnp.where(dominant, eta_dom, harm)


def shared_powerlaw_exponent(material):
    """Static collapse check for the tau-mode creep table.

    Returns the shared stress power ``m = n − 1`` of the per-cell reciprocal
    form ``1/η(τII) = A + B·τII^m`` when the stack's creep mechanisms
    collapse to it (dislocation creep with one shared exponent ``n`` across
    all phases that have it, plus the stress-independent diffusion creep and
    linear-η0 phases); ``0.0`` when only diffusion creep is present; ``None``
    when the table does NOT collapse (Peierls/GBS mechanisms, or mixed
    dislocation exponents) *or* when it is purely linear (callers use the
    cheaper constant-target path then). Must be called with concrete
    (non-traced) material leaves.
    """
    import numpy as np

    p = _as_stack(material).params
    if np.any(np.asarray(p.peierls_A) > 0) or np.any(np.asarray(p.gbs_A) > 0):
        return None
    disl_A = np.asarray(p.disl_A)
    ns = np.asarray(p.disl_n)[disl_A > 0]
    if ns.size == 0:
        return 0.0 if np.any(np.asarray(p.diff_A) > 0) else None
    if not np.all(ns == ns.flat[0]):
        return None
    return float(ns.flat[0]) - 1.0


def powerlaw_recip_coeffs(material, shape_like: Array, T, phase_ratios):
    """Chunk-invariant per-cell coefficients (A, B) of the collapsed
    tau-mode viscosity ``1/η(τII) = A + B·τII^m``.

    Harmonic blending is linear in reciprocals, so with phase ratios and T
    frozen the blend over phases collapses exactly:
    ``Σ_p r_p/η_p(τ) = Σ_p r_p·(a_p + b_p·τ^m) = A + B·τ^m`` with
    ``b_p = 2·A_disl·exp(−E/(R·T))`` (tau-mode reciprocal of
    :func:`phase_viscosity`'s ``eta_disl``), ``a_p`` the stress-independent
    part (diffusion creep, or ``1/η0`` for creep-free phases). The
    dominant-phase early exit (ratio > 0.999 → that phase exactly,
    Viscosity.jl:600-619) collapses per cell the same way. Valid only when
    :func:`shared_powerlaw_exponent` is not ``None``.
    """
    p = _as_stack(material).params
    ref = shape_like
    tiny = jnp.finfo(ref.dtype).tiny
    A = _bcast(p.disl_A, ref)
    E = _bcast(p.disl_E, ref)
    Ad = _bcast(p.diff_A, ref)
    Ed = _bcast(p.diff_E, ref)
    md = _bcast(p.diff_m, ref)
    d = _bcast(p.grain_size, ref)
    eta0 = _bcast(p.eta0, ref)
    if T is None:
        iRT = 0.0
    else:
        iRT = 1.0 / (R_GAS * jnp.maximum(T[..., None], 1e-30))
    has_disl = A > 0
    has_diff = Ad > 0
    b_p = jnp.where(has_disl, 2.0 * A * jnp.exp(-E * iRT), 0.0)
    a_diff = jnp.where(has_diff, 2.0 * Ad * d ** (-md) * jnp.exp(-Ed * iRT), 0.0)
    any_creep = has_disl | has_diff
    a_p = jnp.where(any_creep, a_diff, 1.0 / jnp.maximum(eta0, tiny))
    a_p = jnp.broadcast_to(a_p, ref.shape + (a_p.shape[-1],))
    b_p = jnp.broadcast_to(b_p, ref.shape + (b_p.shape[-1],))
    if phase_ratios is None:
        return a_p[..., 0], b_p[..., 0]
    A_cell = jnp.sum(phase_ratios * a_p, axis=-1)
    B_cell = jnp.sum(phase_ratios * b_p, axis=-1)
    idx = jnp.argmax(phase_ratios, axis=-1)[..., None]
    dominant = jnp.max(phase_ratios, axis=-1) > 0.999
    a_dom = jnp.take_along_axis(a_p, idx, axis=-1)[..., 0]
    b_dom = jnp.take_along_axis(b_p, idx, axis=-1)[..., 0]
    return (
        jnp.where(dominant, a_dom, A_cell),
        jnp.where(dominant, b_dom, B_cell),
    )


def correct_phase_ratio(phase_ratios: Array, air_phase: int) -> Array:
    """Zero the air-phase slot and renormalize over the rock phases
    (reference correct_phase_ratio, Viscosity.jl:638-650). Pure-air cells
    keep their air-one-hot ratios (deviation from the reference, which
    returns all-zero ratios there — the zero-ratio harmonic blend is
    1/0 = ∞, and without a finite viscosity cutoff the maxloc ητ
    preconditioner spreads that overflow into VALID interface cells and the
    pressure update explodes; the miniapps run cutoff (-Inf, Inf)). Those
    cells are masked out of the variational system either way — only the
    bounded maxloc spillover of the air viscosity survives."""
    nphase = phase_ratios.shape[-1]
    mask = jnp.arange(nphase) != air_phase
    corrected = phase_ratios * mask
    total = jnp.sum(corrected, axis=-1, keepdims=True)
    pure_air = phase_ratios[..., air_phase] > 1.0 - 1.0e-12
    out = corrected / jnp.maximum(total, jnp.finfo(corrected.dtype).tiny)
    return jnp.where(pure_air[..., None], phase_ratios, out)


def compute_viscosity_fields(
    eta: Array,
    eta_v: Array,
    material,
    xx: Array,
    yy: Array,
    xy_c: Array,
    xx_v: Array,
    yy_v: Array,
    xy_v: Array,
    phase_ratios_center,
    phase_ratios_vertex,
    T: Optional[Array] = None,
    T_v: Optional[Array] = None,
    mode: str = "eps",
    relaxation: float = 1.0,
    cutoff: Tuple[float, float] = (-jnp.inf, jnp.inf),
    P: Optional[Array] = None,
    P_v: Optional[Array] = None,
    air_phase: Optional[int] = None,
    plastic_in_tau: bool = False,
):
    """Update (η centers, ηv vertices) from the tensor fields.

    Mirrors compute_viscosity_kernel! (Viscosity.jl:371-418): the invariant at
    centers uses (xx, yy, xy_c) directly; at vertices (xx_v, yy_v, xy).
    With ``air_phase`` set, the air slot is excluded from the phase blend
    (Viscosity.jl:403-404, used by the variational free-surface solvers).

    ``plastic_in_tau=True`` (PARITY.md hypothesis #2, tested round 5):
    composes the regularized plastic element into the τII-mode composite
    strain rate the way GeoParams' ``compute_viscosity_τII`` would if the
    DruckerPrager_regularised element contributes its constitutive inverse
    ε̇_pl(τII) = max(τII − P·sinφ − C·cosφ, 0)/(2·η_reg):
    η = τII / (2·(ε̇_visc + ε̇_pl)). Requires ``mode="tau"`` and ``P``/
    ``P_v``."""
    if air_phase is not None:
        phase_ratios_center = correct_phase_ratio(phase_ratios_center, air_phase)
        phase_ratios_vertex = correct_phase_ratio(phase_ratios_vertex, air_phase)
    eps0_c = jnp.where((xx == 0) & (yy == 0) & (xy_c == 0), jnp.finfo(xx.dtype).eps, 0.0)
    II_c = second_invariant(xx + eps0_c, yy - eps0_c, xy_c)
    eta_new = phase_viscosity(material, II_c, T, phase_ratios_center, mode, P=P)
    if plastic_in_tau:
        eta_new = _compose_plastic_tau(
            material, eta_new, II_c, P, phase_ratios_center)
    eta_new = continuation_linear(eta_new, eta, relaxation)
    eta_new = jnp.clip(eta_new, cutoff[0], cutoff[1])

    eps0_v = jnp.where((xx_v == 0) & (yy_v == 0) & (xy_v == 0), jnp.finfo(xx.dtype).eps, 0.0)
    II_v = second_invariant(xx_v + eps0_v, yy_v - eps0_v, xy_v)
    eta_v_new = phase_viscosity(material, II_v, T_v, phase_ratios_vertex, mode, P=P_v)
    if plastic_in_tau:
        eta_v_new = _compose_plastic_tau(
            material, eta_v_new, II_v, P_v, phase_ratios_vertex)
    eta_v_new = continuation_linear(eta_v_new, eta_v, relaxation)
    eta_v_new = jnp.clip(eta_v_new, cutoff[0], cutoff[1])
    return eta_new, eta_v_new


def _compose_plastic_tau(material, eta_visc, invII, P, phase_ratios):
    """Series-compose the regularized plastic element into the τII-mode
    viscosity (PARITY.md hypothesis #2): η = τII/(2(ε̇_visc + ε̇_pl)) with
    ε̇_pl = max(τII − P·sinφ − C·cosφ, 0)/(2η_reg)."""
    from justrelax_tpu.rheology.plasticity import plastic_params_phase

    pp = plastic_params_phase(material, jnp.zeros_like(invII), phase_ratios)
    Pc = jnp.zeros_like(invII) if P is None else P
    F = invII - Pc * pp.sinphi - pp.C_cosphi
    eps_pl = jnp.maximum(F, 0.0) / (2.0 * jnp.maximum(pp.eta_reg, 1e-30))
    denom = invII / jnp.maximum(eta_visc, 1e-30) + 2.0 * eps_pl
    eta_comp = invII / jnp.maximum(denom, 1e-30)
    return jnp.where(pp.is_pl & (invII > 0), eta_comp, eta_visc)
