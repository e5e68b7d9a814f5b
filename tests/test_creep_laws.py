"""Creep-law mechanisms: activation volume, diffusion creep, composites,
named presets (reference rheology menu, SURVEY §GeoParams; Viscosity.jl).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from justrelax_tpu.rheology.materials import (
    CREEP_PRESETS,
    Material,
    MaterialStack,
    creep_preset,
)
from justrelax_tpu.rheology.viscosity import R_GAS, phase_viscosity

ONES = jnp.ones((3, 3))


def _eta(material, eII=1e-15, T=1600.0, P=None, mode="eps"):
    stack = MaterialStack.make([material])
    pr = jnp.ones((3, 3, 1))
    Pf = None if P is None else ONES * P
    return float(
        phase_viscosity(stack, ONES * eII, ONES * T, pr, mode, P=Pf)[1, 1]
    )


def test_dislocation_activation_volume():
    m0 = Material(disl_A=1e-16, disl_n=3.5, disl_E=530e3)
    mV = Material(disl_A=1e-16, disl_n=3.5, disl_E=530e3, disl_V=14e-6)
    T, Pr = 1600.0, 3.0e9
    e0 = _eta(m0, T=T, P=Pr)
    eV = _eta(mV, T=T, P=Pr)
    # analytic ratio exp(P·V/(nRT))
    expect = np.exp(Pr * 14e-6 / (3.5 * R_GAS * T))
    np.testing.assert_allclose(eV / e0, expect, rtol=1e-12)
    # without P the volume term is inert
    np.testing.assert_allclose(_eta(mV, T=T), e0, rtol=1e-12)


def test_diffusion_creep_grain_size():
    m = Material(diff_A=1.5e-15, diff_m=3.0, diff_E=375e3, grain_size=1e-3)
    m_fine = Material(diff_A=1.5e-15, diff_m=3.0, diff_E=375e3, grain_size=1e-4)
    # η ∝ d^m: 10x smaller grains → 1000x weaker
    np.testing.assert_allclose(_eta(m) / _eta(m_fine), 1e3, rtol=1e-10)
    # linear: viscosity independent of strain rate
    np.testing.assert_allclose(_eta(m, eII=1e-13), _eta(m, eII=1e-16), rtol=1e-12)
    # analytic value: η = d^m/(2A) exp(E/RT)
    expect = (1e-3) ** 3 / (2 * 1.5e-15) * np.exp(375e3 / (R_GAS * 1600.0))
    np.testing.assert_allclose(_eta(m), expect, rtol=1e-12)


def test_composite_harmonic():
    md = Material(disl_A=1e-16, disl_n=3.5, disl_E=530e3)
    mf = Material(diff_A=1.5e-15, diff_m=3.0, diff_E=375e3)
    both = Material(
        disl_A=1e-16, disl_n=3.5, disl_E=530e3,
        diff_A=1.5e-15, diff_m=3.0, diff_E=375e3,
    )
    e1, e2, e12 = _eta(md), _eta(mf), _eta(both)
    np.testing.assert_allclose(1 / e12, 1 / e1 + 1 / e2, rtol=1e-12)
    assert e12 < min(e1, e2)


def test_linear_fallback_unchanged():
    m = Material(eta0=1.0e21)
    assert _eta(m) == 1.0e21


def test_presets():
    kw = creep_preset(
        "wet_olivine_disl_Hirth_2003", "wet_olivine_diff_Hirth_2003"
    )
    m = Material(**kw)
    # wet-olivine composite at hot asthenospheric conditions is diffusion-
    # dominated and very weak (C_OH = 1000 folded into A): order 1e16-1e18
    eta = _eta(m, eII=1e-15, T=1700.0, P=3.0e9)
    assert 1.0e15 < eta < 1.0e19
    # colder: dislocation/diffusion both stiffen by orders of magnitude
    assert _eta(m, eII=1e-15, T=1300.0, P=3.0e9) > 100.0 * eta
    # dry olivine is stiffer than wet at the same conditions
    m_dry = Material(**creep_preset(
        "dry_olivine_disl_Hirth_2003", "dry_olivine_diff_Hirth_2003"
    ))
    assert _eta(m_dry, eII=1e-15, T=1700.0, P=3.0e9) > eta
    with pytest.raises(KeyError):
        creep_preset("nonexistent_law")
    assert len(CREEP_PRESETS) >= 4


def test_peierls_tau_mode_analytic():
    """mode="tau": η = τ/(2ε̇) with ε̇ = A τⁿ exp(−E/RT·(1−(τ/τP)^o)^q)."""
    A, n, E, q, o, tauP = 1.4e-19, 2.0, 320e3, 1.0, 0.5, 5.9e9
    m = Material(peierls_A=A, peierls_n=n, peierls_E=E, peierls_q=q,
                 peierls_o=o, peierls_tauP=tauP)
    T, tau = 900.0, 1.0e9
    rate = A * tau**n * np.exp(-E / (R_GAS * T) * (1 - (tau / tauP) ** o) ** q)
    want = tau / (2 * rate)
    np.testing.assert_allclose(_eta(m, eII=tau, T=T, mode="tau"), want, rtol=1e-12)


def test_peierls_eps_mode_newton_roundtrip():
    """mode="eps": the Newton inversion reproduces τ* from ε̇(τ*)."""
    A, n, E, q, o, tauP = 1.4e-19, 2.0, 320e3, 1.0, 0.5, 5.9e9
    m = Material(peierls_A=A, peierls_n=n, peierls_E=E, peierls_q=q,
                 peierls_o=o, peierls_tauP=tauP)
    for T in (700.0, 900.0, 1100.0):
        for tau_star in (3.0e8, 1.0e9, 3.0e9):
            rate = A * tau_star**n * np.exp(
                -E / (R_GAS * T) * (1 - (tau_star / tauP) ** o) ** q
            )
            eta = _eta(m, eII=rate, T=T, mode="eps")
            np.testing.assert_allclose(2.0 * eta * rate, tau_star, rtol=1e-8)


def test_gbs_analytic_and_grain_size():
    """GBS: η = ½A^(−1/n) d^(m/n) ε̇^(1/n−1) exp((E+PV)/(nRT))."""
    A, n, mexp, E = 1e-24, 2.9, 0.7, 445e3
    m = Material(gbs_A=A, gbs_n=n, gbs_m=mexp, gbs_E=E, grain_size=1e-3)
    T, eII = 1400.0, 1e-14
    want = 0.5 * A ** (-1 / n) * (1e-3) ** (mexp / n) * eII ** (1 / n - 1) * np.exp(
        E / (n * R_GAS * T)
    )
    np.testing.assert_allclose(_eta(m, eII=eII, T=T), want, rtol=1e-10)
    # smaller grains → weaker, by (d1/d2)^(m/n)
    m_fine = Material(gbs_A=A, gbs_n=n, gbs_m=mexp, gbs_E=E, grain_size=1e-4)
    np.testing.assert_allclose(
        _eta(m, eII=eII, T=T) / _eta(m_fine, eII=eII, T=T),
        10.0 ** (mexp / n), rtol=1e-10,
    )
    # tau-mode consistency: η_eps(ε̇) with ε̇ = ε̇(τ) equals η_tau(τ)
    tau = 2 * _eta(m, eII=eII, T=T) * eII
    np.testing.assert_allclose(_eta(m, eII=tau, T=T, mode="tau"),
                               _eta(m, eII=eII, T=T), rtol=1e-8)


def test_peierls_composite_with_dislocation():
    """Low T → Peierls dominates; high T → dislocation dominates; the
    harmonic composite is always weaker than each member."""
    kw = dict(disl_A=1e-16, disl_n=3.5, disl_E=530e3,
              peierls_A=1.4e-19, peierls_n=2.0, peierls_E=320e3,
              peierls_q=1.0, peierls_o=0.5, peierls_tauP=5.9e9)
    m_both = Material(**kw)
    m_disl = Material(disl_A=1e-16, disl_n=3.5, disl_E=530e3)
    m_pei = Material(peierls_A=1.4e-19, peierls_n=2.0, peierls_E=320e3,
                     peierls_q=1.0, peierls_o=0.5, peierls_tauP=5.9e9)
    for T in (700.0, 1700.0):
        e_both = _eta(m_both, eII=1e-13, T=T)
        e_d = _eta(m_disl, eII=1e-13, T=T)
        e_p = _eta(m_pei, eII=1e-13, T=T)
        assert e_both <= min(e_d, e_p) * (1 + 1e-12)
        np.testing.assert_allclose(1 / e_both, 1 / e_d + 1 / e_p, rtol=5e-2)


def test_new_presets_load_and_are_finite():
    for name in ("dry_olivine_peierls_Mei_2010", "dry_olivine_gbs_Hansen_2011",
                 "dry_olivine_peierls_Goetze_1979"):
        m = Material(**creep_preset(name))
        e = _eta(m, eII=1e-14, T=1000.0)
        assert np.isfinite(e) and e > 0
    # Mei 2010 Peierls at cold lithosphere conditions caps viscosity far
    # below the unbounded dislocation extrapolation
    m_p = Material(**creep_preset("dry_olivine_peierls_Mei_2010",
                                  "dry_olivine_disl_Hirth_2003"))
    m_d = Material(**creep_preset("dry_olivine_disl_Hirth_2003"))
    assert _eta(m_p, eII=1e-14, T=600.0) < _eta(m_d, eII=1e-14, T=600.0)
