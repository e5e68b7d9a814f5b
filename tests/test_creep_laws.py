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
