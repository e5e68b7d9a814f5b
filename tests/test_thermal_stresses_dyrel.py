"""Thermal-stress magma chamber through DYREL
(models/thermal_stresses_dyrel.py ≙
miniapps/DYREL2D/thermal_stress/Thermal_Stress_Magma_Chamber_nondim.jl).

Oracle: the APT variant (models/thermal_stresses.py, itself
analytically-anchored in tests/test_thermal_stresses.py) on the identical
configuration. Measured r04 agreement at 32², nt=2:

  max |Vy|:          DYREL 2.7418e-11 vs APT 2.7632e-11  (0.8%)
  chamber P max:     DYREL 11.37 MPa  vs APT 12.30 MPa   (7.6%)
  P min (rim lobe):  DYREL −28.4 MPa  vs APT −19.2 MPa   — the negative
  rim lobe is convention-sensitive at the 3-decade chamber viscosity jump
  (unchanged from eps=1e-5 to 1e-6, so NOT convergence), hence only the
  robust quantities are asserted.

Also the regression record for the DYREL α·ΔT/dt RP source and for the
nondimensionalization requirement (module docstring: in SI units the
absolute exit branch certifies the zero state instantly).
"""

import numpy as np
import pytest

from justrelax_tpu.models import thermal_stresses_dyrel as m

MPA = 1.0e6


@pytest.mark.slow
def test_thermal_stresses_dyrel_vs_apt():
    from justrelax_tpu.models import thermal_stresses as apt

    sd, td, phi, info, chamber = m.run(nx=32, ny=32, nt=2)
    assert float(info.err) < 1.0e-4
    Pd = np.asarray(sd.P)
    Vyd = np.asarray(sd.V.Vy)
    assert np.isfinite(Pd).all() and np.isfinite(Vyd).all()

    # the chamber melts; by step 2 its interior has shed the initial
    # transient and DEpressurizes (ΔT < 0 inside after diffusion) while
    # the heated rim carries the positive thermal-stress lobe — so the
    # physics check is the K·α·ΔT pressure scale, not the sign layout
    assert 0.0 < float(np.asarray(phi).max()) <= 1.0
    # K·α·ΔT ~ 1.7e10 · 6e-5 · O(10 K) ~ 10 MPa
    assert 5.0 * MPA < Pd.max() < 25.0 * MPA
    assert Pd[chamber].max() < 0.0  # step-2 interior depressurization

    # frozen r04 goldens
    np.testing.assert_allclose(Pd.max(), 11.369 * MPA, rtol=2e-2)
    np.testing.assert_allclose(np.abs(Vyd).max(), 2.7418e-11, rtol=2e-2)

    # APT cross-check (measured gaps in module docstring)
    sa, ta, _, ia, _ = apt.run(nx=32, ny=32, nt=2)
    Pa, Vya = np.asarray(sa.P), np.asarray(sa.V.Vy)
    np.testing.assert_allclose(np.abs(Vyd).max(), np.abs(Vya).max(),
                               rtol=0.03)
    np.testing.assert_allclose(Pd.max(), Pa.max(), rtol=0.12)
    # field-level structural agreement (measured r04: P 0.973, Vy 0.988)
    cos = lambda a, b: float(  # noqa: E731
        np.dot(a.ravel(), b.ravel())
        / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos(Pd, Pa) > 0.95
    assert cos(Vyd, Vya) > 0.97
    # identical thermal stages ⇒ identical temperatures
    np.testing.assert_allclose(np.asarray(td.T), np.asarray(ta.T),
                               rtol=1e-10)
