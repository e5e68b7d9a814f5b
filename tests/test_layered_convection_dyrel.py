"""Layered convection through DYREL (models/layered_convection_dyrel.py ≙
miniapps/DYREL2D/convection/Layered_convection2D_DYREL.jl).

Oracle: the APT variant (models/layered_convection_nondim.py, itself
golden-tested in tests/test_layered_convection_nondim.py) run on the
IDENTICAL configuration. Measured r04 agreement of max |Vy| per step at
32² (f64, DYREL returning the certified break-after-check state):

  step 1:  DYREL 3.1098e-5  vs  APT 3.2067e-5   (3.1%)
  step 2:  DYREL 4.8768e-7  vs  APT 4.4046e-7   (10.7% — the damped
           post-transient flow is ~100× slower than step 1, so the two
           discretizations' small absolute differences loom larger)

The APT values are frozen here rather than recomputed (the APT model has
its own golden test); the DYREL values double as frozen regression goldens.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from justrelax_tpu.models import layered_convection_dyrel as m

# measured r04 oracles (32², nt=2, f64) — see module docstring
APT_VMAX = (3.2067e-5, 4.4046e-7)
DYREL_VMAX = (3.1098e-5, 4.8768e-7)


@pytest.mark.slow
def test_layered_convection_dyrel():
    stokes, thermal, particles, phase, info, u, vmax_hist = m.run(
        nx=32, ny=32, nt=2)

    # solver health
    assert bool(jnp.isfinite(stokes.V.Vy).all())
    assert bool(jnp.isfinite(thermal.T).all())
    assert float(info.err) < 1.0e-4

    # frozen DYREL goldens + APT cross-check per step (see module docstring
    # for the measured per-step gaps behind the 15% window)
    for k in range(2):
        np.testing.assert_allclose(vmax_hist[k], DYREL_VMAX[k], rtol=0.05)
        np.testing.assert_allclose(vmax_hist[k], APT_VMAX[k], rtol=0.15)

    # physics: convective circulation — comparable up- and downwelling
    # amplitudes coexist (a one-signed Vy field would mean a BC/buoyancy bug)
    Vy = np.asarray(stokes.V.Vy)
    assert Vy.max() > 0.2 * abs(Vy.min()) and Vy.min() < -0.2 * Vy.max()
    # (no η-structure check at step 2: the damped post-transient flow has
    # τII below every creep law's activation everywhere, so the converged η
    # legitimately sits at cutoff-max across the domain; the nonlinear
    # rheology itself is pinned by the APT cross-check above — a wrong
    # creep table shifts vmax far beyond the 10% window)
