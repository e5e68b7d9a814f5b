"""2D subduction application demo (reference miniapps/subduction/2D; the
reference miniapp has no test oracle — asserts here are physical)."""

import numpy as np
import pytest

from justrelax_tpu.models import subduction2d


@pytest.mark.slow
def test_subduction2d_physics():
    stokes, thermal, info, phases = subduction2d.run(nx=64, ny=24, nt=2)
    h = np.asarray(info.err_history)
    valid = h[np.isfinite(h)]
    # steady convergence of a hard-contrast variational solve
    assert valid[-1] < 0.05 * valid[0]
    # slab sinks at a plate-tectonic rate (cm/yr scale)
    Vy = np.asarray(stokes.V.Vy)
    Vy_c = 0.5 * (Vy[1:-1, :-1] + Vy[1:-1, 1:])
    slab = phases == subduction2d.LITH
    v_cm_yr = Vy_c[slab].mean() * 100 * 365.25 * 24 * 3600
    assert -100.0 < v_cm_yr < -0.1
    # sticky air (masked nullspace region) stays nearly at rest relative to
    # the slab
    air = phases == subduction2d.AIR
    assert np.abs(Vy_c[air]).max() < 50 * np.abs(Vy_c[slab]).mean()

    # frozen golden values (round 2, CPU/x64)
    np.testing.assert_allclose(v_cm_yr, -8.12271522695263, rtol=1e-5)
    np.testing.assert_allclose(np.abs(Vy).max(), 2.776206296426089e-08, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(thermal.T).mean(), 1561.9627799560321, rtol=1e-6)
