"""Nondimensionalized layered convection (reference
miniapps/convection/Particles2D_nonDim): the GEO_units workflow end-to-end.

The reference miniapp has no test oracle; asserts here are physical plus
frozen golden values from the converged CPU/x64 run.
"""

import numpy as np
import pytest

from justrelax_tpu.utils.units import dimensionalize, nondimensionalize


@pytest.mark.slow
def test_layered_convection_nondim():
    from justrelax_tpu.models.layered_convection_nondim import run

    stokes, thermal, particles, phase, info, u, vmax = run(
        nx=16, ny=16, nt=2, nxcell=12, max_xcell=24, min_xcell=6
    )
    assert float(info.err) < 1.0e-5

    # nondimensional temperatures stay inside the geotherm + anomaly window
    T = np.asarray(thermal.T)
    T_top = nondimensionalize(273.0, "temperature", u)
    T_bot = nondimensionalize(1492.0, "temperature", u)
    dT = nondimensionalize(200.0, "temperature", u)
    assert T.min() > 0.5 * T_top and T.max() < T_bot + dT + 0.1

    # the hot seed drives upward flow; all three layers persist on particles
    Vy = np.asarray(stokes.V.Vy)
    assert Vy.max() > 0.0
    act = np.asarray(particles.active)
    assert set(np.unique(np.asarray(phase)[act])) == {0.0, 1.0, 2.0}

    # dimensionalization roundtrip and physical plausibility of the ascent
    v_nd = max(vmax)
    v_si = dimensionalize(v_nd, "velocity", u)
    assert np.isclose(nondimensionalize(v_si, "velocity", u), v_nd, rtol=1e-12)
    cm_yr = v_si * 100 * 365.25 * 24 * 3600
    assert 1.0e-6 < cm_yr < 10.0  # stiff-lithosphere creep ascent

    # frozen goldens (round 2, CPU/x64)
    np.testing.assert_allclose(Vy.max(), 4.160546429279427e-06, rtol=1e-5)
    np.testing.assert_allclose(
        T.max(), 1.5278565116446254, rtol=1e-6
    )
