"""GlobalConvection2D_WENO5 miniapp
(reference miniapps/convection/GlobalConvection2D_WENO5.jl — a demo miniapp
with no golden values; assertions pin the physics the demo demonstrates)."""

import numpy as np
import pytest

from justrelax_tpu.models import global_convection2d as gc

YR = 3600.0 * 24.0 * 365.25


@pytest.mark.slow
def test_global_convection2d_weno5():
    geometry, stokes, thermal, info, t, eta_hist = gc.run(n=32, nt=3)
    # converged at the miniapp's tolerance (ϵ_abs/ϵ_rel = 1e-4)
    assert float(info.err) < 1.0e-4

    T = np.asarray(thermal.T)[1:-1, 1:-1]
    assert np.isfinite(T).all()
    # bounded by the hot bottom / cold top Dirichlet values
    assert T.min() >= 300.0 - 1.0 and T.max() <= 3.5e3 + 1.0

    # custom Arrhenius viscosity spans orders of magnitude within the cutoff
    eta_min, eta_max = eta_hist[-1]
    assert 1.0e16 <= eta_min < 1.0e21
    assert eta_max <= 1.0e24 + 1.0 and eta_max / eta_min > 1.0e3

    # the hot circular anomaly drives an upwelling: positive Vy above it at
    # mantle-convection speeds (mm-cm/yr)
    Vy = np.asarray(stokes.V.Vy)
    nx = T.shape[0]
    col = Vy[1 + nx // 2, :]
    vmax_cmyr = float(Vy.max()) * 100.0 * YR
    assert col.max() > 0.0
    assert 1.0e-3 < vmax_cmyr < 100.0

    # timestep is CFL-limited and time advances
    assert t > 0.0
