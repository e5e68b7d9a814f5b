"""DYREL shearband golden values (reference test_shearband2D_DYREL.jl:209-217).

Same parity status as the APT shearband (see PARITY.md): the solver
reproduces the reference formulas; residual ~0.4% differences vs the golden
extrema trace to GeoParams v0.7.17 internals. τII max matches to 2e-4.
"""

import numpy as np
import pytest

from justrelax_tpu.models import shearband_dyrel


@pytest.mark.slow
def test_shearband_dyrel():
    stokes, info, tau_max, sol, tau_II = shearband_dyrel.run(n=32, nt=10)
    assert float(info.err) < 1.0e-6
    assert sol[-1] == pytest.approx(1.8358, abs=1.0e-4)
    assert float(tau_II.max()) == pytest.approx(1.639, abs=1.0e-3)
    assert float(tau_II.min()) == pytest.approx(1.5383533580936255, abs=1.0e-2)
    assert tau_max[-1] == pytest.approx(1.6377101324888117, abs=5.0e-3)
    # self-tuned solve should converge in a few thousand iterations
    assert int(info.iters) < 20_000


@pytest.mark.slow
def test_shearband_dyrel_dpcap():
    """Dilatant DP + tension cap under DYREL
    (reference test_shearband2D_DPCap_DYREL.jl:192-205)."""
    stokes, info, tau_II = shearband_dyrel.run_dpcap(n=32, nt=10)
    assert float(info.err) < 1.0e-5
    tmax = float(np.asarray(tau_II).max())
    assert np.isfinite(tmax) and tmax < 2.0
    assert float(np.abs(np.asarray(stokes.eps_pl.xx)).max()) > 0.0
    assert float(np.abs(np.asarray(stokes.EVol_pl)).max()) > 0.0
    ev = np.asarray(stokes.eps_vol_pl)
    assert ev.min() >= 0.0
    assert ev.max() > 0.0
