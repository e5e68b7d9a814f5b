"""Multi-phase 2D diffusion goldens (reference test_diffusion2D_multiphase.jl)."""

import numpy as np
import pytest

from justrelax_tpu.models import diffusion2d_multiphase


@pytest.mark.slow
def test_diffusion2d_multiphase_golden():
    thermal, info = diffusion2d_multiphase.run(nx=32, ny=32)
    T = np.asarray(thermal.T)
    assert T[17, 17] == pytest.approx(1814.029, abs=1.0e-1)
    assert T[16, 16] == pytest.approx(1823.548, abs=1.0e-1)
    assert float(info.err) < 1.0e-5
