"""2D thermal diffusion golden values (reference test_diffusion2D.jl:125-135)."""

import numpy as np
import pytest

from justrelax_tpu.models import diffusion2d


@pytest.mark.slow
def test_diffusion2d_golden():
    thermal, info = diffusion2d.run(nx=32, ny=32)
    T = np.asarray(thermal.T)
    nx_T, ny_T = T.shape
    assert T[nx_T // 2, ny_T // 2] == pytest.approx(1817.9448461176817, abs=1.0e-1)
    assert T[32 // 2, 32 // 2] == pytest.approx(1827.4674313638786, abs=1.0e-1)
    assert float(info.err) < 1.0e-8
