"""3D thermal diffusion golden values (reference test_diffusion3D.jl:150-151
and test_diffusion3D_multiphase.jl:214-215)."""

import numpy as np
import pytest

from justrelax_tpu.models import diffusion3d


@pytest.mark.slow
def test_diffusion3d_golden():
    thermal, info = diffusion3d.run(n=32)
    T = np.asarray(thermal.T)
    assert T[15, 15, 15] == pytest.approx(1813.2470160788096, rel=1.0e-3)
    assert T[16, 16, 16] == pytest.approx(1831.2568044653274, rel=1.0e-3)
    assert float(info.err) < 1.0e-5


@pytest.mark.slow
def test_diffusion3d_multiphase_golden():
    thermal, info = diffusion3d.run_multiphase(n=32)
    T = np.asarray(thermal.T)
    assert T[15, 15, 15] == pytest.approx(1816.8262937737384, rel=1.0e-3)
    assert T[16, 16, 16] == pytest.approx(1834.4197141500213, rel=1.0e-3)
    assert float(info.err) < 1.0e-5
