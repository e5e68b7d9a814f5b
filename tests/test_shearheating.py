"""Shear heating benchmark (reference test_shearheating2D.jl:210-216)."""

import numpy as np
import pytest

from justrelax_tpu.models import shearheating


@pytest.mark.slow
def test_shearheating2d():
    stokes, thermal, info = shearheating.run(nx=32, ny=32, nt=5)
    assert float(info.err) < 1.0e-4
    H = np.asarray(thermal.shear_heating)
    assert (H >= 0).all()
    # dissipation concentrates in/around the weak inclusion
    assert H.max() > 5 * np.median(H)
