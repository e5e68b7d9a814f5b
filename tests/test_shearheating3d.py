"""3D shear heating (Duretz et al. 2014; reference test_shearheating3D.jl:
err < 1e-4 and shear_heating >= 0)."""

import numpy as np
import pytest


@pytest.mark.slow
def test_shearheating3d():
    from justrelax_tpu.models.shearheating3d import run

    stokes, thermal, info = run(nx=12, ny=12, nz=12, nt=2, rc=8.0e3)
    assert float(info.err) < 1.0e-4
    H = np.asarray(thermal.shear_heating)
    assert (H >= 0.0).all()
    assert H.max() > 0.0
    # dissipation heats the domain above the initial 673 K
    T = np.asarray(thermal.T)
    assert T.max() > 673.0 + 1.0
    # heating is concentrated at/around the weak inclusion (the inclusion
    # deforms faster: higher eps * tau there than in the far field)
    assert H[6, 6, 4] > H[1, 1, 1]
