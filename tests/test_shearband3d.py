"""3D VEP shear bands (reference miniapps/benchmarks/stokes3D/shear_band/
ShearBand3D.jl; the reference tests this family only under MPI,
test_shearband3D_MPI.jl — physics oracles here are the Maxwell buildup, the
regularized DP stress cap, and frozen goldens from the converged run)."""

import numpy as np
import pytest


@pytest.mark.slow
def test_shearband3d():
    from justrelax_tpu.models.shearband3d import run

    stokes, info, tau, sol = run(n=12, nt=14)
    assert float(info.err) < 1.0e-5

    # pre-yield: max tauII tracks the Maxwell curve from above (inclusion
    # stress amplification), within 12%
    for got, want in zip(tau[:6], sol[:6]):
        assert want <= got < 1.15 * want

    # post-yield: capped near the regularized DP envelope tau_y = 1.6
    assert 1.6 < tau[-1] < 1.66
    # plastic strain accumulated and is finite
    EII = np.asarray(stokes.EII_pl)
    assert EII.max() > 0.1 and np.isfinite(EII).all()

    # frozen goldens (round 2, CPU/x64)
    np.testing.assert_allclose(tau[-1], 1.625106, atol=1e-4)
    np.testing.assert_allclose(EII.max(), 0.3258544082022995, rtol=1e-5)
