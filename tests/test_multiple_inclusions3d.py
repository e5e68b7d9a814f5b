"""MultipleInclusions3D: five weak-G spherical inclusions under 3D pure
shear (reference miniapps/benchmarks/stokes3D/shear_band/
MultipleInclusions3D.jl — script only, no reference test; goldens frozen
from the round-2 CPU/x64 run at 16³)."""

import numpy as np
import pytest


@pytest.mark.slow
def test_multiple_inclusions3d():
    from justrelax_tpu.models.shearband3d import run_multi

    stokes, info, tau, sol = run_multi(n=16, nt=14)

    assert float(info.err) < 1.0e-4

    # pre-yield: Maxwell buildup tracked within 2%
    for k in range(6):
        assert abs(tau[k] - sol[k]) / sol[k] < 0.02

    # post-yield: τ_xx capped below the unlimited VE curve, plasticity active
    assert tau[-1] < sol[-1]
    assert float(np.asarray(stokes.lam).max()) > 0.5

    # frozen goldens
    np.testing.assert_allclose(tau[0], 0.23733829, atol=1e-6)
    np.testing.assert_allclose(tau[-1], 1.62384172, atol=1e-5)
