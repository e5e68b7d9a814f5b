"""3D subduction (reference miniapps/subduction/3D; the BASELINE.json
north-star configuration run serially — the same kernels are multi-chip
validated in tests/test_distributed3d.py)."""

import numpy as np
import pytest


@pytest.mark.slow
def test_subduction3d():
    from justrelax_tpu.models.subduction3d import run

    stokes, thermal, info, phases = run(nx=48, ny=8, nz=16, nt=2)
    assert float(info.err) < 1.0e-4
    Vz = np.asarray(stokes.V.Vz)
    assert np.isfinite(Vz).all()
    # slab sinks at plate-tectonic speed (cm/yr scale)
    cm_yr = 1.0e-2 / (365.25 * 24 * 3600)
    assert -20 * cm_yr < Vz.min() < -0.5 * cm_yr
    # interior temperatures physical after the coupled thermal step (ghost
    # layers hold 2*T_bc - T_in Dirichlet mirrors, excluded)
    T = np.asarray(thermal.T)[1:-1, 1:-1, 1:-1]
    assert 250.0 < T.min() and T.max() < 1800.0
    # y-invariance: the extruded setup stays ~2D (free-slip front/back)
    Vy = np.asarray(stokes.V.Vy)
    assert np.abs(Vy).max() < 0.05 * np.abs(Vz).max()

    # frozen golden values (round 2, CPU/x64)
    np.testing.assert_allclose(Vz.min(), -1.0311600516051363e-09, rtol=1e-5)
    np.testing.assert_allclose(Vz.max(), 4.863380641192766e-10, rtol=1e-5)
    np.testing.assert_allclose(T.min(), 429.1688847185895, rtol=1e-6)
