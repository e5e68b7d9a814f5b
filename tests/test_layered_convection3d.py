"""3D layered particle convection (reference
miniapps/convection/Particles3D/Layered_convection3D.jl — no reference test
oracle; physics asserts + frozen goldens from the converged CPU/x64 run)."""

import numpy as np
import pytest


@pytest.mark.slow
def test_layered_convection3d():
    from justrelax_tpu.models.layered_convection3d import run

    stokes, thermal, particles, phase, info, vmax = run(
        nx=12, ny=12, nz=12, nt=2, nxcell=6, max_xcell=12, min_xcell=3
    )
    assert float(info.err) < 1.0e-5

    # all three layers persist on particles through transport/injection
    act = np.asarray(particles.active)
    assert set(np.unique(np.asarray(phase)[act])) == {0.0, 1.0, 2.0}

    # temperatures stay inside geotherm + anomaly + Dirichlet-ghost bounds
    T = np.asarray(thermal.T)[1:-1, 1:-1, 1:-1]
    assert 270.0 < T.min() and T.max() < 1492.0 + 251.0

    # the hot sphere drives upward flow in the first (elastic-transient) step
    Vz = np.asarray(stokes.V.Vz)
    assert Vz.max() > 0.0
    assert np.isfinite(Vz).all()

    # frozen goldens (round 2, CPU/x64)
    np.testing.assert_allclose(vmax[0], 7.086241845485486e-11, rtol=1e-5)
    np.testing.assert_allclose(
        float(np.asarray(thermal.T).max()), 1542.5441453335352, rtol=1e-6
    )
