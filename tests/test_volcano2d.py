"""Volcano2D / Caldera coupled model (reference test_Volcano2D.jl:382-401:
converged residual < 1e-4 at 16x8, 2 steps)."""

import numpy as np
import pytest


@pytest.mark.slow
def test_volcano2d_coupled():
    from justrelax_tpu.models.volcano2d import run

    stokes, thermal, particles, chain, phi_m, info = run(nx=16, ny=8, nt=2)
    # reference oracle
    assert float(info.err) < 1.0e-4
    assert int(info.iters) < 100_000

    Vy = np.asarray(stokes.V.Vy)
    assert np.isfinite(Vy).all()
    # topography (marker chain) stays bounded and single-valued
    y = np.asarray(chain.y)
    assert np.isfinite(y).all()
    assert np.abs(y).max() < 2.0e3  # < 2 km deflection after 2 steps
    # melt present in the chamber cells
    assert float(np.asarray(phi_m).max()) > 1.0e-3
    # temperatures stay physical
    T = np.asarray(thermal.T)
    assert T.min() > 200.0 and T.max() < 1800.0
    # particles stayed in-domain and active
    assert int(np.asarray(particles.active).sum()) > 0
    px = np.asarray(particles.px)[np.asarray(particles.active)]
    assert px.min() >= -1.0 and px.max() <= 30.0e3 + 1.0

    # frozen golden values (round 5, CPU/x64): regressions in the coupled
    # variational solve / marker chain / melt path move these immediately.
    # (Refrozen in round 5 after wiring the per-step marker-chain
    # topography correction into the coupled loop — Caldera2D.jl:194,435 →
    # src/phases/topography_correction.jl:36-90: rock particles above the
    # advected chain / air particles below it are deactivated each step and
    # re-seeded by injection with the chain-implied phase, sharpening the
    # surface the buoyancy term sees. Previous r03 values: Vy_max
    # 1.1248e-05, y [-248.83, 393.56], T_min 272.7168, tauII 1.6427e7.)
    np.testing.assert_allclose(np.abs(Vy).max(), 1.3946289129149216e-05, rtol=1e-5)
    np.testing.assert_allclose(y.min(), -263.5669607300024, rtol=1e-5)
    np.testing.assert_allclose(y.max(), 323.05486911291047, rtol=1e-5)
    np.testing.assert_allclose(float(np.asarray(phi_m).max()), 0.7155154808992358, rtol=1e-5)
    np.testing.assert_allclose(T.min(), 272.7302522410007, rtol=1e-6)
    np.testing.assert_allclose(float(np.asarray(stokes.tau.II).max()), 18340921.940666106, rtol=1e-5)
