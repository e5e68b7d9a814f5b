"""Rising blob 3D (reference miniapps/convection/RisingBlob3D): particle-
tracked buoyant sphere rises at the Stokes-sphere velocity scale
V = (2/9)·|Δρ|·g·R²/η (observed within ~15%, finite box/resolution)."""

import numpy as np
import pytest


@pytest.mark.slow
def test_rising_blob3d():
    from justrelax_tpu.models.rising_blob3d import run

    d_rho, eta0, R = -100.0, 1.0e21, 0.12
    stokes, particles, phase, info, zc = run(
        n=16, nt=3, d_rho=d_rho, eta0=eta0, R=R
    )
    assert float(info.err) < 1.0e-6

    # monotonic rise of the blob centroid
    assert all(b > a for a, b in zip(zc, zc[1:]))

    # peak velocity near the analytic Stokes-sphere value
    v_stokes = 2.0 / 9.0 * abs(d_rho) * 9.81 * (R * 1.0e6) ** 2 / eta0
    vmax = float(np.asarray(stokes.V.Vz).max())
    assert 0.6 * v_stokes < vmax < 1.4 * v_stokes

    # blob stays coherent: phase-1 particles cluster around their centroid
    a = np.asarray(particles.active) & (np.asarray(phase) > 0.5)
    px = np.asarray(particles.px)[a]
    pz = np.asarray(particles.pz)[a]
    assert px.std() < 1.5 * R * 1.0e6
    assert pz.std() < 1.5 * R * 1.0e6
