"""Free-surface-stabilization miniapps (reference
miniapps/benchmarks/stokes2D/free_surface_stabilization/{RayleighTaylor2D,
PlumeFreeSurface_2D}.jl — no convergence asserts upstream; goldens frozen
from the round-2 CPU/x64 run)."""

import collections

import numpy as np
import pytest


@pytest.mark.slow
def test_rayleigh_taylor_variational():
    """Sticky-air RT overturn on the variational (rock-ratio masked) path
    with no_slip bottom (RayleighTaylor2D.jl:144-209)."""
    from justrelax_tpu.models.rayleigh_taylor import run

    stokes, particles, phase, info, vmax, t = run(nx=32, ny=32, nt=2)

    # every step met the plain-solver-convention rel/abs criterion
    assert np.isfinite(float(info.err))
    assert float(info.err) < 1.0e-2
    assert int(info.iters) < 50_000

    # gravitational instability grows: |Vy| increases step over step
    assert vmax[1] > vmax[0] > 0.0

    # particle phases conserved through advect/move/inject (no leakage of
    # air into rock or vice versa at these tiny displacements)
    a = np.asarray(particles.active).astype(bool)
    counts = collections.Counter(np.asarray(phase)[a].astype(int).ravel().tolist())
    assert counts[0] == 4069 and counts[1] == 3764 and counts[2] == 16743

    # frozen goldens
    np.testing.assert_allclose(vmax[0], 5.318893356245688e-06, rtol=1e-5)
    np.testing.assert_allclose(vmax[1], 1.2842506924408967e-05, rtol=1e-5)
    # lithostatic pressure scale preserved (≈ ρgh at the bottom)
    np.testing.assert_allclose(
        float(np.asarray(stokes.P).max()), 1.5405634554251656e10, rtol=1e-4
    )


@pytest.mark.slow
def test_plume_free_surface_stabilized():
    """Rising plume with the Vy·∂(ρg)/∂y·θ·dt stabilization term active
    (PlumeFreeSurface_2D.jl:187-204, kwargs free_surface=true)."""
    from justrelax_tpu.models.rayleigh_taylor import run_plume

    stokes, particles, phase, info, vmax, t = run_plume(nx=32, ny=32, nt=1)

    assert np.isfinite(float(info.err))
    Vy = np.asarray(stokes.V.Vy)
    assert np.isfinite(Vy).all()

    # plume rises at the Stokes-sphere velocity scale
    # (2Δρg r²/(9η) ≈ 2.2e-9 m/s for Δρ=100, r=100 km, η=1e21)
    np.testing.assert_allclose(vmax[0], 8.132817330884509e-09, rtol=1e-5)
    np.testing.assert_allclose(
        float(np.abs(np.asarray(stokes.V.Vx)).max()),
        1.148033224900681e-08,
        rtol=1e-5,
    )
    # rising plume: the max upward velocity sits above the plume center
    iy = np.unravel_index(np.argmax(Vy), Vy.shape)[1]
    ny = Vy.shape[1] - 1
    assert iy > ny // 4


@pytest.mark.slow
def test_plume_variational_stabilized():
    """Variational plume with the masked stabilization term active
    (PlumeFreeSurface_VariationalStokes.jl:192-210 — the reference's one
    free-surface script that passes free_surface=true to the variational
    solver). Goldens frozen from the round-2 CPU/x64 run."""
    from justrelax_tpu.models.rayleigh_taylor import run_plume_variational

    stokes, particles, phase, info, vmax, t = run_plume_variational(
        nx=32, ny=32, nt=2)

    assert np.isfinite(float(info.err))
    assert float(info.err) < 1.0e-4
    Vy = np.asarray(stokes.V.Vy)
    assert np.isfinite(Vy).all()
    # true free surface (air masked): plume-rise velocity scale
    np.testing.assert_allclose(vmax[0], 4.9869242014546195e-09, rtol=1e-5)
    np.testing.assert_allclose(vmax[1], 2.8594736096290873e-09, rtol=1e-4)
