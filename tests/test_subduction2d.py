"""2D subduction application demo (reference miniapps/subduction/2D; the
reference miniapp has no test oracle — asserts here are physical)."""

import numpy as np
import pytest

from justrelax_tpu.models import subduction2d


@pytest.mark.slow
def test_subduction2d_physics():
    stokes, thermal, info, phases = subduction2d.run(nx=64, ny=24, nt=2)
    h = np.asarray(info.err_history)
    valid = h[np.isfinite(h)]
    # steady convergence of a hard-contrast variational solve
    assert valid[-1] < 0.05 * valid[0]
    # slab sinks at a plate-tectonic rate (cm/yr scale)
    Vy = np.asarray(stokes.V.Vy)
    Vy_c = 0.5 * (Vy[1:-1, :-1] + Vy[1:-1, 1:])
    slab = phases == subduction2d.LITH
    v_cm_yr = Vy_c[slab].mean() * 100 * 365.25 * 24 * 3600
    assert -100.0 < v_cm_yr < -0.1
    # sticky air (masked nullspace region) stays nearly at rest relative to
    # the slab
    air = phases == subduction2d.AIR
    assert np.abs(Vy_c[air]).max() < 50 * np.abs(Vy_c[slab]).mean()

    # frozen golden values (round 2, CPU/x64)
    np.testing.assert_allclose(v_cm_yr, -8.12271522695263, rtol=1e-5)
    np.testing.assert_allclose(np.abs(Vy).max(), 2.776206296426089e-08, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(thermal.T).mean(), 1561.9627799560321, rtol=1e-6)


@pytest.mark.slow
def test_subduction2d_particles_restart_equivalence(tmp_path):
    """Particle-transport subduction with mid-run checkpoint/restart
    (reference Subduction2D.jl:270-271 + Subduction2D_restart.jl:81-103):
    a 4-step run checkpointing at steps 2 and 4 must equal (bitwise) a run
    restarted from the step-2 checkpoint, and the step-2/step-4 states carry
    frozen goldens."""
    import os

    import jax.numpy as jnp

    from justrelax_tpu.io.checkpoint import load_checkpoint_particles
    from justrelax_tpu.models.subduction2d import run_particles

    d_full = str(tmp_path / "full")
    d_restart = str(tmp_path / "restart")
    os.makedirs(d_restart, exist_ok=True)

    # full run: 4 steps, checkpoints at it=2 and it=4 (the it=2 files are
    # overwritten by it=4 — capture them by running 2 steps first)
    s2, th2, p2, (ph2, pT2), info2 = run_particles(
        nx=48, ny=16, nt=2, out_dir=d_full, checkpoint_every=2
    )
    assert float(info2.err) < 1.0e-4
    # continue the full run to 4 steps from the in-memory state via restart
    # machinery itself (the checkpoint at it=2 is the handoff)
    s4, th4, p4, (ph4, pT4), info4 = run_particles(
        nx=48, ny=16, nt=4, out_dir=d_restart, checkpoint_every=2,
        restart_from=d_full,
    )
    assert float(info4.err) < 1.0e-4

    # the checkpoint roundtrip reproduces the in-memory state exactly
    pr, pf, t4, dt4, it4 = load_checkpoint_particles(
        os.path.join(d_restart, "particles.npz")
    )
    assert it4 == 4
    np.testing.assert_array_equal(np.asarray(pr.px), np.asarray(p4.px))
    np.testing.assert_array_equal(np.asarray(pf["T"]), np.asarray(pT4))

    # restart bit-equivalence: a straight 4-step run equals the
    # checkpoint-and-restart run exactly (deterministic PIC, fixed seed)
    s4b, th4b, p4b, (ph4b, pT4b), _ = run_particles(nx=48, ny=16, nt=4)
    np.testing.assert_array_equal(np.asarray(s4b.V.Vy), np.asarray(s4.V.Vy))
    np.testing.assert_array_equal(np.asarray(s4b.P), np.asarray(s4.P))
    np.testing.assert_array_equal(np.asarray(th4b.T), np.asarray(th4.T))
    np.testing.assert_array_equal(np.asarray(p4b.px), np.asarray(p4.px))
    np.testing.assert_array_equal(np.asarray(pT4b), np.asarray(pT4))

    # frozen goldens (f64, seed=0) at both checkpoints: slab descent speed
    yr = 3.15576e7
    Vy2 = np.asarray(s2.V.Vy)
    Vy4 = np.asarray(s4.V.Vy)
    assert Vy2.min() * 100 * yr == pytest.approx(-4.1227, rel=2e-2)
    assert Vy4.min() * 100 * yr == pytest.approx(-5.6428, rel=2e-2)
    assert np.isfinite(Vy4).all()
