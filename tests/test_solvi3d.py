"""SolVi 3D: spherical inclusion under pure shear (reference
test/test_stokes_solvi3D.jl — norm_Rx < 1e-8 at 16^3 within 5000 iters)."""

import numpy as np
import pytest


@pytest.mark.slow
def test_solvi3d_converges():
    from justrelax_tpu.models.solvi3d import run

    geom, stokes, info = run()
    nrx = np.asarray(info.norm_Rx)
    assert nrx[np.isfinite(nrx)][-1] < 1.0e-8
    assert int(info.iters) <= 5_000

    # the weak inclusion perturbs the pure-shear field: x-velocity deviates
    # from the background ε̇·x around the center plane
    Vx = np.asarray(stokes.V.Vx)
    xv = np.asarray(geom.xvi[0])
    bg = xv[:, None, None] * np.ones_like(Vx)
    mid = slice(Vx.shape[1] // 2 - 2, Vx.shape[1] // 2 + 2)
    dev = np.abs(Vx - bg)[:, mid, mid]
    assert dev.max() > 1.0e-2
    # but matches the background at the boundary (imposed BC)
    np.testing.assert_allclose(Vx[0, 1:-1, 1:-1], xv[0], atol=1.0e-12)
    np.testing.assert_allclose(Vx[-1, 1:-1, 1:-1], xv[-1], atol=1.0e-12)


def test_smooth_viscosity_conserves_bounds():
    import jax.numpy as jnp

    from justrelax_tpu.models.solvi3d import smooth_viscosity_3d

    rng = np.random.default_rng(0)
    eta = jnp.asarray(rng.uniform(0.1, 1.0, size=(8, 8, 8)))
    out = smooth_viscosity_3d(eta, n_pass=5)
    # Jacobi smoothing with c=1/6.1 < 1/6 is a contraction: bounds preserved
    assert float(out.min()) >= 0.1 - 1e-12 and float(out.max()) <= 1.0 + 1e-12
    # boundary layer untouched
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(eta[0]))
