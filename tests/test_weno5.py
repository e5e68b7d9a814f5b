"""WENO-5 advection (reference test_WENO5.jl: advection of a blob)."""

import jax.numpy as jnp
import numpy as np
import pytest

from justrelax_tpu.advection.weno5 import weno_advect


def _gaussian(nx, ny, cx, cy, w=0.08):
    x = np.linspace(0, 1, nx)
    y = np.linspace(0, 1, ny)
    X, Y = np.meshgrid(x, y, indexing="ij")
    return np.exp(-((X - cx) ** 2 + (Y - cy) ** 2) / w**2)


@pytest.mark.parametrize("method", [1, 2])
def test_blob_translation(method):
    """A Gaussian blob advected by a uniform velocity moves rigidly."""
    n = 64
    u0 = jnp.asarray(_gaussian(n, n, 0.3, 0.5))
    vx = jnp.full((n, n), 1.0)
    vy = jnp.zeros((n, n))
    di = (1.0 / n, 1.0 / n)
    dt = 0.4 * di[0]  # CFL 0.4
    u = u0
    nsteps = 32  # travel distance 0.2
    for _ in range(nsteps):
        u = weno_advect(u, (vx, vy), di, dt, method=method)
    expected = _gaussian(n, n, 0.3 + nsteps * dt, 0.5)
    err = np.abs(np.asarray(u) - expected).max()
    assert err < 5.0e-2
    # mass approximately conserved away from boundaries
    assert np.sum(np.asarray(u)) == pytest.approx(float(np.sum(np.asarray(u0))), rel=1e-3)


def test_no_new_extrema():
    """ENO property: overshoots on a step stay essentially non-oscillatory
    (WENO is not strictly TVD; small 1e-4-level overshoot is expected)."""
    n = 64
    u = jnp.asarray(np.where(np.arange(n) < n // 2, 1.0, 0.0)[:, None] * np.ones((1, n)))
    vx = jnp.full((n, n), 1.0)
    vy = jnp.zeros((n, n))
    di = (1.0 / n, 1.0 / n)
    dt = 0.4 * di[0]
    for _ in range(20):
        u = weno_advect(u, (vx, vy), di, dt)
    assert float(u.max()) < 1.0 + 5.0e-3
    assert float(u.min()) > -5.0e-3
