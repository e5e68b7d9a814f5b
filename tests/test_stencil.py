"""Finite-difference / averaging identities (reference test_mini_kernels.jl)."""

import jax.numpy as jnp
import numpy as np
import pytest

from justrelax_tpu.ops import stencil as st


@pytest.fixture
def A():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.standard_normal((6, 5)))


def test_d_xa(A):
    d = st.d_xa(A, 2.0)
    assert d.shape == (5, 5)
    np.testing.assert_allclose(d[1, 2], (A[2, 2] - A[1, 2]) * 2.0)


def test_d_ya(A):
    d = st.d_ya(A, 3.0)
    assert d.shape == (6, 4)
    np.testing.assert_allclose(d[1, 2], (A[1, 3] - A[1, 2]) * 3.0)


def test_d_xi(A):
    d = st.d_xi(A, 1.0)
    assert d.shape == (5, 4)
    # d_xi at (i, j) = A[i+1, j+1] - A[i, j+1]
    np.testing.assert_allclose(d[2, 1], A[3, 2] - A[2, 2])


def test_d_yi(A):
    d = st.d_yi(A, 1.0)
    assert d.shape == (5, 4)
    np.testing.assert_allclose(d[2, 1], A[3, 2] - A[3, 1])


def test_av_a(A):
    a = st.av_a(A)
    assert a.shape == (5, 4)
    np.testing.assert_allclose(a[1, 1], 0.25 * (A[1, 1] + A[2, 1] + A[1, 2] + A[2, 2]))


def test_harm_a():
    A = jnp.asarray([[1.0, 2.0], [4.0, 8.0]])
    h = st.harm_a(A)
    np.testing.assert_allclose(h[0, 0], 4.0 / (1 + 1 / 2 + 1 / 4 + 1 / 8))


def test_av_center_to_vertex(A):
    v = st.av_center_to_vertex(A)
    assert v.shape == (7, 6)
    # interior vertex is plain 4-point average
    np.testing.assert_allclose(v[1, 1], 0.25 * (A[0, 0] + A[1, 0] + A[0, 1] + A[1, 1]))
    # corner vertex clamps to the corner cell
    np.testing.assert_allclose(v[0, 0], A[0, 0])


def test_maxloc_interior():
    A = np.zeros((5, 5))
    A[2, 2] = 7.0
    B = np.asarray(st.maxloc(jnp.asarray(A), window=1))
    assert B[1, 1] == 7.0 and B[3, 3] == 7.0 and B[2, 2] == 7.0
    assert B[0, 0] == 0.0
    assert B[4, 4] == 0.0


def test_maxloc_boundary_clamped():
    A = np.arange(16.0).reshape(4, 4)
    B = np.asarray(st.maxloc(jnp.asarray(A), window=1))
    # boundary cells clamp the window into the array
    assert B[0, 0] == A[1, 1]
    assert B[3, 3] == A[3, 3]
    # every cell: max over clamped 3x3 window
    for i in range(4):
        for j in range(4):
            i0, i1 = max(i - 1, 0), min(i + 1, 3)
            j0, j1 = max(j - 1, 0), min(j + 1, 3)
            assert B[i, j] == A[i0 : i1 + 1, j0 : j1 + 1].max()


def test_maxloc_3d():
    rng = np.random.default_rng(1)
    A = rng.standard_normal((4, 5, 6))
    B = np.asarray(st.maxloc(jnp.asarray(A), window=1))
    i, j, k = 2, 2, 3
    assert B[i, j, k] == pytest.approx(A[i - 1 : i + 2, j - 1 : j + 2, k - 1 : k + 2].max())
