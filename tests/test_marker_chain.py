"""Marker-chain surface tracking (JustPIC MarkerChain equivalent)."""

import jax.numpy as jnp
import numpy as np
import pytest

from justrelax_tpu.core.grid import Geometry
from justrelax_tpu.particles.marker_chain import (
    advect_marker_chain,
    init_marker_chain,
    phases_from_marker_chain,
)


@pytest.fixture
def geom():
    return Geometry((16, 16), (1.0, 1.0))


def test_init_and_phases(geom):
    chain = init_marker_chain(geom, 0.5)
    phases = phases_from_marker_chain(chain, geom, phase_below=0, phase_above=1)
    Y = geom.cell_centers_mesh()[1]
    np.testing.assert_array_equal(np.asarray(phases), (Y > 0.5).astype(int))


def test_advect_uniform_vertical(geom):
    """Uniform +y flow lifts the whole chain by V·dt."""
    chain = init_marker_chain(geom, 0.4)
    Vx = jnp.zeros((17, 18))
    Vy = jnp.full((18, 17), 0.1)
    c2 = advect_marker_chain(chain, (Vx, Vy), geom, 0.5)
    np.testing.assert_allclose(np.asarray(c2.y), 0.45, atol=1e-12)
    np.testing.assert_allclose(np.asarray(c2.x), np.asarray(chain.x))


def test_advect_shear_resample(geom):
    """Horizontal shear displaces markers in x; resampling keeps the lattice
    and interpolates heights (sine surface translates)."""
    x = np.linspace(0, 1, 65)
    chain = init_marker_chain(geom, lambda xx: 0.5 + 0.05 * np.sin(2 * np.pi * xx))
    Vx = jnp.full((17, 18), 0.2)
    Vy = jnp.zeros((18, 17))
    c2 = advect_marker_chain(chain, (Vx, Vy), geom, 0.25)  # shift 0.05 in x
    interior = (np.asarray(chain.x) > 0.1) & (np.asarray(chain.x) < 0.9)
    expected = 0.5 + 0.05 * np.sin(2 * np.pi * (np.asarray(chain.x) - 0.05))
    np.testing.assert_allclose(
        np.asarray(c2.y)[interior], expected[interior], atol=2e-4
    )
