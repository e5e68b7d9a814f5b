"""Marker-chain surface tracking (JustPIC MarkerChain equivalent)."""

import jax.numpy as jnp
import numpy as np
import pytest

from justrelax_tpu.core.grid import Geometry
from justrelax_tpu.particles.marker_chain import (
    MarkerChain,
    advect_marker_chain,
    init_marker_chain,
    phases_from_marker_chain,
    update_phases_given_markerchain,
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


def test_update_phases_given_markerchain_deforming_surface(geom):
    """Per-particle topography correction (reference
    src/phases/topography_correction.jl:36-90 via Caldera2D.jl:194,435):
    after the surface DEFORMS away from the phase assignment, rock
    particles now above the chain and air particles now below it are
    deactivated; injection against the chain-corrected field re-seeds them
    with the implied phase, and the rock-ratio mask follows the new
    surface."""
    from justrelax_tpu.ops.rock_ratio import update_rock_ratio
    from justrelax_tpu.particles.particles import (
        init_particles,
        inject_particles,
        phase_ratios_from_particles,
    )
    from justrelax_tpu.rheology.phases import PhaseRatios, phase_ratios_from_field

    AIR, ROCK = 1, 0
    particles = init_particles(geom, nxcell=6, max_xcell=12, min_xcell=3,
                               seed=0)
    # phases assigned from a FLAT surface at y = 0.5
    p_phase = jnp.where(particles.py > 0.5, float(AIR), float(ROCK))

    # the surface then deforms: a bump h(x) = 0.5 + 0.2 sin(2πx)
    def h(x):
        return 0.5 + 0.2 * np.sin(2 * np.pi * np.asarray(x))

    chain = init_marker_chain(geom, h)
    corrected, n_corr = update_phases_given_markerchain(
        chain, particles, p_phase, AIR)
    hp = np.interp(np.asarray(particles.px).ravel(),
                   np.asarray(chain.x), np.asarray(chain.y)).reshape(
                       particles.px.shape)
    above = np.asarray(particles.py) > hp
    was_air = np.asarray(p_phase) == AIR
    expect_bad = np.asarray(particles.active) & (above != was_air)
    assert int(n_corr) == int(expect_bad.sum()) > 0
    np.testing.assert_array_equal(
        np.asarray(corrected.active), np.asarray(particles.active) & ~expect_bad
    )

    # injection re-seeds the emptied slots with the chain-implied phase
    above_c = phases_from_marker_chain(chain, geom, 0, 1).astype(bool)
    phases_inject = jnp.where(above_c, float(AIR), float(ROCK))
    refilled, fields = inject_particles(
        corrected, geom, fields_from_centers={}, phases=phases_inject,
        fields={"phase": p_phase},
    )
    p2 = np.asarray(fields["phase"])
    act = np.asarray(refilled.active)
    hp2 = np.interp(np.asarray(refilled.px).ravel(), np.asarray(chain.x),
                    np.asarray(chain.y)).reshape(refilled.px.shape)
    # every active particle's phase is now consistent with the chain, up to
    # particles within one injection-placement cell of the surface
    above2 = np.asarray(refilled.py) > hp2
    mismatch = act & ((p2 == AIR) != above2)
    dist = np.abs(np.asarray(refilled.py) - hp2)
    assert np.all(dist[mismatch] < geom.di[1])

    # the rock-ratio mask follows the deformed surface
    rc, rv = phase_ratios_from_particles(refilled, fields["phase"], 2, geom)
    pr_full = phase_ratios_from_field(rc)
    pr = PhaseRatios(center=rc, vertex=rv, face_x=pr_full.face_x,
                     face_y=pr_full.face_y)
    phi = update_rock_ratio(pr, air_phase=AIR)
    Y = geom.cell_centers_mesh()[1]
    hc = np.interp(np.asarray(geom.xci[0]), np.asarray(chain.x),
                   np.asarray(chain.y))[:, None]
    deep_rock = np.asarray(Y) < hc - geom.di[1]
    deep_air = np.asarray(Y) > hc + geom.di[1]
    assert np.all(np.asarray(phi.center)[deep_rock] > 0.5)
    assert np.all(np.asarray(phi.center)[deep_air] < 0.5)


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
