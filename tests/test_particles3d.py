"""3D particle-in-cell transport (the JustPIC._3D surface)."""

import jax.numpy as jnp
import numpy as np
import pytest

from justrelax_tpu.core.grid import Geometry
from justrelax_tpu.particles.particles3d import (
    Particles3D,
    advect_rk2_3d,
    centroid2particle_3d,
    grid2particle_3d,
    init_particles_3d,
    move_particles_3d,
    particle2centroid_3d,
    particle2grid_3d,
    phase_ratios_from_particles_3d,
)


@pytest.fixture
def setup():
    geometry = Geometry((8, 8, 8), (1.0, 1.0, 1.0))
    particles = init_particles_3d(geometry, nxcell=8, max_xcell=20,
                                  min_xcell=4, seed=0)
    return geometry, particles


def test_init(setup):
    geometry, p = setup
    assert p.px.shape == (8, 8, 8, 20)
    assert int(p.count().min()) == 8
    # particles lie inside their own cells
    I = np.arange(8)[:, None, None, None]
    act = np.asarray(p.active)
    cx = np.floor(np.asarray(p.px) / 0.125).astype(int)
    assert (cx[act] == np.broadcast_to(I, p.px.shape)[act]).all()


def test_transfers_linear_exact(setup):
    """Grid→particle→grid of a LINEAR field is exact (trilinear)."""
    geometry, p = setup
    xv, yv, zv = (jnp.asarray(v) for v in geometry.xvi)
    F = (
        2.0 * xv[:, None, None] - 3.0 * yv[None, :, None]
        + 0.5 * zv[None, None, :] + 1.0
    )
    pf = grid2particle_3d(F, p, geometry)
    expect = 2.0 * p.px - 3.0 * p.py + 0.5 * p.pz + 1.0
    np.testing.assert_allclose(
        np.asarray(pf)[np.asarray(p.active)],
        np.asarray(expect)[np.asarray(p.active)], rtol=1e-12,
    )
    # centroid route linear-exact for INTERIOR-cell particles (the center
    # lattice clamps within half a cell of the boundary, same as 2D)
    X, Y, Z = geometry.cell_centers_mesh()
    Fc = 2.0 * jnp.asarray(X) - 3.0 * jnp.asarray(Y) + 0.5 * jnp.asarray(Z) + 1.0
    pc = centroid2particle_3d(Fc, p, geometry)
    interior = np.asarray(p.active).copy()
    interior[0] = interior[-1] = False
    interior[:, 0] = interior[:, -1] = False
    interior[:, :, 0] = interior[:, :, -1] = False
    np.testing.assert_allclose(
        np.asarray(pc)[interior], np.asarray(expect)[interior], rtol=1e-12
    )
    # particle→grid of a constant is that constant
    G = particle2grid_3d(jnp.ones_like(p.px), p, geometry)
    np.testing.assert_allclose(np.asarray(G), 1.0, atol=1e-12)
    C = particle2centroid_3d(jnp.full_like(p.px, 3.5), p, geometry)
    np.testing.assert_allclose(np.asarray(C), 3.5, atol=1e-12)


def test_advect_and_move_uniform_translation(setup):
    """Uniform velocity translates every particle by V·dt; move_particles
    re-slots them with no losses (interior motion)."""
    geometry, p = setup
    v = (0.04, -0.03, 0.02)
    Vx = jnp.full((9, 10, 10), v[0])
    Vy = jnp.full((10, 9, 10), v[1])
    Vz = jnp.full((10, 10, 9), v[2])
    phase = jnp.asarray(
        (np.asarray(p.px) > 0.5).astype(float)
    )
    p0 = p
    p = advect_rk2_3d(p, (Vx, Vy, Vz), geometry, 1.0)
    # particles that would leave the box are clamped at the wall (correct);
    # check the exact translation for those with room to move
    act = np.asarray(p0.active) & (np.asarray(p0.px) < 1.0 - v[0] - 1e-9) \
        & (np.asarray(p0.py) > -v[1] + 1e-9) \
        & (np.asarray(p0.pz) < 1.0 - v[2] - 1e-9)
    np.testing.assert_allclose(
        np.asarray(p.px)[act] - np.asarray(p0.px)[act], v[0], atol=1e-12
    )
    p, f = move_particles_3d(p, geometry, {"phase": phase})
    assert int(p.count().sum()) == int(p0.count().sum())
    act = np.asarray(p.active)
    # every re-slotted particle is in its claimed cell
    cx = np.floor(np.asarray(p.px) / 0.125).astype(int)
    I = np.broadcast_to(np.arange(8)[:, None, None, None], p.px.shape)
    assert (cx[act] == I[act]).all()
    # phase field carried along (matches the ORIGINAL x threshold shifted
    # by the translation; skip wall-clamped particles)
    room = act & (np.asarray(p.px) < 1.0 - 1e-6) & (np.asarray(p.pz) < 1.0 - 1e-6) \
        & (np.asarray(p.py) > 1e-6)
    ph = np.asarray(f["phase"])[room]
    px = np.asarray(p.px)[room]
    np.testing.assert_array_equal(ph, (px - v[0] > 0.5).astype(float))


def test_phase_ratios(setup):
    geometry, p = setup
    phase = jnp.asarray((np.asarray(p.pz) > 0.5).astype(float))
    center, vertex = phase_ratios_from_particles_3d(p, phase, 2, geometry)
    np.testing.assert_allclose(
        np.asarray(jnp.sum(center, axis=-1)), 1.0, atol=1e-12
    )
    assert center.shape == (8, 8, 8, 2)
    assert vertex.shape == (9, 9, 9, 2)
    # bottom cells all phase 0, top all phase 1
    np.testing.assert_allclose(np.asarray(center[:, :, 0, 0]), 1.0)
    np.testing.assert_allclose(np.asarray(center[:, :, -1, 1]), 1.0)


def test_inject_refills_starved_cells(setup):
    from justrelax_tpu.particles.particles3d import inject_particles_3d

    geometry, p = setup
    phase = jnp.asarray((np.asarray(p.pz) > 0.5).astype(float))
    # starve one cell: deactivate all but 2 of its particles
    a = np.asarray(p.active).copy()
    a[3, 4, 2, 2:] = False
    p = p.replace(active=jnp.asarray(a))
    assert int(p.count()[3, 4, 2]) == 2  # below min_xcell=4
    T = jnp.ones((8, 8, 8)) * 7.0
    p2, f = inject_particles_3d(
        p, geometry, {"T": T}, phases=2, fields={"phase": phase, "T": jnp.zeros_like(phase)}
    )
    assert int(p2.count()[3, 4, 2]) == p.nxcell  # refilled to nxcell
    # other cells untouched
    assert int(p2.count()[0, 0, 0]) == int(p.count()[0, 0, 0])
    # injected particles lie inside the cell and carry interpolated T and
    # the dominant phase (z<0.5 at k=2 → phase 0)
    new = np.asarray(p2.active[3, 4, 2]) & ~np.asarray(p.active[3, 4, 2])
    px = np.asarray(p2.px[3, 4, 2])[new]
    assert ((px >= 3 * 0.125) & (px <= 4 * 0.125)).all()
    np.testing.assert_allclose(np.asarray(f["T"][3, 4, 2])[new], 7.0)
    np.testing.assert_allclose(np.asarray(f["phase"][3, 4, 2])[new], 0.0)
