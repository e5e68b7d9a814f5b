"""Particle-in-cell module unit tests (JustPIC-surface equivalents)."""

import jax.numpy as jnp
import numpy as np
import pytest

from justrelax_tpu.core.grid import Geometry
from justrelax_tpu.particles.particles import (
    Particles,
    advect_rk2,
    centroid2particle,
    grid2particle,
    init_particles,
    inject_particles,
    move_particles,
    particle2centroid,
    particle2grid,
    particle_velocity,
    phase_ratios_from_particles,
)


@pytest.fixture
def geom():
    return Geometry((8, 8), (1.0, 1.0))


def test_init_counts(geom):
    p = init_particles(geom, nxcell=6, max_xcell=12, min_xcell=3)
    assert p.px.shape == (8, 8, 12)
    np.testing.assert_array_equal(np.asarray(p.count()), 6)
    # particles sit inside their cells
    dx = geom.di[0]
    ci = np.floor(np.asarray(p.px) / dx).astype(int)
    II = np.arange(8)[:, None, None]
    assert (ci[np.asarray(p.active)] == np.broadcast_to(II, p.px.shape)[np.asarray(p.active)]).all()


def test_velocity_interpolation_linear_field(geom):
    """Bilinear interpolation is exact for linear velocity fields."""
    p = init_particles(geom, 4, 8, 2)
    xv = jnp.asarray(geom.xvi[0])
    yvx = jnp.asarray(geom.xi_vel[0][1])
    Vx = 2.0 * xv[:, None] + 0.5 * yvx[None, :] + 1.0
    xvy = jnp.asarray(geom.xi_vel[1][0])
    yv = jnp.asarray(geom.xvi[1])
    Vy = -1.0 * xvy[:, None] + 3.0 * yv[None, :]
    vx, vy = particle_velocity(Vx, Vy, geom, p.px, p.py)
    np.testing.assert_allclose(
        np.asarray(vx), np.asarray(2.0 * p.px + 0.5 * p.py + 1.0), atol=1e-12
    )
    np.testing.assert_allclose(np.asarray(vy), np.asarray(-p.px + 3.0 * p.py), atol=1e-12)


def test_advect_and_move_uniform_flow(geom):
    p = init_particles(geom, 4, 8, 2)
    Vx = jnp.full((9, 10), 1.0)  # uniform flow +x
    Vy = jnp.zeros((10, 9))
    dt = 0.9 * geom.di[0]  # just under one cell
    X0 = np.asarray(p.px).copy()
    p2 = advect_rk2(p, (Vx, Vy), geom, dt)
    np.testing.assert_allclose(
        np.asarray(p2.px)[np.asarray(p.active)],
        np.clip(X0 + dt, None, 1.0 - 1e-12)[np.asarray(p.active)],
        atol=1e-12,
    )
    marker = jnp.asarray(np.arange(p.px.size, dtype=float).reshape(p.px.shape))
    p3, fields = move_particles(p2, geom, {"m": marker})
    # all active particles preserved
    assert int(p3.count().sum()) == int(p2.count().sum())
    # every particle in the right cell
    dx = geom.di[0]
    ci = np.floor(np.asarray(p3.px) / dx).astype(int)
    II = np.broadcast_to(np.arange(8)[:, None, None], p3.px.shape)
    a = np.asarray(p3.active)
    assert (ci[a] == II[a]).all()
    # field payload follows its particle (marker values preserved as a set)
    assert set(np.asarray(fields["m"])[a].tolist()) == set(np.asarray(marker)[np.asarray(p2.active)].tolist())


def test_p2g_linear_approx(geom):
    """Inverse-distance p2g approximates linear fields (not exact — Shepard
    weighting, same as JustPIC); interior vertices land close."""
    p = init_particles(geom, 9, 12, 4)
    f = 2.0 * p.px + 3.0 * p.py + 1.0
    vert = particle2grid(f, p, geom)
    X, Y = np.meshgrid(geom.xvi[0], geom.xvi[1], indexing="ij")
    exact = 2 * X + 3 * Y + 1
    err = np.abs(np.asarray(vert)[1:-1, 1:-1] - exact[1:-1, 1:-1])
    assert err.max() < 0.15


def test_g2p_exact_linear(geom):
    """Bilinear g2p reproduces a linear vertex field exactly."""
    p = init_particles(geom, 9, 12, 4)
    X, Y = np.meshgrid(geom.xvi[0], geom.xvi[1], indexing="ij")
    vert = jnp.asarray(2 * X + 3 * Y + 1)
    back = grid2particle(vert, p, geom)
    f = 2.0 * p.px + 3.0 * p.py + 1.0
    a = np.asarray(p.active)
    np.testing.assert_allclose(np.asarray(back)[a], np.asarray(f)[a], atol=1e-10)


def test_centroid_transfers(geom):
    p = init_particles(geom, 9, 12, 4)
    f = 1.5 * p.px - 0.5 * p.py
    cen = particle2centroid(f, p, geom)
    X, Y = geom.cell_centers_mesh()
    # Shepard-weighted average ≈ linear field at centroids
    assert np.abs(np.asarray(cen) - (1.5 * X - 0.5 * Y)).max() < 0.1
    # bilinear centroid→particle of an exactly-linear center field is exact
    # away from the clamped boundary ring
    cen_exact = jnp.asarray(1.5 * X - 0.5 * Y)
    back = centroid2particle(cen_exact, p, geom)
    a = np.asarray(p.active)
    inner = a & (np.asarray(p.px) > 0.15) & (np.asarray(p.px) < 0.85) \
        & (np.asarray(p.py) > 0.15) & (np.asarray(p.py) < 0.85)
    np.testing.assert_allclose(np.asarray(back)[inner], np.asarray(f)[inner], atol=1e-10)


def test_phase_ratios(geom):
    p = init_particles(geom, 9, 12, 4)
    phase = jnp.where(p.px < 0.5, 0, 1)
    center, vertex = phase_ratios_from_particles(p, phase, 2, geom)
    assert center.shape == (8, 8, 2) and vertex.shape == (9, 9, 2)
    np.testing.assert_allclose(np.asarray(center.sum(-1)), 1.0, atol=1e-12)
    # far left cells pure phase 0; far right pure phase 1
    np.testing.assert_allclose(np.asarray(center[0, :, 0]), 1.0)
    np.testing.assert_allclose(np.asarray(center[-1, :, 1]), 1.0)


def test_injection(geom):
    p = init_particles(geom, 6, 12, 5)
    # deactivate most particles of one cell
    active = np.asarray(p.active).copy()
    active[3, 3, 1:] = False
    p = p.replace(active=jnp.asarray(active))
    T_cells = jnp.ones(geom.ni) * 42.0
    phase = jnp.zeros_like(p.px)
    p2, fields = inject_particles(
        p, geom, {"T": T_cells}, phases=1, fields={"T": jnp.zeros_like(p.px), "phase": phase},
        phase_field="phase",
    )
    assert int(p2.count()[3, 3]) >= p.min_xcell
    filled = np.asarray(p2.active[3, 3]) & ~active[3, 3]
    np.testing.assert_allclose(np.asarray(fields["T"][3, 3])[filled], 42.0)
