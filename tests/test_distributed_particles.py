"""Distributed particle transport == serial (the JustPIC MPI-passing
analogue): advection + cross-device migration on an 8-device mesh must
reproduce the serial advect_rk2 + move_particles exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from justrelax_tpu.core.grid import Geometry
from justrelax_tpu.parallel.decomp import Decomp2D
from justrelax_tpu.parallel.particles import (
    advect_move_local,
    block_particles,
    unblock_particles,
)
from justrelax_tpu.particles.particles import (
    advect_rk2,
    init_particles,
    move_particles,
)


def _gather_sorted(particles, phase):
    """Order-independent multiset of active (x, y, phase) rows."""
    a = np.asarray(particles.active).ravel()
    rows = np.stack(
        [
            np.asarray(particles.px).ravel()[a],
            np.asarray(particles.py).ravel()[a],
            np.asarray(phase).ravel()[a],
        ],
        axis=-1,
    )
    return rows[np.lexsort(rows.T[::-1])]


@pytest.mark.slow
def test_distributed_particles_match_serial():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = jax.sharding.Mesh(np.array(devs[:8]).reshape(2, 4), ("x", "y"))

    nx, ny = 16, 16
    geometry = Geometry((nx, ny), (1.0, 1.0))
    dec = Decomp2D.make((nx, ny), (2, 4))
    rng = np.random.default_rng(5)

    # rotational + random velocity field, CFL ~ 0.5
    Vx = jnp.asarray(rng.normal(size=(nx + 1, ny + 2)))
    Vy = jnp.asarray(rng.normal(size=(nx + 2, ny + 1)))
    dt = 0.45 * min(geometry.di) / max(
        float(jnp.abs(Vx).max()), float(jnp.abs(Vy).max())
    )

    particles = init_particles(geometry, nxcell=4, max_xcell=12, min_xcell=2,
                               seed=3)
    phase = jnp.asarray(
        rng.integers(0, 3, size=particles.px.shape).astype(float)
    )

    # --- serial reference: 3 steps of advect + move -------------------------
    p_s, ph_s = particles, phase
    for _ in range(3):
        p_s = advect_rk2(p_s, (Vx, Vy), geometry, dt)
        p_s, f = move_particles(p_s, geometry, {"phase": ph_s})
        ph_s = f["phase"]

    # --- distributed --------------------------------------------------------
    from justrelax_tpu.parallel.decomp import block_staggered

    p_b = block_particles(particles, geometry, dec)
    Vx_b = jnp.asarray(
        block_staggered(np.asarray(Vx), dec, (1, 2))
    )
    Vy_b = jnp.asarray(
        block_staggered(np.asarray(Vy), dec, (2, 1))
    )

    def local_steps(px, py, active, ph, Vxl, Vyl):
        from jax import lax

        from justrelax_tpu.particles.particles import Particles

        def body(_, c):
            p, ph_ = c
            p2, f2 = advect_move_local(
                p, {"phase": ph_}, Vxl, Vyl, dec, geometry.di, dt
            )
            return (p2, f2["phase"])

        p0 = Particles(px=px, py=py, active=active)
        p, ph_out = lax.fori_loop(0, 3, body, (p0, ph))
        return p.px, p.py, p.active, ph_out

    spec = P("x", "y")
    fn = jax.shard_map(
        local_steps,
        mesh=mesh,
        in_specs=(spec,) * 6,
        out_specs=(spec,) * 4,
        check_vma=False,
    )
    with mesh:
        px, py, active, ph = fn(
            p_b.px, p_b.py, p_b.active, phase, Vx_b, Vy_b
        )
    p_d = particles.replace(px=px, py=py, active=active)
    p_d = unblock_particles(p_d, geometry, dec)

    rows_s = _gather_sorted(p_s, ph_s)
    rows_d = _gather_sorted(p_d, ph)
    assert rows_s.shape == rows_d.shape, (rows_s.shape, rows_d.shape)
    np.testing.assert_allclose(rows_d, rows_s, atol=1e-13)

    # per-cell occupancy identical too
    np.testing.assert_array_equal(
        np.asarray(p_d.count()), np.asarray(p_s.count())
    )
