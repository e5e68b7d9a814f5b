"""Distributed 3D particle transport == serial (the JustPIC._3D MPI-passing
analogue): RK2 advection + cross-device migration on a 2×2×2 mesh must
reproduce the serial advect_rk2_3d + move_particles_3d exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from justrelax_tpu.core.grid import Geometry
from justrelax_tpu.parallel.decomp import Decomp3D, block_staggered_nd
from justrelax_tpu.parallel.particles3d import (
    advect_move_local_3d,
    block_particles_3d,
    unblock_particles_3d,
)
from justrelax_tpu.particles.particles3d import (
    advect_rk2_3d,
    init_particles_3d,
    move_particles_3d,
)


def _gather_sorted(particles, phase):
    """Order-independent multiset of active (x, y, z, phase) rows."""
    a = np.asarray(particles.active).ravel()
    rows = np.stack(
        [
            np.asarray(particles.px).ravel()[a],
            np.asarray(particles.py).ravel()[a],
            np.asarray(particles.pz).ravel()[a],
            np.asarray(phase).ravel()[a],
        ],
        axis=-1,
    )
    return rows[np.lexsort(rows.T[::-1])]


@pytest.mark.slow
def test_distributed_particles3d_match_serial():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = jax.sharding.Mesh(
        np.array(devs[:8]).reshape(2, 2, 2), ("x", "y", "z")
    )

    ni = (8, 8, 8)
    geometry = Geometry(ni, (1.0, 1.0, 1.0))
    dec = Decomp3D.make(ni, (2, 2, 2))
    rng = np.random.default_rng(7)

    Vx = jnp.asarray(rng.normal(size=(ni[0] + 1, ni[1] + 2, ni[2] + 2)))
    Vy = jnp.asarray(rng.normal(size=(ni[0] + 2, ni[1] + 1, ni[2] + 2)))
    Vz = jnp.asarray(rng.normal(size=(ni[0] + 2, ni[1] + 2, ni[2] + 1)))
    vmax = max(float(jnp.abs(V).max()) for V in (Vx, Vy, Vz))
    dt = 0.45 * min(geometry.di) / vmax

    particles = init_particles_3d(geometry, nxcell=4, max_xcell=14,
                                  min_xcell=2, seed=3)
    phase = jnp.asarray(
        rng.integers(0, 3, size=particles.px.shape).astype(float)
    )

    # --- serial reference: 3 steps of advect + move -------------------------
    p_s, ph_s = particles, phase
    for _ in range(3):
        p_s = advect_rk2_3d(p_s, (Vx, Vy, Vz), geometry, dt)
        p_s, f = move_particles_3d(p_s, geometry, {"phase": ph_s})
        ph_s = f["phase"]

    # --- distributed --------------------------------------------------------
    nl, p = dec.ni_local, dec.mesh_shape
    p_b = block_particles_3d(particles, geometry, dec)
    Vx_b = jnp.asarray(block_staggered_nd(np.asarray(Vx), nl, p, (1, 2, 2)))
    Vy_b = jnp.asarray(block_staggered_nd(np.asarray(Vy), nl, p, (2, 1, 2)))
    Vz_b = jnp.asarray(block_staggered_nd(np.asarray(Vz), nl, p, (2, 2, 1)))

    def local_steps(px, py, pz, active, ph, Vxl, Vyl, Vzl):
        from jax import lax

        from justrelax_tpu.particles.particles3d import Particles3D

        def body(_, c):
            p_, ph_ = c
            p2, f2 = advect_move_local_3d(
                p_, {"phase": ph_}, Vxl, Vyl, Vzl, dec, geometry.di, dt
            )
            return (p2, f2["phase"])

        p0 = Particles3D(px=px, py=py, pz=pz, active=active)
        pout, ph_out = lax.fori_loop(0, 3, body, (p0, ph))
        return pout.px, pout.py, pout.pz, pout.active, ph_out

    spec = P("x", "y", "z")
    fn = jax.shard_map(
        local_steps, mesh=mesh,
        in_specs=(spec,) * 8, out_specs=(spec,) * 5, check_vma=False,
    )
    with mesh:
        px, py, pz, active, ph = fn(
            p_b.px, p_b.py, p_b.pz, p_b.active, phase, Vx_b, Vy_b, Vz_b
        )
    p_d = particles.replace(px=px, py=py, pz=pz, active=active)
    p_d = unblock_particles_3d(p_d, geometry, dec)

    rows_s = _gather_sorted(p_s, ph_s)
    rows_d = _gather_sorted(p_d, ph)
    assert rows_s.shape == rows_d.shape, (rows_s.shape, rows_d.shape)
    np.testing.assert_allclose(rows_d, rows_s, atol=1e-13)

    # per-cell occupancy identical too
    np.testing.assert_array_equal(
        np.asarray(p_d.count()), np.asarray(p_s.count())
    )
