"""Distributed (multi-device) particle transport, 3D.

3D twin of :mod:`justrelax_tpu.parallel.particles` (the JustPIC._3D
``move_particles!`` MPI migration, SURVEY §2.4): blocked-local slot
containers with BLOCK-RELATIVE positions, RK2 advection on ghost-extended
local velocities, and cross-device migration by ghost-extending every slot
array one CELL per side (``lax.ppermute`` slabs), running the serial
``move_particles_3d`` compaction on the extended block, and keeping the
interior. Emigrants land in the neighbor's interior and in our ghosts
(dropped) — no send/recv bookkeeping.

Face-velocity ghosts along each component's own axis fetch the neighbor's
PENULTIMATE face (the shared face is duplicated in the blocked container);
transverse ghost layers come with the blocked velocity containers
themselves. CFL ≤ 1 cell per step, as in the serial mover. Loop timesteps
with ``lax.fori_loop`` — unrolled Python loops re-trace the slot-compaction
argsort per step.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np

from justrelax_tpu.core.grid import Geometry
from justrelax_tpu.parallel import halo
from justrelax_tpu.particles.particles3d import (
    Particles3D,
    _trilinear,
    move_particles_3d,
)

Array = Any

__all__ = [
    "block_particles_3d",
    "unblock_particles_3d",
    "local_particle_geometry_3d",
    "advect_move_local_3d",
]

_AXES = ("x", "y", "z")


def _block_origins(particles, geometry, decomp):
    nl = decomp.ni_local
    di = geometry.di
    o = geometry.origin
    shapes = particles.px.shape[:3]
    outs = []
    for d in range(3):
        b = (np.arange(shapes[d]) // nl[d]) * nl[d] * di[d] + o[d]
        sh = [1, 1, 1, 1]
        sh[d] = shapes[d]
        outs.append(b.reshape(sh))
    return outs


def block_particles_3d(particles: Particles3D, geometry, decomp) -> Particles3D:
    """Host-side: make positions block-relative (cell containers are
    center-aligned, so the slot arrays shard as-is)."""
    bx, by, bz = _block_origins(particles, geometry, decomp)
    return particles.replace(
        px=jnp.asarray(np.asarray(particles.px) - bx),
        py=jnp.asarray(np.asarray(particles.py) - by),
        pz=jnp.asarray(np.asarray(particles.pz) - bz),
    )


def unblock_particles_3d(particles: Particles3D, geometry, decomp) -> Particles3D:
    bx, by, bz = _block_origins(particles, geometry, decomp)
    return particles.replace(
        px=jnp.asarray(np.asarray(particles.px) + bx),
        py=jnp.asarray(np.asarray(particles.py) + by),
        pz=jnp.asarray(np.asarray(particles.pz) + bz),
    )


def local_particle_geometry_3d(decomp, di) -> Tuple[Geometry, Geometry]:
    """(local block geometry, one-cell-extended geometry) shared by every
    device (positions are block-relative, origin 0)."""
    nl = decomp.ni_local
    g_loc = Geometry(nl, tuple(n * d for n, d in zip(nl, di)))
    g_ext = Geometry(
        tuple(n + 2 for n in nl),
        tuple((n + 2) * d for n, d in zip(nl, di)),
        origin=tuple(-d for d in di),
    )
    return g_loc, g_ext


def _extend_particles_3d(A, shifts, pos_axis):
    """Ghost-extend a (nxl, nyl, nzl, m) slot array by one cell per side on
    all three axes, shifting received positions (component ``pos_axis``)
    into the local frame."""
    for axis in range(3):
        name = _AXES[axis]
        lo_sl = [slice(None)] * A.ndim
        lo_sl[axis] = slice(0, 1)
        hi_sl = [slice(None)] * A.ndim
        hi_sl[axis] = slice(-1, None)
        hi_ghost = halo.from_next(A[tuple(lo_sl)], name)  # next's first slab
        lo_ghost = halo.from_prev(A[tuple(hi_sl)], name)  # prev's last slab
        if axis == pos_axis:
            hi_ghost = hi_ghost + shifts[axis]
            lo_ghost = lo_ghost - shifts[axis]
        A = jnp.concatenate([lo_ghost, A, hi_ghost], axis=axis)
    return A


def advect_move_local_3d(
    particles: Particles3D,
    fields: Dict[str, Array],
    Vx, Vy, Vz,
    decomp,
    di,
    dt,
) -> Tuple[Particles3D, Dict[str, Array]]:
    """Inside ``shard_map``: RK2 advection on ghost-extended local
    velocities, then cross-device migration + re-slotting. Positions are
    block-relative."""
    nl = decomp.ni_local
    dx, dy, dz = di
    g_loc, g_ext = local_particle_geometry_3d(decomp, di)
    lx, ly, lz = g_loc.li
    edges = tuple(halo.axis_edges(a) for a in _AXES)

    # --- one extra ghost face along each component's own axis ---------------
    # (the block duplicates the shared face, so the ghost is the neighbor's
    # PENULTIMATE face; physical boundaries replicate the edge, matching the
    # serial clamped trilinear)
    def _extend_faces(A, axis):
        name = _AXES[axis]
        pen = [slice(None)] * A.ndim
        pen[axis] = slice(-2, -1)
        sec = [slice(None)] * A.ndim
        sec[axis] = slice(1, 2)
        lo = halo.from_prev(A[tuple(pen)], name)
        hi = halo.from_next(A[tuple(sec)], name)
        first, last = edges[axis]
        lo_sl = [slice(None)] * A.ndim
        lo_sl[axis] = slice(0, 1)
        hi_sl = [slice(None)] * A.ndim
        hi_sl[axis] = slice(-1, None)
        lo = jnp.where(first, A[tuple(lo_sl)], lo)
        hi = jnp.where(last, A[tuple(hi_sl)], hi)
        return jnp.concatenate([lo, A, hi], axis=axis)

    Vx_e = _extend_faces(Vx, 0)  # (nxl+3, nyl+2, nzl+2): faces −1..nxl+1
    Vy_e = _extend_faces(Vy, 1)
    Vz_e = _extend_faces(Vz, 2)

    def vel(X, Y, Z):
        vx = _trilinear(Vx_e, -dx, -dy / 2, -dz / 2, dx, dy, dz, X, Y, Z)
        vy = _trilinear(Vy_e, -dx / 2, -dy, -dz / 2, dx, dy, dz, X, Y, Z)
        vz = _trilinear(Vz_e, -dx / 2, -dy / 2, -dz, dx, dy, dz, X, Y, Z)
        return vx, vy, vz

    X, Y, Z = particles.px, particles.py, particles.pz
    v1 = vel(X, Y, Z)
    Xh, Yh, Zh = X + 0.5 * dt * v1[0], Y + 0.5 * dt * v1[1], Z + 0.5 * dt * v1[2]
    v2 = vel(Xh, Yh, Zh)
    Xn, Yn, Zn = X + dt * v2[0], Y + dt * v2[1], Z + dt * v2[2]

    # clamp at PHYSICAL boundaries only (same eps as the serial advect_rk2_3d,
    # computed from the GLOBAL extents)
    eps = 1e-12 * max(decomp.px * lx, decomp.py * ly, decomp.pz * lz)
    news = []
    for axis, (new, ext) in enumerate(((Xn, lx), (Yn, ly), (Zn, lz))):
        first, last = edges[axis]
        new = jnp.where(first, jnp.maximum(new, eps), new)
        new = jnp.where(last, jnp.minimum(new, ext - eps), new)
        news.append(new)
    Xn, Yn, Zn = news
    a = particles.active
    Xn = jnp.where(a, Xn, X)
    Yn = jnp.where(a, Yn, Y)
    Zn = jnp.where(a, Zn, Z)

    # --- migrate: ghost-extend slots, serial re-slot, keep the interior -----
    shifts = (lx, ly, lz)
    px_e = _extend_particles_3d(Xn, shifts, 0)
    py_e = _extend_particles_3d(Yn, shifts, 1)
    pz_e = _extend_particles_3d(Zn, shifts, 2)
    a_e = _extend_particles_3d(particles.active, shifts, -1)
    # physical-boundary ghosts hold clamp-copies of our own edge: deactivate
    for axis in range(3):
        first, last = edges[axis]
        lo_sl = [slice(None)] * a_e.ndim
        lo_sl[axis] = 0
        hi_sl = [slice(None)] * a_e.ndim
        hi_sl[axis] = -1
        a_e = a_e.at[tuple(lo_sl)].set(
            jnp.where(first, False, a_e[tuple(lo_sl)])
        )
        a_e = a_e.at[tuple(hi_sl)].set(
            jnp.where(last, False, a_e[tuple(hi_sl)])
        )
    f_e = {k: _extend_particles_3d(v, shifts, -1) for k, v in fields.items()}

    p_ext = particles.replace(px=px_e, py=py_e, pz=pz_e, active=a_e)
    p_new, f_new = move_particles_3d(p_ext, g_ext, f_e)
    inner = (slice(1, -1), slice(1, -1), slice(1, -1))
    out = particles.replace(
        px=p_new.px[inner], py=p_new.py[inner], pz=p_new.pz[inner],
        active=p_new.active[inner],
    )
    return out, {k: v[inner] for k, v in f_new.items()}
