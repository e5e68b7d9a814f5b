"""Halo exchange primitives for shard_map'ed stencil solvers.

The reference's distributed model (ImplicitGlobalGrid/MPI, SURVEY.md §2.2) is
re-designed for a TPU mesh: the global cell grid is decomposed into *disjoint*
per-device tiles; staggered arrays are stored as per-device local blocks that
duplicate shared faces/vertices (the blocked-local container of decomp.py).
Inside ``shard_map``:

- cross-device neighbor values are fetched with :func:`extend` — a
  ``lax.ppermute`` of edge slices concatenated as ghost layers (the analogue
  of ``update_halo!``), with edge replication at physical boundaries;
- shared faces/vertices are *computed redundantly* by both adjacent devices
  from ghost-extended inputs ("compute in halo"), avoiding a second exchange
  per iteration;
- physical-boundary conditions are applied with ``jnp.where`` masks derived
  from ``lax.axis_index`` so only true domain edges see them.

All functions must be called inside a ``shard_map`` over a mesh with axes
named "x", "y"[, "z"] mapped to the leading array axes.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from jax import lax

Array = Any

__all__ = [
    "axis_edges",
    "is_first",
    "is_last",
    "from_prev",
    "from_next",
    "extend",
    "exchange_ghosts",
]

_AXES = ("x", "y", "z")


def is_first(mesh_axis: str):
    """Traced bool: this device is at the low end of ``mesh_axis``."""
    return lax.axis_index(mesh_axis) == 0


def is_last(mesh_axis: str):
    return lax.axis_index(mesh_axis) == lax.axis_size(mesh_axis) - 1


def axis_edges(mesh_axis: str):
    return is_first(mesh_axis), is_last(mesh_axis)


def from_prev(x: Array, mesh_axis: str) -> Array:
    """Each device receives ``x`` from its lower-index neighbor (cyclic).

    ppermute perm pairs are (source, destination): (i, i+1) sends i's value to
    i+1, so device j sees device j−1's ``x``.
    """
    n = lax.axis_size(mesh_axis)
    return lax.ppermute(x, mesh_axis, perm=[(i, (i + 1) % n) for i in range(n)])


def from_next(x: Array, mesh_axis: str) -> Array:
    """Each device receives ``x`` from its higher-index neighbor (cyclic)."""
    n = lax.axis_size(mesh_axis)
    return lax.ppermute(x, mesh_axis, perm=[(i, (i - 1) % n) for i in range(n)])


def extend(A: Array, axis: int, halo: int = 1, mesh_axis: Optional[str] = None) -> Array:
    """Ghost-extend a local block by ``halo`` layers on both sides of ``axis``.

    Interior devices receive the neighbor's adjacent layers; devices at the
    physical boundary replicate their own edge layer (clamped stencil
    semantics, matching the reference's boundary-clamped kernels).
    """
    if mesh_axis is None:
        mesh_axis = _AXES[axis]
    n = A.shape[axis]
    lo_slice = lax.slice_in_dim(A, 0, halo, axis=axis)  # my low edge
    hi_slice = lax.slice_in_dim(A, n - halo, n, axis=axis)  # my high edge

    ghost_from_left = from_prev(hi_slice, mesh_axis)  # left neighbor's high edge
    ghost_from_right = from_next(lo_slice, mesh_axis)  # right neighbor's low edge

    first, last = axis_edges(mesh_axis)
    # physical boundary: clamp (replicate the outermost layer halo times)
    if halo > 1:
        edge_lo = jnp.repeat(lax.slice_in_dim(A, 0, 1, axis=axis), halo, axis=axis)
        edge_hi = jnp.repeat(lax.slice_in_dim(A, n - 1, n, axis=axis), halo, axis=axis)
    else:
        edge_lo, edge_hi = lo_slice, hi_slice
    ghost_lo = jnp.where(first, edge_lo, ghost_from_left)
    ghost_hi = jnp.where(last, edge_hi, ghost_from_right)
    return jnp.concatenate([ghost_lo, A, ghost_hi], axis=axis)


def exchange_ghosts(A: Array, axis: int, n_owned: int, mesh_axis: Optional[str] = None) -> Array:
    """Refresh the outermost layers of an overlapping local block.

    For a block whose size along ``axis`` is ``n_owned + extra`` (extra ≥ 1
    overlap/ghost layers shared with neighbors), set
      ``A[0] ← left neighbor's A[n_owned]`` and
      ``A[-1] ← right neighbor's A[extra - 1 ... ]`` —
    i.e. the neighbor layer holding the same global position (the analogue of
    ``update_halo!`` for velocity ghost rows / ghosted T). Physical-boundary
    devices keep their existing (BC-determined) values.
    """
    if mesh_axis is None:
        mesh_axis = _AXES[axis]
    s = A.shape[axis]
    extra = s - n_owned
    if extra < 1:
        raise ValueError(f"array has no ghost layers along axis {axis}")
    # Blocked-local layout (decomp.block_staggered): tile r holds global
    # layers [r·n_owned, r·n_owned + n_owned + extra). Local j on tile r is
    # global r·n_owned + j, so my j=0 is the LEFT tile's local n_owned, and
    # my j=s−1 is the RIGHT tile's local extra−1. For extra ≥ 2 both source
    # layers are interior to their owner; layouts are unit-tested over
    # odd/even extra in tests/test_halo_unit.py.
    src_for_low = lax.slice_in_dim(A, n_owned, n_owned + 1, axis=axis)
    src_for_high = lax.slice_in_dim(A, extra - 1, extra, axis=axis)

    recv_lo = from_prev(src_for_low, mesh_axis)
    recv_hi = from_next(src_for_high, mesh_axis)

    first, last = axis_edges(mesh_axis)
    cur_lo = lax.slice_in_dim(A, 0, 1, axis=axis)
    cur_hi = lax.slice_in_dim(A, s - 1, s, axis=axis)
    new_lo = jnp.where(first, cur_lo, recv_lo)
    new_hi = jnp.where(last, cur_hi, recv_hi)

    mid = lax.slice_in_dim(A, 1, s - 1, axis=axis)
    return jnp.concatenate([new_lo, mid, new_hi], axis=axis)
