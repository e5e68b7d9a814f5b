"""Phase-ratio fields from array phase data (reference src/phases/PhaseRatios.jl).

Given an integer phase field at cell centers (or a one-hot ratio field),
produce phase-fraction arrays at every staggered location: centers, vertices,
faces (and shear edges in 3D) — clamped-neighbor averages, the array-based
twin of the particle route in :mod:`justrelax_tpu.particles.particles`.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax.numpy as jnp

from justrelax_tpu.ops.stencil import av_a, expand_edges

Array = Any

__all__ = [
    "PhaseRatios",
    "PhaseRatios3D",
    "phase_ratios_from_field",
    "one_hot_phases",
]


class PhaseRatios(NamedTuple):
    center: Array  # (nx, ny, nphase)
    vertex: Array  # (nx+1, ny+1, nphase)
    face_x: Array  # (nx+1, ny, nphase)
    face_y: Array  # (nx, ny+1, nphase)


class PhaseRatios3D(NamedTuple):
    center: Array  # (nx, ny, nz, nphase)
    vertex: Array  # (nx+1, ny+1, nz+1, nphase)
    face_x: Array  # (nx+1, ny, nz, nphase)
    face_y: Array  # (nx, ny+1, nz, nphase)
    face_z: Array  # (nx, ny, nz+1, nphase)
    edge_xy: Array  # (nx+1, ny+1, nz, nphase) — τxy locations
    edge_xz: Array  # (nx+1, ny, nz+1, nphase) — τxz locations
    edge_yz: Array  # (nx, ny+1, nz+1, nphase) — τyz locations


def one_hot_phases(phase_index: Array, nphase: int) -> Array:
    return jnp.stack(
        [(phase_index == p).astype(jnp.result_type(float)) for p in range(nphase)],
        axis=-1,
    )


def _normalize(r):
    s = jnp.sum(r, axis=-1, keepdims=True)
    return r / jnp.where(s == 0, 1.0, s)


def _av_axes(padded, axes):
    """Average the edge-clamped padded field over ``axes`` (2-point each),
    restricting every other axis to its interior — the generic clamped
    staggered-location average."""
    out = padded
    # restrict non-averaged axes to interior first
    sl = [slice(1, -1)] * padded.ndim
    for ax in axes:
        sl[ax] = slice(None)
    out = out[tuple(sl)]
    for ax in sorted(axes):
        lo = [slice(None)] * out.ndim
        hi = [slice(None)] * out.ndim
        lo[ax], hi[ax] = slice(None, -1), slice(1, None)
        out = 0.5 * (out[tuple(lo)] + out[tuple(hi)])
    return out


def phase_ratios_from_field(phase_center, nphase: Optional[int] = None):
    """Build all staggered ratio fields from center data (2D or 3D).

    ``phase_center`` is either an integer phase-index field (ni...) with
    ``nphase`` given, or an already one-hot/fractional (ni..., nphase) field
    (ambiguity resolved by whether ``nphase`` is provided). Returns
    :class:`PhaseRatios` in 2D, :class:`PhaseRatios3D` in 3D.
    """
    is_index = nphase is not None and (
        jnp.issubdtype(phase_center.dtype, jnp.integer)
        or phase_center.shape[-1] != nphase
    )
    ratios_c = one_hot_phases(phase_center, nphase) if is_index else phase_center
    ndim = ratios_c.ndim - 1
    n = ratios_c.shape[-1]

    def stag(axes):
        out = [
            _av_axes(expand_edges(ratios_c[..., p]), axes) for p in range(n)
        ]
        return _normalize(jnp.stack(out, axis=-1))

    if ndim == 2:
        return PhaseRatios(
            center=_normalize(ratios_c),
            vertex=stag((0, 1)),
            face_x=stag((0,)),
            face_y=stag((1,)),
        )
    return PhaseRatios3D(
        center=_normalize(ratios_c),
        vertex=stag((0, 1, 2)),
        face_x=stag((0,)),
        face_y=stag((1,)),
        face_z=stag((2,)),
        edge_xy=stag((0, 1)),
        edge_xz=stag((0, 2)),
        edge_yz=stag((1, 2)),
    )
