"""Phase-ratio fields from array phase data (reference src/phases/PhaseRatios.jl).

Given an integer phase field at cell centers (or a one-hot ratio field),
produce phase-fraction arrays at every staggered location: centers, vertices,
and x/y faces — bilinear-weighted neighbor averages with clamped boundaries,
the array-based twin of the particle route in
:mod:`justrelax_tpu.particles.particles`.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax.numpy as jnp

from justrelax_tpu.ops.stencil import av_a, expand_edges

Array = Any

__all__ = ["PhaseRatios", "phase_ratios_from_field", "one_hot_phases"]


class PhaseRatios(NamedTuple):
    center: Array  # (nx, ny, nphase)
    vertex: Array  # (nx+1, ny+1, nphase)
    face_x: Array  # (nx+1, ny, nphase)
    face_y: Array  # (nx, ny+1, nphase)


def one_hot_phases(phase_index: Array, nphase: int) -> Array:
    return jnp.stack([(phase_index == p).astype(jnp.result_type(float)) for p in range(nphase)], axis=-1)


def _normalize(r):
    s = jnp.sum(r, axis=-1, keepdims=True)
    return r / jnp.where(s == 0, 1.0, s)


def phase_ratios_from_field(phase_center, nphase: int = None) -> PhaseRatios:
    """Build all staggered ratio fields from center data.

    ``phase_center`` is either an integer phase-index field (nx, ny) with
    ``nphase`` given, or an already one-hot/fractional (nx, ny, nphase) field.
    """
    if phase_center.ndim == 2:
        ratios_c = one_hot_phases(phase_center, nphase)
    else:
        ratios_c = phase_center
    n = ratios_c.shape[-1]
    vert = []
    fx = []
    fy = []
    for p in range(n):
        padded = expand_edges(ratios_c[..., p])
        vert.append(av_a(padded))
        fx.append(0.5 * (padded[:-1, 1:-1] + padded[1:, 1:-1]))
        fy.append(0.5 * (padded[1:-1, :-1] + padded[1:-1, 1:]))
    vertex = _normalize(jnp.stack(vert, axis=-1))
    face_x = _normalize(jnp.stack(fx, axis=-1))
    face_y = _normalize(jnp.stack(fy, axis=-1))
    return PhaseRatios(
        center=_normalize(ratios_c), vertex=vertex, face_x=face_x, face_y=face_y
    )
