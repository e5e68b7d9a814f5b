"""Staggered-grid interpolation utilities.

Vectorized equivalents of /root/reference/src/Interpolations.jl: vertex↔center
averages, velocity interpolation onto vertices/centers, shear→center, and the
velocity↔displacement conversions.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp

from justrelax_tpu.ops.stencil import av_a

Array = Any

__all__ = [
    "vertex2center",
    "center2vertex",
    "center2vertex_harm",
    "velocity2vertex",
    "velocity2center",
    "shear2center",
    "velocity2displacement",
    "displacement2velocity",
]


def vertex2center(vertex: Array) -> Array:
    """(n+1)^d vertices → n^d centers, plain average (Interpolations.jl:72-93)."""
    return av_a(vertex)


def center2vertex(center: Array) -> Array:
    """n^d centers → (n+1)^d vertices: interior 4-point average, boundary
    rows/cols copied from the adjacent interior line (Interpolations.jl:101-109).
    """
    nx, ny = center.shape
    vertex = jnp.zeros((nx + 1, ny + 1), center.dtype)
    vertex = vertex.at[1:-1, 1:-1].set(av_a(center))
    vertex = vertex.at[0, :].set(vertex[1, :])
    vertex = vertex.at[-1, :].set(vertex[-2, :])
    vertex = vertex.at[:, 0].set(vertex[:, 1])
    vertex = vertex.at[:, -1].set(vertex[:, -2])
    return vertex


def center2vertex_harm(center: Array) -> Array:
    """Harmonic clamped center→vertex average (Interpolations.jl:116-137)."""
    from justrelax_tpu.ops.stencil import expand_edges, harm_a

    return harm_a(expand_edges(center))


def velocity2vertex(Vx: Array, Vy: Array) -> Tuple[Array, Array]:
    """Ghosted staggered velocities → vertex values (nx+1, ny+1)
    (Interpolations.jl:237-248)."""
    Vx_v = 0.5 * (Vx[:, :-1] + Vx[:, 1:])
    Vy_v = 0.5 * (Vy[:-1, :] + Vy[1:, :])
    return Vx_v, Vy_v


def velocity2center(Vx: Array, Vy: Array) -> Tuple[Array, Array]:
    """Staggered velocities → cell centers."""
    Vx_c = 0.5 * (Vx[:-1, 1:-1] + Vx[1:, 1:-1])
    Vy_c = 0.5 * (Vy[1:-1, :-1] + Vy[1:-1, 1:])
    return Vx_c, Vy_c


def shear2center(xy_vertex: Array) -> Array:
    """Vertex shear component → centers (Interpolations.jl:306-311)."""
    return av_a(xy_vertex)


def velocity2displacement(V: Tuple, dt) -> Tuple:
    """U = V·dt (reference src/types/displacement.jl)."""
    return tuple(v * dt for v in V)


def displacement2velocity(U: Tuple, dt) -> Tuple:
    return tuple(u / dt for u in U)
