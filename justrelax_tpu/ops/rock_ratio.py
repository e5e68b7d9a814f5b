"""Rock-ratio masks for the variational (embedded free-surface) Stokes solver.

Reference: /root/reference/src/variational_stokes/mask.jl. The rock ratio
φ = 1 − (air phase fraction) lives at every staggered location (zeroed below
1e-5); validity predicates mark nullspace nodes (any adjacent velocity node
fully in air invalidates a center/vertex).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax.numpy as jnp

Array = Any

__all__ = ["RockRatio", "update_rock_ratio", "valid_masks"]

CUTOFF = 1.0e-5


class RockRatio(NamedTuple):
    center: Array  # (nx, ny)
    vertex: Array  # (nx+1, ny+1)
    Vx: Array  # (nx+1, ny)
    Vy: Array  # (nx, ny+1)


def _rock(r_air):
    x = 1.0 - r_air
    return jnp.clip(jnp.where(x > CUTOFF, x, 0.0), 0.0, 1.0)


def update_rock_ratio(phase_ratios, air_phase: int) -> RockRatio:
    """From a :class:`~justrelax_tpu.rheology.phases.PhaseRatios` bundle
    (center/vertex/face ratios) and the air phase index."""
    return RockRatio(
        center=_rock(phase_ratios.center[..., air_phase]),
        vertex=_rock(phase_ratios.vertex[..., air_phase]),
        Vx=_rock(phase_ratios.face_x[..., air_phase]),
        Vy=_rock(phase_ratios.face_y[..., air_phase]),
    )


class ValidMasks(NamedTuple):
    c: Array  # centers (nx, ny)
    v: Array  # vertices (nx+1, ny+1)
    vx: Array  # x faces (nx+1, ny)
    vy: Array  # y faces (nx, ny+1)


def valid_masks(phi: RockRatio) -> ValidMasks:
    """Nullspace predicates (mask.jl:160-260)."""
    pos = lambda A: A > 0
    vx_ok = pos(phi.Vx)
    vy_ok = pos(phi.Vy)
    c = vx_ok[:-1, :] & vx_ok[1:, :] & vy_ok[:, :-1] & vy_ok[:, 1:] & pos(phi.center)
    # vertex: clamped Vx rows j-1, j and Vy cols i-1, i
    def clamp_pad_x(A):  # pad along axis 0 with edge
        return jnp.pad(A, ((1, 1), (0, 0)), mode="edge")

    def clamp_pad_y(A):
        return jnp.pad(A, ((0, 0), (1, 1)), mode="edge")

    vxp = clamp_pad_y(vx_ok)  # (nx+1, ny+2): col j -> rows j-1/j clamped
    vyp = clamp_pad_x(vy_ok)
    v = (
        vxp[:, :-1] & vxp[:, 1:]  # Vx at rows j-1, j (clamped)
        & vyp[:-1, :] & vyp[1:, :]
        & pos(phi.vertex)
    )
    return ValidMasks(c=c, v=v, vx=vx_ok, vy=vy_ok)
