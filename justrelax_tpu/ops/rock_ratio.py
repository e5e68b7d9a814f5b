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

__all__ = [
    "RockRatio",
    "RockRatio3D",
    "update_rock_ratio",
    "update_rock_ratio_3d",
    "valid_masks",
    "valid_masks_3d",
]

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


# --- 3D (reference mask.jl RockRatio{T,3} + isvalid_* 3D) -------------------
class RockRatio3D(NamedTuple):
    center: Array  # (nx, ny, nz)
    vertex: Array  # (nx+1, ny+1, nz+1)
    Vx: Array  # (nx+1, ny, nz)
    Vy: Array  # (nx, ny+1, nz)
    Vz: Array  # (nx, ny, nz+1)
    xy: Array  # (nx+1, ny+1, nz)
    xz: Array  # (nx+1, ny, nz+1)
    yz: Array  # (nx, ny+1, nz+1)


def update_rock_ratio_3d(phase_ratios, air_phase: int) -> RockRatio3D:
    """From a :class:`~justrelax_tpu.rheology.phases.PhaseRatios3D` bundle."""
    pr = phase_ratios
    return RockRatio3D(
        center=_rock(pr.center[..., air_phase]),
        vertex=_rock(pr.vertex[..., air_phase]),
        Vx=_rock(pr.face_x[..., air_phase]),
        Vy=_rock(pr.face_y[..., air_phase]),
        Vz=_rock(pr.face_z[..., air_phase]),
        xy=_rock(pr.edge_xy[..., air_phase]),
        xz=_rock(pr.edge_xz[..., air_phase]),
        yz=_rock(pr.edge_yz[..., air_phase]),
    )


class ValidMasks3D(NamedTuple):
    c: Array
    xy: Array
    xz: Array
    yz: Array
    vx: Array
    vy: Array
    vz: Array


def _clamp_pad(A, axis):
    pad = [(0, 0)] * A.ndim
    pad[axis] = (1, 1)
    return jnp.pad(A, pad, mode="edge")


def valid_masks_3d(phi: RockRatio3D) -> ValidMasks3D:
    """3D nullspace predicates: a center is valid when its six faces carry
    rock; a shear edge when the four clamped adjacent faces of each of its
    two transverse families do (mask.jl isvalid_* 3D forms)."""
    pos = lambda A: A > 0
    vx_ok, vy_ok, vz_ok = pos(phi.Vx), pos(phi.Vy), pos(phi.Vz)
    c = (
        vx_ok[:-1, :, :] & vx_ok[1:, :, :]
        & vy_ok[:, :-1, :] & vy_ok[:, 1:, :]
        & vz_ok[:, :, :-1] & vz_ok[:, :, 1:]
        & pos(phi.center)
    )

    def edge_valid(edge_phi, ok_a, axis_a, ok_b, axis_b):
        # clamped 2-neighbor validity of each adjacent face family
        pa = _clamp_pad(ok_a, axis_a)
        sl_lo = [slice(None)] * 3
        sl_hi = [slice(None)] * 3
        sl_lo[axis_a], sl_hi[axis_a] = slice(None, -1), slice(1, None)
        va = pa[tuple(sl_lo)] & pa[tuple(sl_hi)]
        pb = _clamp_pad(ok_b, axis_b)
        sl_lo = [slice(None)] * 3
        sl_hi = [slice(None)] * 3
        sl_lo[axis_b], sl_hi[axis_b] = slice(None, -1), slice(1, None)
        vb = pb[tuple(sl_lo)] & pb[tuple(sl_hi)]
        return va & vb & pos(edge_phi)

    # τxy edges (nx+1, ny+1, nz): Vx spans y (axis 1), Vy spans x (axis 0)
    xy = edge_valid(phi.xy, vx_ok, 1, vy_ok, 0)
    # τxz edges (nx+1, ny, nz+1): Vx spans z (axis 2), Vz spans x (axis 0)
    xz = edge_valid(phi.xz, vx_ok, 2, vz_ok, 0)
    # τyz edges (nx, ny+1, nz+1): Vy spans z (axis 2), Vz spans y (axis 1)
    yz = edge_valid(phi.yz, vy_ok, 2, vz_ok, 1)
    return ValidMasks3D(c=c, xy=xy, xz=xz, yz=yz, vx=vx_ok, vy=vy_ok, vz=vz_ok)
