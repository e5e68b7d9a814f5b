"""Ghost-node boundary conditions for staggered fields.

Functional equivalents of the reference BC kernels
(/root/reference/src/boundaryconditions/{types.jl,free_slip.jl,no_slip.jl,
constant_value.jl,periodic.jl,BoundaryConditions.jl}). BC configs are static
frozen dataclasses (they select program structure, not traced values); the
apply functions are pure ``array -> array``.

Face naming follows the reference: in 2D ``left/right`` bound the x-axis and
``bot/top`` the y-axis; in 3D ``front/back`` bound the y-axis and ``bot/top``
the z-axis.

Application order (reference BoundaryConditions.jl:46-54, 82-95):
  thermal: constant_value → no_flux → periodic (later writes win)
  flow   : no_slip → free_slip
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

__all__ = [
    "Faces",
    "TemperatureBoundaryConditions",
    "VelocityBoundaryConditions",
    "DisplacementBoundaryConditions",
    "thermal_bcs",
    "flow_bcs",
    "pureshear_bc",
    "free_surface_vy",
]

Value = Union[bool, float, None]


@dataclasses.dataclass(frozen=True)
class Faces:
    """Per-face BC setting. ``False``/``None`` disables a face.

    For flag-style BCs (free_slip, no_flux, ...) use booleans; for valued BCs
    (constant_value, constant_flux) use floats.
    """

    left: Value = False
    right: Value = False
    bot: Value = False
    top: Value = False
    front: Value = False
    back: Value = False

    def any(self) -> bool:
        return any(
            v is not False and v is not None
            for v in (self.left, self.right, self.bot, self.top, self.front, self.back)
        )

    @staticmethod
    def active(v) -> bool:
        """A face carries a *value* only if it is not a bool/None (reference
        semantics: `!isa(bc.left, Bool)`)."""
        return v is not None and not isinstance(v, bool)

    @staticmethod
    def on(v) -> bool:
        return v is True


def _as_faces(f) -> Faces:
    if f is None:
        return Faces()
    if isinstance(f, Faces):
        return f
    if isinstance(f, dict):
        return Faces(**f)
    raise TypeError(f"cannot interpret {f!r} as Faces")


@dataclasses.dataclass(frozen=True)
class TemperatureBoundaryConditions:
    no_flux: Faces = Faces()
    constant_value: Faces = Faces()
    constant_flux: Faces = Faces()
    periodic: Faces = Faces()

    def __init__(self, no_flux=None, constant_value=None, constant_flux=None, periodic=None):
        object.__setattr__(self, "no_flux", _as_faces(no_flux))
        object.__setattr__(self, "constant_value", _as_faces(constant_value))
        object.__setattr__(self, "constant_flux", _as_faces(constant_flux))
        object.__setattr__(self, "periodic", _as_faces(periodic))


@dataclasses.dataclass(frozen=True)
class VelocityBoundaryConditions:
    no_slip: Faces = Faces()
    free_slip: Faces = Faces()
    free_surface: bool = False

    def __init__(self, no_slip=None, free_slip=None, free_surface=False):
        object.__setattr__(self, "no_slip", _as_faces(no_slip))
        object.__setattr__(self, "free_slip", _as_faces(free_slip))
        object.__setattr__(self, "free_surface", bool(free_surface))


@dataclasses.dataclass(frozen=True)
class DisplacementBoundaryConditions(VelocityBoundaryConditions):
    pass


# --- scalar (temperature) BCs ----------------------------------------------
def _set_face(A, axis: int, side: int, values):
    """Write ``values`` into the ghost slice of ``A`` on (axis, side)."""
    idx = [slice(None)] * A.ndim
    idx[axis] = 0 if side == 0 else A.shape[axis] - 1
    return A.at[tuple(idx)].set(values)


def _face(A, axis: int, k: int):
    idx = [slice(None)] * A.ndim
    idx[axis] = k
    return A[tuple(idx)]


def _axis_faces(ndim: int):
    """Map (axis, side) -> face-name per reference convention."""
    if ndim == 2:
        return {(0, 0): "left", (0, 1): "right", (1, 0): "bot", (1, 1): "top"}
    return {
        (0, 0): "left",
        (0, 1): "right",
        (1, 0): "front",
        (1, 1): "back",
        (2, 0): "bot",
        (2, 1): "top",
    }


_ORDER_2D = [(1, 0), (1, 1), (0, 0), (0, 1)]  # bot, top, left, right
_ORDER_3D = [(2, 0), (2, 1), (0, 0), (0, 1), (1, 0), (1, 1)]


def _face_order(ndim: int):
    return _ORDER_2D if ndim == 2 else _ORDER_3D


def thermal_bcs(T, bcs: TemperatureBoundaryConditions):
    """Apply scalar BCs to a ghosted temperature array, returning a new array.

    - constant_value: ghost = 2·value − interior  (Dirichlet at the face)
    - no_flux: ghost = interior (mirror)
    - periodic: ghost = opposite interior
    """
    ndim = T.ndim
    names = _axis_faces(ndim)
    order = _face_order(ndim)

    if bcs.constant_value.any():
        for axis, side in order:
            v = getattr(bcs.constant_value, names[(axis, side)])
            if Faces.active(v):
                inner = _face(T, axis, 1 if side == 0 else -2)
                T = _set_face(T, axis, side, 2.0 * v - inner)
    if bcs.no_flux.any():
        for axis, side in order:
            if Faces.on(getattr(bcs.no_flux, names[(axis, side)])):
                T = _set_face(T, axis, side, _face(T, axis, 1 if side == 0 else -2))
    if bcs.periodic.any():
        for axis, side in order:
            if Faces.on(getattr(bcs.periodic, names[(axis, side)])):
                T = _set_face(T, axis, side, _face(T, axis, -2 if side == 0 else 1))
    return T


# --- velocity BCs -----------------------------------------------------------
def _free_slip_velocity_2d(Vx, Vy, fs: Faces):
    """Mirror tangential components into ghost layers (free_slip.jl:1-15)."""
    if Faces.on(fs.bot):
        Vx = _slab_set(Vx, 1, 0, 1)
    if Faces.on(fs.top):
        Vx = _slab_set(Vx, 1, -1, -2)
    if Faces.on(fs.left):
        Vy = _slab_set(Vy, 0, 0, 1)
    if Faces.on(fs.right):
        Vy = _slab_set(Vy, 0, -1, -2)
    return Vx, Vy


def _no_slip_velocity_2d(Vx, Vy, ns: Faces):
    """Zero normal component on the face; negative-mirror tangential ghosts
    (no_slip.jl:1-20, including the bottom-row Vx/3 smoothing)."""
    if Faces.on(ns.left):
        Vx = _slab_set(Vx, 0, 0, None)
        Vy = _slab_set(Vy, 0, 0, 1, scale=-1.0)
    if Faces.on(ns.right):
        Vx = _slab_set(Vx, 0, -1, None)
        Vy = _slab_set(Vy, 0, -1, -2, scale=-1.0)
    if Faces.on(ns.bot):
        Vx = _slab_set(Vx, 1, 1, 2, scale=1.0 / 3.0)
        Vx = _slab_set(Vx, 1, 0, 1, scale=-1.0)
        Vy = _slab_set(Vy, 1, 0, None)
    if Faces.on(ns.top):
        Vx = _slab_set(Vx, 1, -1, -2, scale=-1.0)
        Vy = _slab_set(Vy, 1, -1, None)
    return Vx, Vy


def _slab_set(A, axis: int, dst: int, src: Optional[int], scale=None):
    """``A`` with its ``dst`` slice along ``axis`` replaced by
    ``scale·A[src slab]`` (or 0 when ``src`` is None), as a single fused
    mask+select instead of a dynamic-update-slice — one elementwise pass per
    array regardless of how many faces are set (see
    ops/stencil.py::interior_set; measured +33% on the 3D VE iteration)."""
    dst_i = dst if dst >= 0 else A.shape[axis] + dst
    idx = jax.lax.broadcasted_iota(jnp.int32, A.shape, axis)
    mask = idx == dst_i
    if src is None:
        return jnp.where(mask, jnp.zeros((), A.dtype), A)
    sl = [slice(None)] * A.ndim
    src_i = src if src >= 0 else A.shape[axis] + src
    sl[axis] = slice(src_i, src_i + 1)
    slab = A[tuple(sl)]
    if scale is not None:
        slab = slab * jnp.asarray(scale, A.dtype)
    return jnp.where(mask, slab, A)


def _face_set(A, axis: int, side: int, src: Optional[int], negate=False):
    return _slab_set(
        A, axis, 0 if side == 0 else -1, src, scale=-1.0 if negate else None
    )


def _free_slip_velocity_3d(Vx, Vy, Vz, fs: Faces):
    """3D tangential mirrors (free_slip.jl:17-70), fused mask+select form."""
    if Faces.on(fs.front):
        Vx = _face_set(Vx, 1, 0, 1)
        Vz = _face_set(Vz, 1, 0, 1)
    if Faces.on(fs.back):
        Vx = _face_set(Vx, 1, 1, -2)
        Vz = _face_set(Vz, 1, 1, -2)
    if Faces.on(fs.top):
        Vx = _face_set(Vx, 2, 0, 1)
        Vy = _face_set(Vy, 2, 0, 1)
    if Faces.on(fs.bot):
        Vx = _face_set(Vx, 2, 1, -2)
        Vy = _face_set(Vy, 2, 1, -2)
    if Faces.on(fs.left):
        Vy = _face_set(Vy, 0, 0, 1)
        Vz = _face_set(Vz, 0, 0, 1)
    if Faces.on(fs.right):
        Vy = _face_set(Vy, 0, 1, -2)
        Vz = _face_set(Vz, 0, 1, -2)
    return Vx, Vy, Vz


def _no_slip_velocity_3d(Vx, Vy, Vz, ns: Faces):
    if Faces.on(ns.left):
        Vx = _slab_set(Vx, 0, 0, None)
        Vy = _slab_set(Vy, 0, 0, 1, scale=-1.0)
        Vz = _slab_set(Vz, 0, 0, 1, scale=-1.0)
    if Faces.on(ns.right):
        Vx = _slab_set(Vx, 0, -1, None)
        Vy = _slab_set(Vy, 0, -1, -2, scale=-1.0)
        Vz = _slab_set(Vz, 0, -1, -2, scale=-1.0)
    if Faces.on(ns.front):
        Vx = _slab_set(Vx, 1, 0, 1, scale=-1.0)
        Vy = _slab_set(Vy, 1, 0, None)
        Vz = _slab_set(Vz, 1, 0, 1, scale=-1.0)
    if Faces.on(ns.back):
        Vx = _slab_set(Vx, 1, -1, -2, scale=-1.0)
        Vy = _slab_set(Vy, 1, -1, None)
        Vz = _slab_set(Vz, 1, -1, -2, scale=-1.0)
    if Faces.on(ns.bot):
        Vx = _slab_set(Vx, 2, 0, 1, scale=-1.0)
        Vy = _slab_set(Vy, 2, 0, 1, scale=-1.0)
        Vz = _slab_set(Vz, 2, 0, None)
    if Faces.on(ns.top):
        Vx = _slab_set(Vx, 2, -1, -2, scale=-1.0)
        Vy = _slab_set(Vy, 2, -1, -2, scale=-1.0)
        Vz = _slab_set(Vz, 2, -1, None)
    return Vx, Vy, Vz


def flow_bcs(V: Tuple, bcs: VelocityBoundaryConditions) -> Tuple:
    """Apply velocity BCs to the components tuple (Vx, Vy[, Vz])."""
    if len(V) == 2:
        Vx, Vy = V
        if bcs.no_slip.any():
            Vx, Vy = _no_slip_velocity_2d(Vx, Vy, bcs.no_slip)
        if bcs.free_slip.any():
            Vx, Vy = _free_slip_velocity_2d(Vx, Vy, bcs.free_slip)
        return Vx, Vy
    Vx, Vy, Vz = V
    if bcs.no_slip.any():
        Vx, Vy, Vz = _no_slip_velocity_3d(Vx, Vy, Vz, bcs.no_slip)
    if bcs.free_slip.any():
        Vx, Vy, Vz = _free_slip_velocity_3d(Vx, Vy, Vz, bcs.free_slip)
    return Vx, Vy, Vz


def pureshear_bc(Vx, Vy, xvi, eps_bg):
    """Pure-shear background velocity field (reference pure_shear.jl:1-9):
    Vx[:, 1:-1] = εbg·xv, Vy[1:-1, :] = −εbg·yv (ghost rows untouched)."""
    xv = jnp.asarray(xvi[0], dtype=Vx.dtype)
    yv = jnp.asarray(xvi[1], dtype=Vy.dtype)
    Vx = Vx.at[:, 1:-1].set(jnp.broadcast_to((eps_bg * xv)[:, None], (Vx.shape[0], Vx.shape[1] - 2)))
    Vy = Vy.at[1:-1, :].set(jnp.broadcast_to((-eps_bg * yv)[None, :], (Vy.shape[0] - 2, Vy.shape[1])))
    return Vx, Vy


def free_surface_vy(Vx, Vy, P, P_old, tyy_old, eta, Gdt, inv_dx, inv_dy, nu=1.0e-2):
    """Analytic free-surface condition on the top Vy row (reference
    FreeSurface_Vy!, free_surface.jl:38-67): the zero-traction normal stress
    at the surface gives

      Vy[top] = Vy[top−1] + 3/2·(P/(2η) + (τyy_o + P_o)/(2 G dt)
                                 + (∂Vx/∂x)|_{top−1}/3)·dy,

    under-relaxed by ``nu`` (reference ν = 1e-2). ``P``/``P_old``/``tyy_old``/
    ``eta`` are the top-row center values (shape (nx,)); ``Gdt`` is G·dt at
    the same cells (∞ ⇒ purely viscous). Updates interior columns of the top
    ghost row of Vy.
    """
    dVx_dx = (Vx[1:, -2] - Vx[:-1, -2]) * inv_dx  # (nx,) at top-1 row
    target = Vy[1:-1, -2] + 1.5 * (
        P / (2.0 * eta) + (tyy_old + P_old) / (2.0 * Gdt) + dVx_dx / 3.0
    ) / inv_dy
    return Vy.at[1:-1, -1].set(nu * target + (1.0 - nu) * Vy[1:-1, -1])
