"""Pseudo-transient thermal diffusion kernels (2D and 3D).

Vectorized equivalents of the reference's flux/update/residual sweeps
(/root/reference/src/thermal_diffusion/DiffusionPT_kernels.jl: 2D at 327-669,
3D at 6-326). Shapes (2D): T ghosted ``(nx+2, ny+2)``, fluxes on faces
qTx ``(nx+1, ny)`` / qTy ``(nx, ny+1)``, coefficients and sources at centers
``(nx, ny)``.

The PT flux relaxation is
    q_new = (q_old·θ + q_physical) / (1 + θ),  θ = face-averaged θr_dτ
and the temperature update is the damped implicit form
    T ← (dτ_ρ·(−∇·q + Told·ρCp/dt + H_tot) + T) / (1 + dτ_ρ·ρCp/dt).

Material properties are either precomputed center arrays (``K``, ``rho_Cp``)
or evaluated from a :class:`~justrelax_tpu.rheology.materials.MaterialStack`.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp

from justrelax_tpu.ops.bc import Faces
from justrelax_tpu.ops.stencil import interior_set
from justrelax_tpu.rheology import materials as mat

Array = Any

__all__ = [
    "compute_flux",
    "update_T",
    "check_res",
    "face_average_x",
    "face_average_y",
    "face_average_z",
]


def _pad_edge(A, axis):
    pad = [(0, 0)] * A.ndim
    pad[axis] = (1, 1)
    return jnp.pad(A, pad, mode="edge")


def face_average_x(C):
    """Center field → x-faces incl. boundary faces, edge-clamped (nx+1, ny[, nz])."""
    Cp = _pad_edge(C, 0)
    return 0.5 * (Cp[:-1, ...] + Cp[1:, ...])


def face_average_y(C):
    Cp = _pad_edge(C, 1)
    return 0.5 * (Cp[:, :-1, ...] + Cp[:, 1:, ...])


def face_average_z(C):
    Cp = _pad_edge(C, 2)
    return 0.5 * (Cp[:, :, :-1] + Cp[:, :, 1:])


def _grad_T(T, inv_di):
    """Temperature gradients on faces from the ghosted T array."""
    if T.ndim == 2:
        dTdx = (T[1:, 1:-1] - T[:-1, 1:-1]) * inv_di[0]  # (nx+1, ny)
        dTdy = (T[1:-1, 1:] - T[1:-1, :-1]) * inv_di[1]  # (nx, ny+1)
        return dTdx, dTdy
    dTdx = (T[1:, 1:-1, 1:-1] - T[:-1, 1:-1, 1:-1]) * inv_di[0]
    dTdy = (T[1:-1, 1:, 1:-1] - T[1:-1, :-1, 1:-1]) * inv_di[1]
    dTdz = (T[1:-1, 1:-1, 1:] - T[1:-1, 1:-1, :-1]) * inv_di[2]
    return dTdx, dTdy, dTdz


def _face_T(T):
    """Face-interpolated temperature (average of the two straddling centers)."""
    if T.ndim == 2:
        Tx = 0.5 * (T[:-1, 1:-1] + T[1:, 1:-1])
        Ty = 0.5 * (T[1:-1, :-1] + T[1:-1, 1:])
        return Tx, Ty
    Tx = 0.5 * (T[:-1, 1:-1, 1:-1] + T[1:, 1:-1, 1:-1])
    Ty = 0.5 * (T[1:-1, :-1, 1:-1] + T[1:-1, 1:, 1:-1])
    Tz = 0.5 * (T[1:-1, 1:-1, :-1] + T[1:-1, 1:-1, 1:])
    return Tx, Ty, Tz


def _face_conductivities(T, P, material, phase_ratios_faces):
    """Per-face conductivity: mean of the two straddling center evaluations,
    both at the face temperature (reference compute_flux! rheology variant)."""
    faces_T = _face_T(T)
    ndim = T.ndim
    Ks = []
    for axis in range(ndim):
        Tf = faces_T[axis]
        Pp = _pad_edge(P, axis)
        lo = tuple(slice(0, -1) if a == axis else slice(None) for a in range(ndim))
        hi = tuple(slice(1, None) if a == axis else slice(None) for a in range(ndim))
        pr = None if phase_ratios_faces is None else phase_ratios_faces[axis]
        if pr is None:
            K1 = mat.compute_conductivity(material, T=Tf, P=Pp[lo])
            K2 = mat.compute_conductivity(material, T=Tf, P=Pp[hi])
            Ks.append(0.5 * (K1 + K2))
        else:
            # face-resident phase ratios: evaluate K at the face directly with
            # the face temperature and side-averaged pressure
            Pf = 0.5 * (Pp[lo] + Pp[hi])
            Ks.append(mat.compute_conductivity(material, T=Tf, P=Pf, phase_ratios=pr))
    return tuple(Ks)


def _apply_constant_flux(q, axis_faces: Tuple[str, str], bc_flux: Faces, q_axis: int):
    lo, hi = axis_faces
    v_lo = getattr(bc_flux, lo)
    v_hi = getattr(bc_flux, hi)
    if Faces.active(v_lo):
        idx = tuple(0 if a == q_axis else slice(None) for a in range(q.ndim))
        q = q.at[idx].set(v_lo)
    if Faces.active(v_hi):
        idx = tuple(q.shape[a] - 1 if a == q_axis else slice(None) for a in range(q.ndim))
        q = q.at[idx].set(v_hi)
    return q


_FACE_NAMES_2D = (("left", "right"), ("bot", "top"))
_FACE_NAMES_3D = (("left", "right"), ("front", "back"), ("bot", "top"))


def compute_flux(
    q: Tuple[Array, ...],
    q2: Tuple[Array, ...],
    T: Array,
    inv_di: Tuple[float, ...],
    theta_r_dtau: Array,
    bc_flux: Faces,
    K: Optional[Array] = None,
    material=None,
    P: Optional[Array] = None,
    phase_ratios_faces=None,
):
    """One PT flux relaxation sweep. Returns (q_new, q2_new) tuples.

    Either ``K`` (center conductivity array) or ``material`` (+ optional P,
    face phase ratios) must be given.
    """
    ndim = T.ndim
    names = _FACE_NAMES_2D if ndim == 2 else _FACE_NAMES_3D
    grads = _grad_T(T, inv_di)
    if K is not None:
        face_avg = (face_average_x, face_average_y, face_average_z)
        Kf = tuple(face_avg[a](K) for a in range(ndim))
    else:
        Kf = _face_conductivities(T, P, material, phase_ratios_faces)
    face_avg = (face_average_x, face_average_y, face_average_z)
    q_new, q2_new = [], []
    for a in range(ndim):
        theta = face_avg[a](theta_r_dtau)
        qa_phys = -Kf[a] * grads[a]
        qa = (q[a] * theta + qa_phys) / (1.0 + theta)
        qa = _apply_constant_flux(qa, names[a], bc_flux, a)
        qa2 = _apply_constant_flux(qa_phys, names[a], bc_flux, a)
        q_new.append(qa)
        q2_new.append(qa2)
    return tuple(q_new), tuple(q2_new)


def _div(q, inv_di):
    ndim = len(q)
    if ndim == 2:
        return (q[0][1:, :] - q[0][:-1, :]) * inv_di[0] + (
            q[1][:, 1:] - q[1][:, :-1]
        ) * inv_di[1]
    return (
        (q[0][1:, :, :] - q[0][:-1, :, :]) * inv_di[0]
        + (q[1][:, 1:, :] - q[1][:, :-1, :]) * inv_di[1]
        + (q[2][:, :, 1:] - q[2][:, :, :-1]) * inv_di[2]
    )


def _interior(T):
    return T[tuple(slice(1, -1) for _ in range(T.ndim))]


def _total_source(material, phase_ratios, H, shear_heating, adiabatic, T_in):
    src = H + shear_heating
    if material is not None:
        src = src + mat.compute_radioactive_heating(material, phase_ratios)
    if adiabatic is not None:
        src = src + adiabatic * T_in
    return src


def update_T(
    T: Array,
    Told: Array,
    q: Tuple[Array, ...],
    H: Array,
    shear_heating: Array,
    inv_dt: float,
    inv_di: Tuple[float, ...],
    dtau_rho: Array,
    rho_Cp: Optional[Array] = None,
    material=None,
    P: Optional[Array] = None,
    phase_ratios: Optional[Array] = None,
    adiabatic: Optional[Array] = None,
    dirichlet=None,
):
    """Damped PT temperature update; returns the new ghosted T array."""
    T_in = _interior(T)
    Told_in = _interior(Told)
    if rho_Cp is None:
        rho_Cp = mat.compute_rhoCp(material, T=T_in, P=P, phase_ratios=phase_ratios)
    divq = _div(q, inv_di)
    src = _total_source(material, phase_ratios, H, shear_heating, adiabatic, T_in)
    num = dtau_rho * (-divq + Told_in * rho_Cp * inv_dt + src) + T_in
    den = 1.0 + dtau_rho * rho_Cp * inv_dt
    T_new_in = num / den
    if dirichlet is not None:
        mask, value = dirichlet
        T_new_in = jnp.where(mask, value, T_new_in)
    return interior_set(T, T_new_in)


def check_res(
    T: Array,
    Told: Array,
    q2: Tuple[Array, ...],
    H: Array,
    shear_heating: Array,
    inv_dt: float,
    inv_di: Tuple[float, ...],
    rho_Cp: Optional[Array] = None,
    material=None,
    P: Optional[Array] = None,
    phase_ratios: Optional[Array] = None,
    adiabatic: Optional[Array] = None,
    dirichlet=None,
):
    """Physical residual of the heat equation at cell centers."""
    T_in = _interior(T)
    Told_in = _interior(Told)
    if rho_Cp is None:
        rho_Cp = mat.compute_rhoCp(material, T=T_in, P=P, phase_ratios=phase_ratios)
    divq2 = _div(q2, inv_di)
    src = _total_source(material, phase_ratios, H, shear_heating, adiabatic, T_in)
    res = -rho_Cp * (T_in - Told_in) * inv_dt - divq2 + src
    if dirichlet is not None:
        mask, _ = dirichlet
        res = jnp.where(mask, 0.0, res)
    return res
