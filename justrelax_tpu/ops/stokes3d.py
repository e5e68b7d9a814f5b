"""Stokes stencil kernels, 3D.

Vectorized equivalents of the reference 3D sweeps
(/root/reference/src/stokes/VelocityKernels.jl:59-242,
StressKernels.jl:148-232). Staggered shapes per core/state.py; axis order
(x, y, z); shear components live on cell edges:
εyz/τyz (nx, ny+1, nz+1), εxz/τxz (nx+1, ny, nz+1), εxy/τxy (nx+1, ny+1, nz).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

Array = Any

__all__ = [
    "compute_grad_V_3d",
    "compute_strain_rate_3d",
    "compute_tau_ve_3d",
    "compute_V_3d",
    "tensor_invariant_staggered_3d",
]


def compute_grad_V_3d(Vx, Vy, Vz, inv_di):
    return (
        (Vx[1:, 1:-1, 1:-1] - Vx[:-1, 1:-1, 1:-1]) * inv_di[0]
        + (Vy[1:-1, 1:, 1:-1] - Vy[1:-1, :-1, 1:-1]) * inv_di[1]
        + (Vz[1:-1, 1:-1, 1:] - Vz[1:-1, 1:-1, :-1]) * inv_di[2]
    )


def compute_strain_rate_3d(grad_V, Vx, Vy, Vz, inv_di):
    """Deviatoric strain rate: normal at centers, shear on edges
    (VelocityKernels.jl:59-104)."""
    _dx, _dy, _dz = inv_di
    third = 1.0 / 3.0
    exx = (Vx[1:, 1:-1, 1:-1] - Vx[:-1, 1:-1, 1:-1]) * _dx - grad_V * third
    eyy = (Vy[1:-1, 1:, 1:-1] - Vy[1:-1, :-1, 1:-1]) * _dy - grad_V * third
    ezz = (Vz[1:-1, 1:-1, 1:] - Vz[1:-1, 1:-1, :-1]) * _dz - grad_V * third
    eyz = 0.5 * (
        (Vy[1:-1, :, 1:] - Vy[1:-1, :, :-1]) * _dz
        + (Vz[1:-1, 1:, :] - Vz[1:-1, :-1, :]) * _dy
    )
    exz = 0.5 * (
        (Vx[:, 1:-1, 1:] - Vx[:, 1:-1, :-1]) * _dz
        + (Vz[1:, 1:-1, :] - Vz[:-1, 1:-1, :]) * _dx
    )
    exy = 0.5 * (
        (Vx[:, 1:, 1:-1] - Vx[:, :-1, 1:-1]) * _dy
        + (Vy[1:, :, 1:-1] - Vy[:-1, :, 1:-1]) * _dx
    )
    return exx, eyy, ezz, eyz, exz, exy


def _av_edge_xy(A):
    """Centers → interior xy-edges (nx-1, ny-1, nz)."""
    return 0.25 * (A[:-1, :-1, :] + A[1:, :-1, :] + A[:-1, 1:, :] + A[1:, 1:, :])


def _av_edge_xz(A):
    return 0.25 * (A[:-1, :, :-1] + A[1:, :, :-1] + A[:-1, :, 1:] + A[1:, :, 1:])


def _av_edge_yz(A):
    return 0.25 * (A[:, :-1, :-1] + A[:, 1:, :-1] + A[:, :-1, 1:] + A[:, 1:, 1:])


def _dtau_r(theta_dtau, eta, _Gdt):
    return 1.0 / (theta_dtau + eta * _Gdt + 1.0)


def _inc(tau, tau_o, eta, eps, _Gdt, dtau_r):
    return dtau_r * (2.0 * eta * eps - (tau - tau_o) * eta * _Gdt - tau)


def _pad_edge2(A, ax0, ax1):
    pads = [(0, 0)] * 3
    pads[ax0] = (1, 1)
    pads[ax1] = (1, 1)
    return jnp.pad(A, pads, mode="edge")


def _pad2(A, ax0, ax1):
    """Zero-pad one layer on both sides of two axes (pad+add idiom: a
    misaligned-slab ``.at[1:-1,...].add`` lowers to a dynamic-update-slice
    that costs ~3x the whole PT iteration on TPU; a zero-pad fuses)."""
    pads = [(0, 0)] * 3
    pads[ax0] = (1, 1)
    pads[ax1] = (1, 1)
    return jnp.pad(A, pads)


def compute_tau_ve_3d(tau, tau_o, eps, eta, G, theta_dtau, dt, boundary_shear=False):
    """VE PT stress update (StressKernels.jl:148-232). ``tau``/``tau_o``/``eps``
    are 6-tuples (xx, yy, zz, yz, xz, xy).

    ``boundary_shear=False`` mirrors the reference: shear components update
    only on interior edges (boundary edges stay at their BC-determined value —
    correct for free-slip where τ_shear = 0). With ``True``, boundary edges
    update too (clamped-average material properties) — required for
    Dirichlet-velocity problems (e.g. Burstedde) where the physical boundary
    shear stress is nonzero; the reference leaves those edges at 0, which is
    inconsistent (its Burstedde test is excluded from CI, runtests.jl:60-62).
    """
    txx, tyy, tzz, tyz, txz, txy = tau
    txx_o, tyy_o, tzz_o, tyz_o, txz_o, txy_o = tau_o
    exx, eyy, ezz, eyz, exz, exy = eps

    _Gdt = 1.0 / (G * dt)
    dr = _dtau_r(theta_dtau, eta, _Gdt)
    txx = txx + _inc(txx, txx_o, eta, exx, _Gdt, dr)
    tyy = tyy + _inc(tyy, tyy_o, eta, eyy, _Gdt, dr)
    tzz = tzz + _inc(tzz, tzz_o, eta, ezz, _Gdt, dr)

    if boundary_shear:
        # clamped-average η/G onto ALL edges, update every edge value
        def upd(t, t_o, e, av, ax0, ax1):
            eta_e = av(_pad_edge2(eta, ax0, ax1))
            G_e = av(_pad_edge2(G, ax0, ax1))
            _G_e = 1.0 / (G_e * dt)
            dr_e = _dtau_r(theta_dtau, eta_e, _G_e)
            return t + _inc(t, t_o, eta_e, e, _G_e, dr_e)

        txy = upd(txy, txy_o, exy, _av_edge_xy, 0, 1)
        txz = upd(txz, txz_o, exz, _av_edge_xz, 0, 2)
        tyz = upd(tyz, tyz_o, eyz, _av_edge_yz, 1, 2)
        return txx, tyy, tzz, tyz, txz, txy

    eta_xy, G_xy = _av_edge_xy(eta), _av_edge_xy(G)
    _G_xy = 1.0 / (G_xy * dt)
    dr_xy = _dtau_r(theta_dtau, eta_xy, _G_xy)
    txy = txy + _pad2(
        _inc(txy[1:-1, 1:-1, :], txy_o[1:-1, 1:-1, :], eta_xy, exy[1:-1, 1:-1, :], _G_xy, dr_xy),
        0, 1,
    )
    eta_xz, G_xz = _av_edge_xz(eta), _av_edge_xz(G)
    _G_xz = 1.0 / (G_xz * dt)
    dr_xz = _dtau_r(theta_dtau, eta_xz, _G_xz)
    txz = txz + _pad2(
        _inc(txz[1:-1, :, 1:-1], txz_o[1:-1, :, 1:-1], eta_xz, exz[1:-1, :, 1:-1], _G_xz, dr_xz),
        0, 2,
    )
    eta_yz, G_yz = _av_edge_yz(eta), _av_edge_yz(G)
    _G_yz = 1.0 / (G_yz * dt)
    dr_yz = _dtau_r(theta_dtau, eta_yz, _G_yz)
    tyz = tyz + _pad2(
        _inc(tyz[:, 1:-1, 1:-1], tyz_o[:, 1:-1, 1:-1], eta_yz, eyz[:, 1:-1, 1:-1], _G_yz, dr_yz),
        1, 2,
    )
    return txx, tyy, tzz, tyz, txz, txy


def compute_V_3d(Vx, Vy, Vz, P, tau, fx, fy, fz, eta_tau, etadtau, inv_di):
    """Fused residual + damped velocity update (VelocityKernels.jl:182-242).

    Returns (Vx, Vy, Vz, Rx, Ry, Rz)."""
    _dx, _dy, _dz = inv_di
    txx, tyy, tzz, tyz, txz, txy = tau

    Rx = (
        (txx[1:, :, :] - txx[:-1, :, :]) * _dx
        + (txy[1:-1, 1:, :] - txy[1:-1, :-1, :]) * _dy
        + (txz[1:-1, :, 1:] - txz[1:-1, :, :-1]) * _dz
        - (P[1:, :, :] - P[:-1, :, :]) * _dx
        - 0.5 * (fx[1:, :, :] + fx[:-1, :, :])
    )
    Ry = (
        (txy[1:, 1:-1, :] - txy[:-1, 1:-1, :]) * _dx
        + (tyy[:, 1:, :] - tyy[:, :-1, :]) * _dy
        + (tyz[:, 1:-1, 1:] - tyz[:, 1:-1, :-1]) * _dz
        - (P[:, 1:, :] - P[:, :-1, :]) * _dy
        - 0.5 * (fy[:, 1:, :] + fy[:, :-1, :])
    )
    Rz = (
        (txz[1:, :, 1:-1] - txz[:-1, :, 1:-1]) * _dx
        + (tyz[:, 1:, 1:-1] - tyz[:, :-1, 1:-1]) * _dy
        + (tzz[:, :, 1:] - tzz[:, :, :-1]) * _dz
        - (P[:, :, 1:] - P[:, :, :-1]) * _dz
        - 0.5 * (fz[:, :, 1:] + fz[:, :, :-1])
    )
    etax = 0.5 * (eta_tau[1:, :, :] + eta_tau[:-1, :, :])
    etay = 0.5 * (eta_tau[:, 1:, :] + eta_tau[:, :-1, :])
    etaz = 0.5 * (eta_tau[:, :, 1:] + eta_tau[:, :, :-1])
    # pad+add instead of .at[interior].add — see _pad2 (3x on v5e)
    p1 = ((1, 1), (1, 1), (1, 1))
    Vx = Vx + jnp.pad(Rx * etadtau / etax, p1)
    Vy = Vy + jnp.pad(Ry * etadtau / etay, p1)
    Vz = Vz + jnp.pad(Rz * etadtau / etaz, p1)
    return Vx, Vy, Vz, Rx, Ry, Rz


def tensor_invariant_staggered_3d(xx, yy, zz, yz, xz, xy):
    """Second invariant at centers: normal pointwise, shear from the mean of
    squared gathered edge values (StressKernels.jl:479-492)."""
    yz2 = 0.25 * (yz[:, :-1, :-1] ** 2 + yz[:, 1:, :-1] ** 2 + yz[:, :-1, 1:] ** 2 + yz[:, 1:, 1:] ** 2)
    xz2 = 0.25 * (xz[:-1, :, :-1] ** 2 + xz[1:, :, :-1] ** 2 + xz[:-1, :, 1:] ** 2 + xz[1:, :, 1:] ** 2)
    xy2 = 0.25 * (xy[:-1, :-1, :] ** 2 + xy[1:, :-1, :] ** 2 + xy[:-1, 1:, :] ** 2 + xy[1:, 1:, :] ** 2)
    return jnp.sqrt(0.5 * (xx**2 + yy**2 + zz**2) + yz2 + xz2 + xy2)
