"""Pallas TPU kernel: VMEM-resident APT Stokes PT chunk (2D, viscous limit).

The APT method is memory-bound: the reference pays full HBM traffic for every
one of its ~8 kernel launches per PT iteration (SURVEY.md §6). On TPU, for
grids whose working set fits in VMEM (~16 MB/core: up to ~448² f32 with 10
arrays), the *entire chunk of ``nout`` iterations* can run inside one Pallas
kernel with all state held in VMEM — HBM is touched once per chunk instead of
once per iteration, taking the hot loop off the memory wall entirely.

Mosaic notes: ``jnp.pad`` and back-to-back concatenations along both axes are
rejected/miscompiled by the TPU backend, so boundary handling uses
single-axis edge concatenations (interleaved with arithmetic) plus
``broadcasted_iota`` freeze-masks — full-range updates with frozen boundary
nodes, exactly the compute-in-halo pattern of the distributed solver.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = Any

__all__ = ["stokes_chunk_vmem", "vmem_bytes_needed"]


def vmem_bytes_needed(nx: int, ny: int, itemsize: int = 4) -> int:
    """Approximate VMEM footprint of the chunk kernel (10 grid arrays)."""
    return 10 * (nx + 2) * (ny + 2) * itemsize


def _ext_x(A):
    """Edge-replicate one layer along axis 0 (single-axis concat)."""
    return jnp.concatenate([A[:1, :], A, A[-1:, :]], axis=0)


def _ext_y(A):
    return jnp.concatenate([A[:, :1], A, A[:, -1:]], axis=1)


def _interior_mask(shape, dtype):
    """1 on interior nodes, 0 on the boundary ring."""
    r = lax.broadcasted_iota(jnp.int32, shape, 0)
    c = lax.broadcasted_iota(jnp.int32, shape, 1)
    m = (r > 0) & (r < shape[0] - 1) & (c > 0) & (c < shape[1] - 1)
    return m.astype(dtype)


def _iteration(Vx, Vy, P, txx, tyy, txy, eta, eta_tau, rho_gx, rho_gy,
               masks, exts, inv_dx, inv_dy, r_theta, theta_dtau, etadtau,
               free_slip):
    """One viscous APT iteration; boundary nodes frozen by masks."""
    m_txy, m_vx, m_vy = masks
    eta_v, etat_ex, etat_ey, gx_ex, gy_ey = exts
    third = 1.0 / 3.0

    # divergence + pressure (incompressible viscous limit: ψ = ητ·r/θ)
    grad_V = (Vx[1:, 1:-1] - Vx[:-1, 1:-1]) * inv_dx + (
        Vy[1:-1, 1:] - Vy[1:-1, :-1]
    ) * inv_dy
    P = P + (-grad_V) * eta_tau * r_theta

    # strain rate
    exx = (Vx[1:, 1:-1] - Vx[:-1, 1:-1]) * inv_dx - grad_V * third
    eyy = (Vy[1:-1, 1:] - Vy[1:-1, :-1]) * inv_dy - grad_V * third
    exy = 0.5 * (
        (Vx[:, 1:] - Vx[:, :-1]) * inv_dy + (Vy[1:, :] - Vy[:-1, :]) * inv_dx
    )

    # viscous PT stress update (interior vertices; boundary frozen by mask)
    dtau_r = 1.0 / (theta_dtau + 1.0)
    txx = txx + dtau_r * (2.0 * eta * exx - txx)
    tyy = tyy + dtau_r * (2.0 * eta * eyy - tyy)
    txy = txy + m_txy * (dtau_r * (2.0 * eta_v * exy - txy))

    # full-face velocity update with edge-extended operands, boundary faces
    # and ghost rows frozen by masks
    P_ex = _ext_x(P)
    txx_ex = _ext_x(txx)
    rx = (
        (txx_ex[1:, :] - txx_ex[:-1, :]) * inv_dx
        + (txy[:, 1:] - txy[:, :-1]) * inv_dy
        - (P_ex[1:, :] - P_ex[:-1, :]) * inv_dx
        - 0.5 * (gx_ex[1:, :] + gx_ex[:-1, :])
    )
    P_ey = _ext_y(P)
    tyy_ey = _ext_y(tyy)
    ry = (
        (tyy_ey[:, 1:] - tyy_ey[:, :-1]) * inv_dy
        + (txy[1:, :] - txy[:-1, :]) * inv_dx
        - (P_ey[:, 1:] - P_ey[:, :-1]) * inv_dy
        - 0.5 * (gy_ey[:, 1:] + gy_ey[:, :-1])
    )
    etax = 0.5 * (etat_ex[1:, :] + etat_ex[:-1, :])
    etay = 0.5 * (etat_ey[:, 1:] + etat_ey[:, :-1])
    # rx/ry live on all faces × interior rows/cols — embed into the ghosted
    # velocity arrays via single-axis concats of zero columns/rows
    dVx = rx * (etadtau / etax)
    zc = jnp.zeros((dVx.shape[0], 1), dVx.dtype)
    dVx_full = jnp.concatenate([zc, dVx, zc], axis=1)
    Vx = Vx + m_vx * dVx_full
    dVy = ry * (etadtau / etay)
    zr = jnp.zeros((1, dVy.shape[1]), dVy.dtype)
    dVy_full = jnp.concatenate([zr, dVy, zr], axis=0)
    Vy = Vy + m_vy * dVy_full

    if free_slip:
        # tangential ghost mirrors (single-axis concats)
        Vx = jnp.concatenate([Vx[:, 1:2], Vx[:, 1:-1], Vx[:, -2:-1]], axis=1)
        Vy = jnp.concatenate([Vy[1:2, :], Vy[1:-1, :], Vy[-2:-1, :]], axis=0)
    return Vx, Vy, P, txx, tyy, txy


def stokes_chunk_vmem(
    Vx, Vy, P, txx, tyy, txy, eta, eta_tau, rho_gx, rho_gy,
    inv_dx: float, inv_dy: float, r: float, theta_dtau: float, etadtau: float,
    nout: int = 100, free_slip: bool = True, interpret: bool = False,
):
    """Run ``nout`` viscous APT iterations fully inside VMEM.

    Returns updated (Vx, Vy, P, txx, tyy, txy).
    """
    r_theta = r / theta_dtau
    dtype = P.dtype
    nx1, ny1 = txy.shape

    def kernel(Vx_ref, Vy_ref, P_ref, txx_ref, tyy_ref, txy_ref,
               eta_ref, etat_ref, gx_ref, gy_ref,
               Vx_o, Vy_o, P_o, txx_o, tyy_o, txy_o):
        eta_l = eta_ref[:]
        etat_l = etat_ref[:]

        # static per-chunk quantities (single-axis extensions, interleaved)
        eta_hx = 0.5 * (_ext_x(eta_l)[:-1, :] + _ext_x(eta_l)[1:, :])
        eta_v = 0.5 * (_ext_y(eta_hx)[:, :-1] + _ext_y(eta_hx)[:, 1:])
        exts = (
            eta_v,
            _ext_x(etat_l),
            _ext_y(etat_l),
            _ext_x(gx_ref[:]),
            _ext_y(gy_ref[:]),
        )
        # freeze masks: τxy boundary ring; Vx outer faces + ghost cols;
        # Vy outer faces + ghost rows
        m_txy = _interior_mask((nx1, ny1), dtype)
        m_vx = _interior_mask(Vx_ref.shape, dtype)
        m_vy = _interior_mask(Vy_ref.shape, dtype)
        masks = (m_txy, m_vx, m_vy)

        def body(_, carry):
            return _iteration(
                *carry, eta_l, etat_l, gx_ref[:], gy_ref[:],
                masks, exts, inv_dx, inv_dy, r_theta, theta_dtau, etadtau,
                free_slip,
            )

        out = lax.fori_loop(
            0, nout, body,
            (Vx_ref[:], Vy_ref[:], P_ref[:], txx_ref[:], tyy_ref[:], txy_ref[:]),
        )
        Vx_o[:], Vy_o[:], P_o[:], txx_o[:], tyy_o[:], txy_o[:] = out

    args = (Vx, Vy, P, txx, tyy, txy, eta, eta_tau, rho_gx, rho_gy)
    out_shape = tuple(jax.ShapeDtypeStruct(a.shape, a.dtype) for a in args[:6])
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[vspec] * 10,
        out_specs=(vspec,) * 6,
        input_output_aliases={i: i for i in range(6)},
        interpret=interpret,
    )(*args)
