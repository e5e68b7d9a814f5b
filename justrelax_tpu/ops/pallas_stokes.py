"""Pallas TPU kernel: VMEM-resident APT Stokes PT chunk (2D, viscous limit).

The APT method is memory-bound: the reference pays full HBM traffic for every
one of its ~8 kernel launches per PT iteration (SURVEY.md §6). On TPU, for
grids whose working set fits in VMEM (~16 MB/core: up to ~448² f32 with 10
arrays), the *entire chunk of ``nout`` iterations* can run inside one Pallas
kernel with all state held in VMEM — HBM is touched once per chunk instead of
once per iteration, taking the hot loop off the memory wall entirely.

The kernel body is the same fused iteration as the XLA path
(divergence → pressure → strain rate → stress → damped velocity + free-slip
BCs); grids larger than VMEM fall back to the XLA-fused path
(solvers/stokes2d.py).
"""

from __future__ import annotations

import functools
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = Any

__all__ = ["stokes_chunk_vmem", "vmem_bytes_needed"]


def vmem_bytes_needed(nx: int, ny: int, itemsize: int = 4) -> int:
    """Approximate VMEM footprint of the chunk kernel (10 grid arrays)."""
    return 10 * (nx + 2) * (ny + 2) * itemsize


def _pad1(A):
    """Zero-pad by one on every side via concatenation (Mosaic rejects
    jnp.pad inside TPU kernels)."""
    zc = jnp.zeros((A.shape[0], 1), A.dtype)
    A = jnp.concatenate([zc, A, zc], axis=1)
    zr = jnp.zeros((1, A.shape[1]), A.dtype)
    return jnp.concatenate([zr, A, zr], axis=0)


def _iteration(Vx, Vy, P, txx, tyy, txy, eta, eta_tau, rho_gx, rho_gy,
               inv_dx, inv_dy, r_theta, theta_dtau, etadtau, free_slip):
    """One viscous APT iteration on full arrays (shapes as core/state.py)."""
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

    # viscous PT stress update (interior vertices only, like the reference)
    dtau_r = 1.0 / (theta_dtau + 1.0)
    txx = txx + dtau_r * (2.0 * eta * exx - txx)
    tyy = tyy + dtau_r * (2.0 * eta * eyy - tyy)
    eta_v = 0.25 * (eta[:-1, :-1] + eta[1:, :-1] + eta[:-1, 1:] + eta[1:, 1:])
    inc = dtau_r * (2.0 * eta_v * exy[1:-1, 1:-1] - txy[1:-1, 1:-1])
    txy = _pad1(txy[1:-1, 1:-1] + inc) + _edge_only(txy)

    # damped velocity update on interior nodes
    rx = (
        (txx[1:, :] - txx[:-1, :]) * inv_dx
        + (txy[1:-1, 1:] - txy[1:-1, :-1]) * inv_dy
        - (P[1:, :] - P[:-1, :]) * inv_dx
        - 0.5 * (rho_gx[1:, :] + rho_gx[:-1, :])
    )
    ry = (
        (tyy[:, 1:] - tyy[:, :-1]) * inv_dy
        + (txy[1:, 1:-1] - txy[:-1, 1:-1]) * inv_dx
        - (P[:, 1:] - P[:, :-1]) * inv_dy
        - 0.5 * (rho_gy[:, 1:] + rho_gy[:, :-1])
    )
    etax = 0.5 * (eta_tau[1:, :] + eta_tau[:-1, :])
    etay = 0.5 * (eta_tau[:, 1:] + eta_tau[:, :-1])
    Vx_in = Vx[1:-1, 1:-1] + rx * etadtau / etax
    Vy_in = Vy[1:-1, 1:-1] + ry * etadtau / etay
    Vx = _pad1(Vx_in) + _edge_only(Vx)
    Vy = _pad1(Vy_in) + _edge_only(Vy)

    if free_slip:
        # tangential ghost mirrors (free_slip on all faces)
        Vx = jnp.concatenate([Vx[:, 1:2], Vx[:, 1:-1], Vx[:, -2:-1]], axis=1)
        Vy = jnp.concatenate([Vy[1:2, :], Vy[1:-1, :], Vy[-2:-1, :]], axis=0)
    return Vx, Vy, P, txx, tyy, txy


def _edge_only(A):
    """A with its interior zeroed (keeps the boundary ring)."""
    return A - _pad1(A[1:-1, 1:-1])


def stokes_chunk_vmem(
    Vx, Vy, P, txx, tyy, txy, eta, eta_tau, rho_gx, rho_gy,
    inv_dx: float, inv_dy: float, r: float, theta_dtau: float, etadtau: float,
    nout: int = 100, free_slip: bool = True, interpret: bool = False,
):
    """Run ``nout`` viscous APT iterations fully inside VMEM.

    Returns updated (Vx, Vy, P, txx, tyy, txy).
    """
    r_theta = r / theta_dtau

    def kernel(Vx_ref, Vy_ref, P_ref, txx_ref, tyy_ref, txy_ref,
               eta_ref, etat_ref, gx_ref, gy_ref,
               Vx_o, Vy_o, P_o, txx_o, tyy_o, txy_o):
        eta_l = eta_ref[:]
        etat_l = etat_ref[:]
        gx_l = gx_ref[:]
        gy_l = gy_ref[:]

        def body(_, carry):
            return _iteration(
                *carry, eta_l, etat_l, gx_l, gy_l,
                inv_dx, inv_dy, r_theta, theta_dtau, etadtau, free_slip,
            )

        out = jax.lax.fori_loop(
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
