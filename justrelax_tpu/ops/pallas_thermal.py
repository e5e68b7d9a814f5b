"""Pallas TPU kernel: VMEM-resident PT thermal-diffusion chunk (2D).

Completes the speed-of-light story for the 2D hot loops (VE chunk:
ops/pallas_stokes.py; VEP chunk: ops/pallas_stokes_vep.py): one pallas_call
advances ``nout`` PT diffusion iterations — flux relaxation, damped implicit
temperature update, ghost-node BCs — entirely in VMEM.

The iteration is algebraically refactored into chunk-invariant coefficient
canvases (ops/thermal.py formulas, K / ρCp array path):

    q   ← q·aq − bq·∂T          aq = θ/(1+θ),  bq = K_face/(1+θ)
    T   ← (T + cA·(−∇·q) + cB)·inv_den
          cA = dτ_ρ, cB = dτ_ρ·(Told·ρCp/dt + H_tot), inv_den = 1/(1+dτ_ρ·ρCp/dt)

so the per-iteration work is rolls + multiply-adds only.

Canvas layout: T is natively the (nx+2, ny+2) ghosted array; x-flux (i, j)
at canvas (i, j+1); y-flux (i, j) at canvas (i+1, j).

Restrictions (dispatcher falls back to XLA otherwise): 2D, uniform grid,
K/ρCp center arrays (no material-evaluated conductivity), no Dirichlet
mask / adiabatic term / halo exchange / constant-flux BCs; boundary
conditions no_flux and constant_value only.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from justrelax_tpu.ops.bc import Faces, TemperatureBoundaryConditions
from justrelax_tpu.ops.thermal import face_average_x, face_average_y

Array = Any

__all__ = ["thermal_chunk_vmem", "thermal_chunk_supported"]


def _sm1(A, ax):
    return jnp.roll(A, -1, axis=ax)


def _sp1(A, ax):
    return jnp.roll(A, 1, axis=ax)


def _band(shape, axis, lo, hi):
    i = lax.broadcasted_iota(jnp.int32, shape, axis)
    return (i >= lo) & (i <= hi)


def thermal_chunk_supported(bcs: TemperatureBoundaryConditions) -> bool:
    return not (bcs.constant_flux.any() or bcs.periodic.any())


def _kernel(T_ref, qx_ref, qy_ref, cinv_ref, scal_ref, nit_ref,
            T_o, qx_o, qy_o, *, nx, ny, faces):
    shape = T_ref.shape
    aqx, bqx = cinv_ref[0], cinv_ref[1]
    aqy, bqy = cinv_ref[2], cinv_ref[3]
    cA, cB, inv_den = cinv_ref[4], cinv_ref[5], cinv_ref[6]
    cAd = cinv_ref[7]  # dτ_ρ·adiabatic (T-proportional source, explicit)
    inv_dx = scal_ref[0]
    inv_dy = scal_ref[1]
    v_left, v_right, v_bot, v_top = (scal_ref[2], scal_ref[3],
                                     scal_ref[4], scal_ref[5])
    nout = nit_ref[0]

    Mqx = _band(shape, 0, 0, nx) & _band(shape, 1, 1, ny)     # x faces
    Mqy = _band(shape, 0, 1, nx) & _band(shape, 1, 0, ny)     # y faces
    Mc = _band(shape, 0, 1, nx) & _band(shape, 1, 1, ny)      # cells

    def body(_, carry):
        T, qx, qy = carry
        # PT flux relaxation (coefficient form)
        dTdx = (_sm1(T, 0) - T) * inv_dx       # at x-face slots (i, j+1)
        dTdy = (_sm1(T, 1) - T) * inv_dy       # at y-face slots (i+1, j)
        qx = jnp.where(Mqx, qx * aqx - bqx * dTdx, qx)
        qy = jnp.where(Mqy, qy * aqy - bqy * dTdy, qy)

        # damped implicit T update
        divq = (qx - _sp1(qx, 0)) * inv_dx + (qy - _sp1(qy, 1)) * inv_dy
        T = jnp.where(Mc, (T - cA * divq + cAd * T + cB) * inv_den, T)

        # ghost-node BCs (no_flux mirror / constant_value 2v − T_in)
        for axis, side, kind, val in faces:
            if axis == 0:
                g = _band(shape, 0, 0, 0) if side == 0 else _band(
                    shape, 0, nx + 1, nx + 1)
                inner = _sm1(T, 0) if side == 0 else _sp1(T, 0)
            else:
                g = _band(shape, 1, 0, 0) if side == 0 else _band(
                    shape, 1, ny + 1, ny + 1)
                inner = _sm1(T, 1) if side == 0 else _sp1(T, 1)
            if kind == "no_flux":
                T = jnp.where(g, inner, T)
            else:  # constant_value
                v = {"left": v_left, "right": v_right,
                     "bot": v_bot, "top": v_top}[val]
                T = jnp.where(g, 2.0 * v - inner, T)
        return T, qx, qy

    out = lax.fori_loop(0, nout, body, (T_ref[:], qx_ref[:], qy_ref[:]))
    T_o[:], qx_o[:], qy_o[:] = out


def thermal_chunk_vmem(
    T, qx, qy, Told, K, rho_Cp, H_tot, dtau_rho, theta_r_dtau,
    inv_dt, inv_dx, inv_dy, bcs: TemperatureBoundaryConditions,
    adiabatic=None, nout: int = 100, interpret: bool = False,
):
    """Advance ``nout`` PT diffusion iterations fully inside VMEM.

    Array conventions match the solver: T/Told ghosted (nx+2, ny+2),
    qx (nx+1, ny), qy (nx, ny+1), center coefficients (nx, ny). ``H_tot``
    is the full source (H + shear heating [+ radiogenic]). Returns
    (T, qx, qy).
    """
    nxg, nyg = T.shape
    nx, ny = nxg - 2, nyg - 2
    shape = T.shape
    dtype = T.dtype

    def cell(A, mode="constant"):
        return jnp.pad(A, ((1, 1), (1, 1)), mode=mode)

    # chunk-invariant coefficient canvases
    thx = face_average_x(theta_r_dtau)
    thy = face_average_y(theta_r_dtau)
    Kfx = face_average_x(K)
    Kfy = face_average_y(K)
    aqx = thx / (1.0 + thx)
    bqx = Kfx / (1.0 + thx)
    aqy = thy / (1.0 + thy)
    bqy = Kfy / (1.0 + thy)
    den = 1.0 + dtau_rho * rho_Cp * inv_dt
    cB = dtau_rho * (Told[1:-1, 1:-1] * rho_Cp * inv_dt + H_tot)
    ad = jnp.zeros_like(dtau_rho) if adiabatic is None else dtau_rho * adiabatic

    def fx(A):  # x-face (i, j) -> canvas (i, j+1)
        return jnp.pad(A, ((0, 1), (1, 1)))

    def fy(A):  # y-face (i, j) -> canvas (i+1, j)
        return jnp.pad(A, ((1, 1), (0, 1)))

    cinv = jnp.stack([
        fx(aqx), fx(bqx), fy(aqy), fy(bqy),
        cell(dtau_rho), cell(cB), cell(1.0 / den), cell(ad),
    ]).astype(dtype)

    # static BC recipe in application order (thermal_bcs: constant_value
    # first, then no_flux — later writes win, so apply in the same order)
    order = [((1, 0), "bot"), ((1, 1), "top"), ((0, 0), "left"),
             ((0, 1), "right")]
    faces = []
    vals = {"left": 0.0, "right": 0.0, "bot": 0.0, "top": 0.0}
    for (axis, side), name in order:
        v = getattr(bcs.constant_value, name)
        if Faces.active(v):
            faces.append((axis, side, "constant", name))
            vals[name] = float(v)
    for (axis, side), name in order:
        if Faces.on(getattr(bcs.no_flux, name)):
            faces.append((axis, side, "no_flux", name))

    scal = jnp.stack([
        jnp.asarray(v, dtype) for v in (
            inv_dx, inv_dy, vals["left"], vals["right"], vals["bot"],
            vals["top"],
        )
    ])
    nit = jnp.asarray(nout, jnp.int32).reshape(1)

    canv = (T, fx(qx), fy(qy), cinv)
    kern = partial(_kernel, nx=nx, ny=ny, faces=tuple(faces))
    out_shape = tuple(jax.ShapeDtypeStruct(shape, dtype) for _ in range(3))
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    o = pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=[vspec] * 4 + [sspec, sspec],
        out_specs=(vspec,) * 3,
        input_output_aliases={0: 0, 1: 1, 2: 2},
        compiler_params=params,
        interpret=interpret,
    )(*canv, scal, nit)
    return o[0], o[1][:-1, 1:-1], o[2][1:-1, :-1]
