"""Distributed PT thermal diffusion over the device mesh.

Mirrors the reference's MPI thermal solve (DiffusionPT_solver.jl:110 +
update_halo!(T)): per-device ghosted T blocks ``(nxl+2, nyl+2)``, fluxes on
local faces, ghost-row exchange via ``lax.ppermute`` after each update,
physical BCs masked by mesh position, and the residual norm as a ``psum``.
Whole solve inside one ``shard_map``.
"""

from __future__ import annotations

import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from justrelax_tpu.core.coeffs import PTThermalCoeffs
from justrelax_tpu.ops.bc import Faces, TemperatureBoundaryConditions
from justrelax_tpu.parallel import halo
from justrelax_tpu.parallel.decomp import Decomp2D, Decomp3D

Array = Any

__all__ = ["heatdiffusion_PT_sharded", "heatdiffusion_PT_sharded_3d"]


def _thermal_bcs_local(T, bcs: TemperatureBoundaryConditions, fx, lx_, fy, ly_):
    """Masked scalar BCs at physical boundaries only (order as ops/bc.py)."""
    cv, nf = bcs.constant_value, bcs.no_flux
    def setrow(T, j, vals, mask):
        return T.at[:, j].set(jnp.where(mask, vals, T[:, j]))
    def setcol(T, i, vals, mask):
        return T.at[i, :].set(jnp.where(mask, vals, T[i, :]))

    if Faces.active(cv.bot):
        T = setrow(T, 0, 2.0 * cv.bot - T[:, 1], fy)
    if Faces.active(cv.top):
        T = setrow(T, -1, 2.0 * cv.top - T[:, -2], ly_)
    if Faces.active(cv.left):
        T = setcol(T, 0, 2.0 * cv.left - T[1, :], fx)
    if Faces.active(cv.right):
        T = setcol(T, -1, 2.0 * cv.right - T[-2, :], lx_)
    if Faces.on(nf.bot):
        T = setrow(T, 0, T[:, 1], fy)
    if Faces.on(nf.top):
        T = setrow(T, -1, T[:, -2], ly_)
    if Faces.on(nf.left):
        T = setcol(T, 0, T[1, :], fx)
    if Faces.on(nf.right):
        T = setcol(T, -1, T[-2, :], lx_)
    return T


def heatdiffusion_PT_sharded(
    mesh,
    decomp: Decomp2D,
    T_blocks: Array,  # blocked-local ghosted T container
    K: Array,  # center conductivity (global layout, even split)
    rho_Cp: Array,
    H: Array,
    pt_thermal: PTThermalCoeffs,
    thermal_bc: TemperatureBoundaryConditions,
    dt,
    di: Tuple[float, float],
    iter_max: int = 50_000,
    nout: int = 1_000,
):
    """Distributed twin of solvers/thermal.py (array-property path).

    Returns (T_blocks, err, iters).
    """
    nxl, nyl = decomp.ni_local
    nx_g, ny_g = decomp.ni_global
    inv_dx, inv_dy = 1.0 / di[0], 1.0 / di[1]
    inv_dt = 1.0 / dt
    nout_i = int(nout)
    max_chunks = max(1, int(math.ceil(iter_max / nout_i)))
    eps = pt_thermal.eps
    inv_sqrt_n = 1.0 / math.sqrt(nx_g * ny_g)

    theta_g, dtau_g = pt_thermal.theta_r_dtau, pt_thermal.dtau_rho

    def local_solve(T, K, rho_Cp, H, theta, dtau_rho):
        fx, lx_ = halo.axis_edges("x")
        fy, ly_ = halo.axis_edges("y")
        Told = T
        K_ex = halo.extend(K, 0, 1)
        K_ey = halo.extend(K, 1, 1)
        th_ex = halo.extend(theta, 0, 1)
        th_ey = halo.extend(theta, 1, 1)
        Kfx = 0.5 * (K_ex[:-1, :] + K_ex[1:, :])
        Kfy = 0.5 * (K_ey[:, :-1] + K_ey[:, 1:])
        thfx = 0.5 * (th_ex[:-1, :] + th_ex[1:, :])
        thfy = 0.5 * (th_ey[:, :-1] + th_ey[:, 1:])

        def fluxes(T, qx, qy):
            dTdx = (T[1:, 1:-1] - T[:-1, 1:-1]) * inv_dx
            dTdy = (T[1:-1, 1:] - T[1:-1, :-1]) * inv_dy
            qx2 = -Kfx * dTdx
            qy2 = -Kfy * dTdy
            qx = (qx * thfx + qx2) / (1.0 + thfx)
            qy = (qy * thfy + qy2) / (1.0 + thfy)
            return qx, qy, qx2, qy2

        def one(_, carry):
            T, qx, qy, qx2, qy2 = carry
            qx, qy, qx2, qy2 = fluxes(T, qx, qy)
            divq = (qx[1:, :] - qx[:-1, :]) * inv_dx + (qy[:, 1:] - qy[:, :-1]) * inv_dy
            num = dtau_rho * (-divq + Told[1:-1, 1:-1] * rho_Cp * inv_dt + H) + T[1:-1, 1:-1]
            den = 1.0 + dtau_rho * rho_Cp * inv_dt
            T = T.at[1:-1, 1:-1].set(num / den)
            T = _thermal_bcs_local(T, thermal_bc, fx, lx_, fy, ly_)
            T = halo.exchange_ghosts(T, 0, nxl)
            T = halo.exchange_ghosts(T, 1, nyl)
            return (T, qx, qy, qx2, qy2)

        def cond(c):
            (_, _, _, _, _), err, chunk = c
            return (err > eps) & (chunk < max_chunks)

        def body(c):
            state, err, chunk = c
            state = lax.fori_loop(0, nout_i, one, state)
            T, qx, qy, qx2, qy2 = state
            divq2 = (qx2[1:, :] - qx2[:-1, :]) * inv_dx + (qy2[:, 1:] - qy2[:, :-1]) * inv_dy
            res = -rho_Cp * (T[1:-1, 1:-1] - Told[1:-1, 1:-1]) * inv_dt - divq2 + H
            err = jnp.sqrt(lax.psum(jnp.sum(res**2), ("x", "y"))) * inv_sqrt_n
            return (state, err, chunk + 1)

        dtype = T.dtype
        qx0 = jnp.zeros((nxl + 1, nyl), dtype)
        qy0 = jnp.zeros((nxl, nyl + 1), dtype)
        init = ((T, qx0, qy0, qx0, qy0), jnp.asarray(2.0 * eps, dtype), jnp.asarray(0, jnp.int32))
        (T, *_), err, chunk = lax.while_loop(cond, body, init)
        return T, err, chunk * nout_i

    spec = P("x", "y")
    fn = jax.shard_map(
        local_solve,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec, spec),
        out_specs=(spec, P(), P()),
        check_vma=False,
    )
    return fn(T_blocks, K, rho_Cp, H, theta_g, dtau_g)


def _set_layer(T, axis, idx, vals, mask):
    sl = [slice(None)] * T.ndim
    sl[axis] = idx
    return T.at[tuple(sl)].set(jnp.where(mask, vals, T[tuple(sl)]))


def _layer(T, axis, idx):
    sl = [slice(None)] * T.ndim
    sl[axis] = idx
    return T[tuple(sl)]


def _thermal_bcs_local_3d(T, bcs: TemperatureBoundaryConditions, edges):
    """Masked 3D scalar BCs at physical boundaries (face↔axis naming as
    ops/bc.py: x left/right, y front/back, z top/bot with z index 0 = top...
    thermal uses the 2D convention extended: bot = low-z, top = high-z)."""
    cv, nf = bcs.constant_value, bcs.no_flux
    names = (("left", "right"), ("front", "back"), ("bot", "top"))
    for axis in range(3):
        lo_name, hi_name = names[axis]
        first, last = edges[axis]
        v_lo = getattr(cv, lo_name)
        v_hi = getattr(cv, hi_name)
        if Faces.active(v_lo):
            T = _set_layer(T, axis, 0, 2.0 * v_lo - _layer(T, axis, 1), first)
        if Faces.active(v_hi):
            T = _set_layer(T, axis, -1, 2.0 * v_hi - _layer(T, axis, -2), last)
        if Faces.on(getattr(nf, lo_name)):
            T = _set_layer(T, axis, 0, _layer(T, axis, 1), first)
        if Faces.on(getattr(nf, hi_name)):
            T = _set_layer(T, axis, -1, _layer(T, axis, -2), last)
    return T


def heatdiffusion_PT_sharded_3d(
    mesh,
    decomp: Decomp3D,
    T_blocks: Array,  # blocked-local ghosted T container (extras (2,2,2))
    K: Array,
    rho_Cp: Array,
    H: Array,
    pt_thermal: PTThermalCoeffs,
    thermal_bc: TemperatureBoundaryConditions,
    dt,
    di,
    iter_max: int = 50_000,
    nout: int = 1_000,
):
    """3D distributed twin of heatdiffusion_PT (array-property path)."""
    nl = decomp.ni_local
    ng = decomp.ni_global
    inv_di = tuple(1.0 / d for d in di)
    inv_dt = 1.0 / dt
    nout_i = int(nout)
    max_chunks = max(1, int(math.ceil(iter_max / nout_i)))
    eps = pt_thermal.eps
    inv_sqrt_n = 1.0 / math.sqrt(ng[0] * ng[1] * ng[2])
    theta_g, dtau_g = pt_thermal.theta_r_dtau, pt_thermal.dtau_rho
    axes3 = ("x", "y", "z")

    def local_solve(T, K, rho_Cp, H, theta, dtau_rho):
        edges = tuple(halo.axis_edges(a) for a in axes3)
        Told = T

        def face_av(A, axis):
            E = halo.extend(A, axis, 1)
            lo = [slice(None)] * 3
            hi = [slice(None)] * 3
            lo[axis], hi[axis] = slice(None, -1), slice(1, None)
            return 0.5 * (E[tuple(lo)] + E[tuple(hi)])

        Kf = [face_av(K, a) for a in range(3)]
        thf = [face_av(theta, a) for a in range(3)]

        def grads(T):
            return (
                (T[1:, 1:-1, 1:-1] - T[:-1, 1:-1, 1:-1]) * inv_di[0],
                (T[1:-1, 1:, 1:-1] - T[1:-1, :-1, 1:-1]) * inv_di[1],
                (T[1:-1, 1:-1, 1:] - T[1:-1, 1:-1, :-1]) * inv_di[2],
            )

        def one(_, carry):
            T, q, q2 = carry
            g = grads(T)
            q2n = tuple(-Kf[a] * g[a] for a in range(3))
            qn = tuple(
                (q[a] * thf[a] + q2n[a]) / (1.0 + thf[a]) for a in range(3)
            )
            divq = (
                (qn[0][1:, :, :] - qn[0][:-1, :, :]) * inv_di[0]
                + (qn[1][:, 1:, :] - qn[1][:, :-1, :]) * inv_di[1]
                + (qn[2][:, :, 1:] - qn[2][:, :, :-1]) * inv_di[2]
            )
            inner = (slice(1, -1),) * 3
            num = dtau_rho * (-divq + Told[inner] * rho_Cp * inv_dt + H) + T[inner]
            den = 1.0 + dtau_rho * rho_Cp * inv_dt
            T = T.at[inner].set(num / den)
            T = _thermal_bcs_local_3d(T, thermal_bc, edges)
            for a in range(3):
                T = halo.exchange_ghosts(T, a, nl[a])
            return (T, qn, q2n)

        def cond(c):
            _, err, chunk = c
            return (err > eps) & (chunk < max_chunks)

        def body(c):
            state, err, chunk = c
            state = lax.fori_loop(0, nout_i, one, state)
            T, q, q2 = state
            divq2 = (
                (q2[0][1:, :, :] - q2[0][:-1, :, :]) * inv_di[0]
                + (q2[1][:, 1:, :] - q2[1][:, :-1, :]) * inv_di[1]
                + (q2[2][:, :, 1:] - q2[2][:, :, :-1]) * inv_di[2]
            )
            inner = (slice(1, -1),) * 3
            res = -rho_Cp * (T[inner] - Told[inner]) * inv_dt - divq2 + H
            err = jnp.sqrt(lax.psum(jnp.sum(res**2), axes3)) * inv_sqrt_n
            return (state, err, chunk + 1)

        dtype = T.dtype
        q0 = tuple(
            jnp.zeros(
                tuple(nl[d] + (1 if d == a else 0) for d in range(3)), dtype
            )
            for a in range(3)
        )
        init = ((T, q0, q0), jnp.asarray(2.0 * eps, dtype), jnp.asarray(0, jnp.int32))
        (T, *_), err, chunk = lax.while_loop(cond, body, init)
        return T, err, chunk * nout_i

    spec = P("x", "y", "z")
    fn = jax.shard_map(
        local_solve,
        mesh=mesh,
        in_specs=(spec,) * 6,
        out_specs=(spec, P(), P()),
        check_vma=False,
    )
    return fn(T_blocks, K, rho_Cp, H, theta_g, dtau_g)
