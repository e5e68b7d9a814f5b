"""Distributed (multi-device) APT visco-elastic Stokes solver, 3D.

3D twin of :mod:`justrelax_tpu.parallel.stokes2d` (reference:
src/stokes/Stokes3D.jl + ImplicitGlobalGrid MPI halos): the whole PT loop
runs inside one ``shard_map`` over an ("x","y","z") device mesh.

- per-device state is the blocked-local staggered layout of decomp.py
  (disjoint cell ownership; velocities carry shared faces + ghost layers,
  shear-edge arrays carry shared edges);
- centers update locally; all three shear-edge families are computed
  redundantly on shared edges from ghost-extended η/G ("compute in halo");
- each velocity component updates on ALL its local faces from ghost-extended
  center fields, so only its two transverse ghost layers need a
  post-update ``lax.ppermute`` exchange;
- physical BCs (free-slip) and convergence norms use ``lax.axis_index``
  masks; norms are ``lax.psum`` reductions over the full mesh.

Single-device results are reproduced exactly (tests/test_distributed3d.py).
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from justrelax_tpu.core.coeffs import PTStokesCoeffs
from justrelax_tpu.ops.bc import Faces, VelocityBoundaryConditions
from justrelax_tpu.ops.stencil import interior_add, maxloc
from justrelax_tpu.parallel import halo
from justrelax_tpu.parallel.decomp import Decomp3D

Array = Any

__all__ = ["solve_ve_sharded_3d"]


class ShardedSolveResult3D(NamedTuple):
    Vx: Array
    Vy: Array
    Vz: Array
    P: Array
    txx: Array
    tyy: Array
    tzz: Array
    tyz: Array
    txz: Array
    txy: Array
    err: Array
    iters: Array


def _ext2(A, ax0, ax1, h=1):
    return halo.extend(halo.extend(A, ax0, h), ax1, h)


def _av4(A, ax0, ax1):
    """2-point average along both ``ax0`` and ``ax1`` (centers→edges)."""
    lo0 = [slice(None)] * A.ndim
    hi0 = [slice(None)] * A.ndim
    lo0[ax0], hi0[ax0] = slice(None, -1), slice(1, None)
    B = 0.5 * (A[tuple(lo0)] + A[tuple(hi0)])
    lo1 = [slice(None)] * A.ndim
    hi1 = [slice(None)] * A.ndim
    lo1[ax1], hi1[ax1] = slice(None, -1), slice(1, None)
    return 0.5 * (B[tuple(lo1)] + B[tuple(hi1)])


def _freeze(A, new, axis, lo_mask, hi_mask):
    """Keep A's outermost slices along ``axis`` on physical-boundary devices
    (serial kernels never write global-boundary nodes)."""
    s = new.shape[axis]
    lo_new = lax.slice_in_dim(new, 0, 1, axis=axis)
    lo_old = lax.slice_in_dim(A, 0, 1, axis=axis)
    hi_new = lax.slice_in_dim(new, s - 1, s, axis=axis)
    hi_old = lax.slice_in_dim(A, s - 1, s, axis=axis)
    mid = lax.slice_in_dim(new, 1, s - 1, axis=axis)
    lo = jnp.where(lo_mask, lo_old, lo_new)
    hi = jnp.where(hi_mask, hi_old, hi_new)
    return jnp.concatenate([lo, mid, hi], axis=axis)


def _set_layer(A, axis, idx, values):
    sl = [slice(None)] * A.ndim
    sl[axis] = idx
    return A.at[tuple(sl)].set(values)


def _layer(A, axis, idx):
    sl = [slice(None)] * A.ndim
    sl[axis] = idx
    return A[tuple(sl)]


def _no_slip_local_3d(V, ns, edges):
    """Physical-boundary-masked no-slip (ops/bc.py _no_slip_velocity_3d):
    zero the normal component on the boundary face; negative-mirror the
    tangential ghost layers. Note bc.py's z-face naming: ``bot`` is z index
    0, ``top`` is z index −1 for no-slip (no_slip.jl:22-55)."""
    face_flags = ((ns.left, ns.right), (ns.front, ns.back), (ns.bot, ns.top))
    Vout = list(V)
    for axis in range(3):
        lo_flag, hi_flag = face_flags[axis]
        first, last = edges[axis]
        for comp in range(3):
            A = Vout[comp]
            if comp == axis:  # normal component: zero on the face
                if Faces.on(lo_flag):
                    A = _set_layer(
                        A, axis, 0,
                        jnp.where(first, 0.0, _layer(A, axis, 0)),
                    )
                if Faces.on(hi_flag):
                    A = _set_layer(
                        A, axis, -1,
                        jnp.where(last, 0.0, _layer(A, axis, -1)),
                    )
            else:  # tangential ghosts: negative mirror
                if Faces.on(lo_flag):
                    A = _set_layer(
                        A, axis, 0,
                        jnp.where(first, -_layer(A, axis, 1), _layer(A, axis, 0)),
                    )
                if Faces.on(hi_flag):
                    A = _set_layer(
                        A, axis, -1,
                        jnp.where(last, -_layer(A, axis, -2), _layer(A, axis, -1)),
                    )
            Vout[comp] = A
    return tuple(Vout)


def _free_slip_local_3d(V, bc: VelocityBoundaryConditions, edges):
    """Physical-boundary-masked velocity BCs (no-slip then free-slip, the
    serial flow_bcs order): zero-normal is the staggered layout's job
    (frozen faces) for free-slip, tangential ghosts mirror the first
    interior layer. ``edges[d] = (is_first_d, is_last_d)``."""
    fs = bc.free_slip
    if bc.no_slip.any():
        V = _no_slip_local_3d(V, bc.no_slip, edges)
    # face↔axis naming matches ops/bc.py _free_slip_velocity_3d:
    # x: left/right, y: front/back, z: top/bot (z index 0 is "top")
    face_flags = (
        (fs.left, fs.right), (fs.front, fs.back), (fs.top, fs.bot)
    )
    Vout = list(V)
    for comp in range(3):
        for axis in range(3):
            if axis == comp:
                continue
            lo_flag, hi_flag = face_flags[axis]
            first, last = edges[axis]
            A = Vout[comp]
            if Faces.on(lo_flag):
                A = _set_layer(
                    A, axis, 0,
                    jnp.where(first, _layer(A, axis, 1), _layer(A, axis, 0)),
                )
            if Faces.on(hi_flag):
                A = _set_layer(
                    A, axis, -1,
                    jnp.where(last, _layer(A, axis, -2), _layer(A, axis, -1)),
                )
            Vout[comp] = A
    return tuple(Vout)


def solve_ve_sharded_3d(
    mesh,
    decomp: Decomp3D,
    blocks: dict,
    pt_stokes: PTStokesCoeffs,
    flow_bc: VelocityBoundaryConditions,
    dt,
    iter_max: int = 10_000,
    nout: int = 500,
):
    """Run the VE APT Stokes solve over a 3D mesh. ``blocks`` holds the
    blocked-local containers: Vx, Vy, Vz, P, P0, Q, txx, tyy, tzz, tyz, txz,
    txy (+ _o old stresses), eta, G, K, fx, fy, fz, inv_dx/y/z."""
    nl = decomp.ni_local
    ng = decomp.ni_global
    inv_di = (blocks.pop("inv_dx"), blocks.pop("inv_dy"), blocks.pop("inv_dz"))
    _dx, _dy, _dz = inv_di
    r, theta, etadtau = pt_stokes.r, pt_stokes.theta_dtau, pt_stokes.etadtau
    eps_rel, eps_abs = pt_stokes.eps_rel, pt_stokes.eps_abs
    nout_i = int(nout)
    max_chunks = max(1, int(math.ceil(iter_max / nout_i)))

    def local_solve(
        Vx, Vy, Vz, Pr, P0, Q,
        txx, tyy, tzz, tyz, txz, txy,
        txx_o, tyy_o, tzz_o, tyz_o, txz_o, txy_o,
        eta, G, K, fx, fy, fz,
    ):
        edges = tuple(halo.axis_edges(a) for a in ("x", "y", "z"))

        # --- static per-solve ghost extensions -----------------------------
        eta_e2 = halo.extend(halo.extend(halo.extend(eta, 0, 2), 1, 2), 2, 2)
        etat_full = maxloc(eta_e2, window=1)[1:-1, 1:-1, 1:-1]  # (+2 each)
        eta_tau = etat_full[1:-1, 1:-1, 1:-1]
        # edge-family material properties on ALL local edges
        eta_xy = _av4(_ext2(eta, 0, 1), 0, 1)
        G_xy = _av4(_ext2(G, 0, 1), 0, 1)
        eta_xz = _av4(_ext2(eta, 0, 2), 0, 2)
        G_xz = _av4(_ext2(G, 0, 2), 0, 2)
        eta_yz = _av4(_ext2(eta, 1, 2), 1, 2)
        G_yz = _av4(_ext2(G, 1, 2), 1, 2)
        fx_ex = halo.extend(fx, 0, 1)
        fy_ey = halo.extend(fy, 1, 1)
        fz_ez = halo.extend(fz, 2, 1)
        etat_x = etat_full[:, 1:-1, 1:-1]
        etat_y = etat_full[1:-1, :, 1:-1]
        etat_z = etat_full[1:-1, 1:-1, :]
        _Gdt_c = 1.0 / (G * dt)
        dr_c = 1.0 / (theta + eta * _Gdt_c + 1.0)
        _G_xy = 1.0 / (G_xy * dt)
        dr_xy = 1.0 / (theta + eta_xy * _G_xy + 1.0)
        _G_xz = 1.0 / (G_xz * dt)
        dr_xz = 1.0 / (theta + eta_xz * _G_xz + 1.0)
        _G_yz = 1.0 / (G_yz * dt)
        dr_yz = 1.0 / (theta + eta_yz * _G_yz + 1.0)

        def grad_and_strain(Vx, Vy, Vz):
            dVx = (Vx[1:, 1:-1, 1:-1] - Vx[:-1, 1:-1, 1:-1]) * _dx
            dVy = (Vy[1:-1, 1:, 1:-1] - Vy[1:-1, :-1, 1:-1]) * _dy
            dVz = (Vz[1:-1, 1:-1, 1:] - Vz[1:-1, 1:-1, :-1]) * _dz
            grad_V = dVx + dVy + dVz
            third = 1.0 / 3.0
            exx = dVx - grad_V * third
            eyy = dVy - grad_V * third
            ezz = dVz - grad_V * third
            exy = 0.5 * (
                (Vx[:, 1:, 1:-1] - Vx[:, :-1, 1:-1]) * _dy
                + (Vy[1:, :, 1:-1] - Vy[:-1, :, 1:-1]) * _dx
            )
            exz = 0.5 * (
                (Vx[:, 1:-1, 1:] - Vx[:, 1:-1, :-1]) * _dz
                + (Vz[1:, 1:-1, :] - Vz[:-1, 1:-1, :]) * _dx
            )
            eyz = 0.5 * (
                (Vy[1:-1, :, 1:] - Vy[1:-1, :, :-1]) * _dz
                + (Vz[1:-1, 1:, :] - Vz[1:-1, :-1, :]) * _dy
            )
            return grad_V, exx, eyy, ezz, eyz, exz, exy

        def momentum(Pr, txx, tyy, tzz, tyz, txz, txy):
            P_ex, txx_ex = halo.extend(Pr, 0, 1), halo.extend(txx, 0, 1)
            Rx = (
                (txx_ex[1:, :, :] - txx_ex[:-1, :, :]) * _dx
                + (txy[:, 1:, :] - txy[:, :-1, :]) * _dy
                + (txz[:, :, 1:] - txz[:, :, :-1]) * _dz
                - (P_ex[1:, :, :] - P_ex[:-1, :, :]) * _dx
                - 0.5 * (fx_ex[1:, :, :] + fx_ex[:-1, :, :])
            )
            P_ey, tyy_ey = halo.extend(Pr, 1, 1), halo.extend(tyy, 1, 1)
            Ry = (
                (txy[1:, :, :] - txy[:-1, :, :]) * _dx
                + (tyy_ey[:, 1:, :] - tyy_ey[:, :-1, :]) * _dy
                + (tyz[:, :, 1:] - tyz[:, :, :-1]) * _dz
                - (P_ey[:, 1:, :] - P_ey[:, :-1, :]) * _dy
                - 0.5 * (fy_ey[:, 1:, :] + fy_ey[:, :-1, :])
            )
            P_ez, tzz_ez = halo.extend(Pr, 2, 1), halo.extend(tzz, 2, 1)
            Rz = (
                (txz[1:, :, :] - txz[:-1, :, :]) * _dx
                + (tyz[:, 1:, :] - tyz[:, :-1, :]) * _dy
                + (tzz_ez[:, :, 1:] - tzz_ez[:, :, :-1]) * _dz
                - (P_ez[:, :, 1:] - P_ez[:, :, :-1]) * _dz
                - 0.5 * (fz_ez[:, :, 1:] + fz_ez[:, :, :-1])
            )
            return Rx, Ry, Rz

        def one_iteration(_, c):
            Vx, Vy, Vz, Pr, txx, tyy, tzz, tyz, txz, txy = c
            grad_V, exx, eyy, ezz, eyz, exz, exy = grad_and_strain(Vx, Vy, Vz)

            _Kdt = 1.0 / (K * dt)
            rhs = -grad_V + Q / dt
            psi = 1.0 / (1.0 / eta + _Gdt_c) * (r / theta)
            Pr = ((P0 * _Kdt + rhs) * psi + Pr) / (1.0 + _Kdt * psi)

            def inc(t, t_o, e, et, _G, dr):
                return dr * (2.0 * et * e - (t - t_o) * et * _G - t)

            txx = txx + inc(txx, txx_o, exx, eta, _Gdt_c, dr_c)
            tyy = tyy + inc(tyy, tyy_o, eyy, eta, _Gdt_c, dr_c)
            tzz = tzz + inc(tzz, tzz_o, ezz, eta, _Gdt_c, dr_c)
            txy_n = txy + inc(txy, txy_o, exy, eta_xy, _G_xy, dr_xy)
            txy_n = _freeze(txy, txy_n, 0, *edges[0])
            txy_n = _freeze(txy, txy_n, 1, *edges[1])
            txz_n = txz + inc(txz, txz_o, exz, eta_xz, _G_xz, dr_xz)
            txz_n = _freeze(txz, txz_n, 0, *edges[0])
            txz_n = _freeze(txz, txz_n, 2, *edges[2])
            tyz_n = tyz + inc(tyz, tyz_o, eyz, eta_yz, _G_yz, dr_yz)
            tyz_n = _freeze(tyz, tyz_n, 1, *edges[1])
            tyz_n = _freeze(tyz, tyz_n, 2, *edges[2])
            txy, txz, tyz = txy_n, txz_n, tyz_n

            Rx, Ry, Rz = momentum(Pr, txx, tyy, tzz, tyz, txz, txy)
            etax = 0.5 * (etat_x[1:, :, :] + etat_x[:-1, :, :])
            etay = 0.5 * (etat_y[:, 1:, :] + etat_y[:, :-1, :])
            etaz = 0.5 * (etat_z[:, :, 1:] + etat_z[:, :, :-1])
            Vx_n = interior_add(Vx, Rx * etadtau / etax, pads=((0, 0), (1, 1), (1, 1)))
            Vy_n = interior_add(Vy, Ry * etadtau / etay, pads=((1, 1), (0, 0), (1, 1)))
            Vz_n = interior_add(Vz, Rz * etadtau / etaz, pads=((1, 1), (1, 1), (0, 0)))
            Vx = _freeze(Vx, Vx_n, 0, *edges[0])
            Vy = _freeze(Vy, Vy_n, 1, *edges[1])
            Vz = _freeze(Vz, Vz_n, 2, *edges[2])

            Vx, Vy, Vz = _free_slip_local_3d((Vx, Vy, Vz), flow_bc, edges)
            Vx = halo.exchange_ghosts(halo.exchange_ghosts(Vx, 1, nl[1]), 2, nl[2])
            Vy = halo.exchange_ghosts(halo.exchange_ghosts(Vy, 0, nl[0]), 2, nl[2])
            Vz = halo.exchange_ghosts(halo.exchange_ghosts(Vz, 0, nl[0]), 1, nl[1])
            return (Vx, Vy, Vz, Pr, txx, tyy, tzz, tyz, txz, txy)

        def residual_norms(state):
            Vx, Vy, Vz, Pr, txx, tyy, tzz, tyz, txz, txy = state
            grad_V = (
                (Vx[1:, 1:-1, 1:-1] - Vx[:-1, 1:-1, 1:-1]) * _dx
                + (Vy[1:-1, 1:, 1:-1] - Vy[1:-1, :-1, 1:-1]) * _dy
                + (Vz[1:-1, 1:-1, 1:] - Vz[1:-1, 1:-1, :-1]) * _dz
            )
            _Kdt = 1.0 / (K * dt)
            RP = -(Pr - P0) * _Kdt + (-grad_V + Q / dt)
            Rx, Ry, Rz = momentum(Pr, txx, tyy, tzz, tyz, txz, txy)

            idx = [lax.axis_index(a) for a in ("x", "y", "z")]

            def face_mask(d_face, shape):
                """Ownership + interior-window mask matching the serial
                norms (R*[1:-1,1:-1,1:-1])."""
                masks = []
                for d in range(3):
                    n_loc = shape[d]
                    g = idx[d] * nl[d] + jnp.arange(n_loc)
                    if d == d_face:
                        own = jnp.arange(n_loc) >= 1
                        m = own & (g >= 2) & (g <= ng[d] - 2)
                    else:
                        m = (g >= 1) & (g <= ng[d] - 2)
                    masks.append(m)
                return (
                    masks[0][:, None, None]
                    & masks[1][None, :, None]
                    & masks[2][None, None, :]
                )

            axes3 = ("x", "y", "z")
            ss_x = lax.psum(jnp.sum(jnp.where(face_mask(0, Rx.shape), Rx, 0.0) ** 2), axes3)
            ss_y = lax.psum(jnp.sum(jnp.where(face_mask(1, Ry.shape), Ry, 0.0) ** 2), axes3)
            ss_z = lax.psum(jnp.sum(jnp.where(face_mask(2, Rz.shape), Rz, 0.0) ** 2), axes3)
            ss_p = lax.psum(jnp.sum(RP**2), axes3)
            nRx = jnp.sqrt(ss_x) / ((ng[0] - 2) * (ng[1] - 1) * (ng[2] - 1))
            nRy = jnp.sqrt(ss_y) / ((ng[0] - 1) * (ng[1] - 2) * (ng[2] - 1))
            nRz = jnp.sqrt(ss_z) / ((ng[0] - 1) * (ng[1] - 1) * (ng[2] - 2))
            nRP = jnp.sqrt(ss_p) / (ng[0] * ng[1] * ng[2])
            return nRx, nRy, nRz, nRP

        def cond(c):
            _, err, err1, chunk = c
            not_conv = ((err / err1) > eps_rel) & (err > eps_abs)
            return (chunk < 1) | (not_conv & (chunk < max_chunks))

        def body(c):
            state, err, err1, chunk = c
            state = lax.fori_loop(0, nout_i, one_iteration, state)
            nRx, nRy, nRz, nRP = residual_norms(state)
            err = jnp.max(jnp.stack([nRx, nRy, nRz, nRP]))
            err1 = jnp.where(chunk == 0, err, err1)
            return state, err, err1, chunk + 1

        dtype = Pr.dtype
        init = (
            (Vx, Vy, Vz, Pr, txx, tyy, tzz, tyz, txz, txy),
            jnp.asarray(jnp.inf, dtype),
            jnp.asarray(1.0, dtype),
            jnp.asarray(0, jnp.int32),
        )
        state, err, _, chunk = lax.while_loop(cond, body, init)
        Vx, Vy, Vz, Pr, txx, tyy, tzz, tyz, txz, txy = state
        return ShardedSolveResult3D(
            Vx=Vx, Vy=Vy, Vz=Vz, P=Pr,
            txx=txx, tyy=tyy, tzz=tzz, tyz=tyz, txz=txz, txy=txy,
            err=err, iters=chunk * nout_i,
        )

    spec = P("x", "y", "z")
    in_specs = (spec,) * 24
    out_specs = ShardedSolveResult3D(
        Vx=spec, Vy=spec, Vz=spec, P=spec,
        txx=spec, tyy=spec, tzz=spec, tyz=spec, txz=spec, txy=spec,
        err=P(), iters=P(),
    )
    fn = jax.shard_map(
        local_solve, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )
    order = (
        "Vx", "Vy", "Vz", "P", "P0", "Q",
        "txx", "tyy", "tzz", "tyz", "txz", "txy",
        "txx_o", "tyy_o", "tzz_o", "tyz_o", "txz_o", "txy_o",
        "eta", "G", "K", "fx", "fy", "fz",
    )
    return fn(*(blocks[k] for k in order))
