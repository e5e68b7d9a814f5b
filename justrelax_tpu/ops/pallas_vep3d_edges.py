"""Pallas TPU kernel: 3D VEP EDGE return-mapping passes (hybrid iteration).

Motivation (r05 measurement record, v5e 126³ f32, docs/performance.md):
the 3D VEP iteration is compute-inefficient in XLA — 3 452 µs/iter against
a 399 µs VPU flop ceiling and a 694 µs HBM ceiling — and the pass bisect
(scripts/probe_vep3d.py) pins ~78% of that time in the THREE edge
return-mapping passes, whose deep interpolation trees XLA re-computes per
consumer tile inside its loop fusions. The fully-fused blocked kernel
(ops/pallas_stokes3d_vep_blocked.py) kills the recompute but its ~146-value
live set forces small (1.6× redundant) windows and it only ties XLA.

This kernel takes the surgical middle path: ONLY the edge passes run in
Pallas — radius-2 halo, small per-family live set, near-1 window
redundancy — while the center pass, θ/P update, viscosity continuation and
velocity update stay in XLA (the center-only probe measured 0.81× of HBM
peak there). Both passes read the PRE-iteration state (Jacobi update), so
the split is exact, not an approximation.

Zero-copy plumbing: every canvas rides as its OWN ``memory_space=ANY``
operand (no stack/concat staging — at the 126³ bench shape X = Y = Z + 2 =
128 so no padding either), windowed into VMEM with one async copy per
operand per block. The call sits INSIDE the jitted ``lax.fori_loop`` body —
a device-side custom call, NOT the per-iteration host launch that sank the
r02 strip kernels.

The physics body is the SAME single source as every other path:
:func:`justrelax_tpu.ops.stokes3d_vep.update_stresses_center_edges_3d`
with ``probe_passes=("edges",)`` and canvas moves (``shift="roll"``,
traced ``x_off``). Strain rates are re-derived from V in-VMEM (3 canvases
of V traffic instead of 6 of ε).

Serial equivalence: tests/test_pallas_vep3d_edges.py (interpret mode).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from justrelax_tpu.ops.pallas_stokes3d_vep_blocked import (
    _PP_FIELDS,
    _flatten_vep_consts,
    _rebuild_vep_consts,
)
from justrelax_tpu.ops.stokes3d_vep import update_stresses_center_edges_3d
from justrelax_tpu.ops.stokes3d_vep_canvas import (
    VEP3DCanvasConsts,
    canvas_moves,
)
from justrelax_tpu.rheology.plasticity import PlasticParams

Array = Any

__all__ = ["vep3d_edges_blocked", "vep3d_edges_split",
           "choose_blocking_edges"]

# dynamic inputs: Vx Vy Vz theta eta tau_c_normals(3) tau_e(3) lam_e(3)
# (the edge passes read ONLY the 3 normal components of tau_c / tau_o_c —
# stokes3d_vep.py:311,313 — so the shear slots are dead DMA and trimmed)
_N_IN = 14
# outputs: tau_e(3) lam_e(3)
_N_OUT = 6
_H = 2  # x-radius: V -> eps (1) -> other_to_edge interp (1)

# scalar stack: inv_di(3) dt theta_dtau rel_lambda
_N_LEAD = 6


def choose_blocking_edges(nx, ny, nz, n_const, itemsize=4,
                          plane_block=None, budget=118 * 1024 * 1024,
                          nvals=40, prefer_divisor=True,
                          n_in=_N_IN, n_out=_N_OUT, buffers=1):
    """Pick (R, nbx, X_pad, W) for the x-slab edges kernel (no temporal
    blocking, radius-2 halo). ``nvals`` models the per-plane live/spill
    footprint of the sequential edge-family passes. With
    ``prefer_divisor`` (default) candidates with R | (nx+2) rank first —
    X_pad == X makes the host side zero-copy."""
    X = nx + 2
    y_pad = -((ny + 2) // -8) * 8
    z_pad = -((nz + 2) // -128) * 128
    plane = y_pad * z_pad * itemsize
    best = None
    rs = [plane_block] if plane_block else list(range(64, 3, -1))
    for r_t in rs:
        nbx = -(X // -r_t)
        if nbx < 2:
            continue
        R = -(X // -nbx)
        W = R + 2 * _H
        X_pad = R * nbx
        if X_pad < W or R < _H or (nbx - 1) * R < 2 * _H:
            continue
        vmem = (buffers * (n_in + n_const) + n_out + nvals) * W * plane \
            + 2 * n_out * R * plane
        if vmem > budget:
            continue
        divisor = 0 if (prefer_divisor and X_pad == X) else 1
        # minimize window redundancy (the body is compute-heavy), prefer
        # zero-copy (X_pad == X) at equal redundancy class
        score = (divisor, W / R, nbx)
        if best is None or score < best[0]:
            best = (score, (R, nbx, X_pad, W))
    return None if best is None else best[1]


def _edges_kernel(scal_ref, *refs,
                  nx, ny, nz, R, W, X_pad, nbx, n_const,
                  names, snames, visc_m, oxs, db=False):
    dyn = refs[:_N_IN]
    kconst = refs[_N_IN:_N_IN + n_const]
    outs = refs[_N_IN + n_const:_N_IN + n_const + _N_OUT]
    scr = refs[_N_IN + n_const + _N_OUT]
    sems = refs[_N_IN + n_const + _N_OUT + 1]

    i = pl.program_id(0)
    inv_di = (scal_ref[0], scal_ref[1], scal_ref[2])
    dt, theta_dtau, rel_lam = scal_ref[3], scal_ref[4], scal_ref[5]
    pp = PlasticParams(*(
        scal_ref[_N_LEAD + jj] > 0.5 if f == "is_pl"
        else scal_ref[_N_LEAD + jj]
        for jj, f in enumerate(_PP_FIELDS)
    ))
    n_pp = _N_LEAD + len(_PP_FIELDS)

    x0 = jnp.clip(i * R - _H, 0, X_pad - W)

    if db:
        # double-buffered window DMA (measured r05: the serialized copies
        # alone cost 691 us/iter at 126^3 = half the kernel wall; slot
        # parity is unrolled so every scratch index stays static)
        def _win(b):
            return jnp.clip(b * R - _H, 0, X_pad - W)

        def _copies(b, slot):
            xb = _win(b)
            return [
                pltpu.make_async_copy(src.at[pl.ds(xb, W)],
                                      scr.at[slot, jj],
                                      sems.at[slot, jj])
                for jj, src in enumerate(dyn + kconst)
            ]

        @pl.when(i == 0)
        def _():
            for cp in _copies(i, 0):
                cp.start()

        def _run(slot):
            for cp in _copies(i, slot):
                cp.wait()

            @pl.when(i + 1 < nbx)
            def _():
                for cp in _copies(i + 1, 1 - slot):
                    cp.start()

            _edges_body(scal_ref, lambda jj: scr[slot, jj], outs,
                        inv_di, dt, theta_dtau, rel_lam, pp, n_pp,
                        nx=nx, ny=ny, nz=nz, R=R, X_pad=X_pad,
                        n_const=n_const, names=names, snames=snames,
                        visc_m=visc_m, oxs=oxs, i=i, x0=x0)

        @pl.when(jax.lax.rem(i, jnp.int32(2)) == 0)
        def _():
            _run(0)

        @pl.when(jax.lax.rem(i, jnp.int32(2)) == 1)
        def _():
            _run(1)
        return

    copies = [
        pltpu.make_async_copy(src.at[pl.ds(x0, W)], scr.at[jj], sems.at[jj])
        for jj, src in enumerate(dyn + kconst)
    ]
    for cp in copies:
        cp.start()
    for cp in copies:
        cp.wait()
    _edges_body(scal_ref, lambda jj: scr[jj], outs,
                inv_di, dt, theta_dtau, rel_lam, pp, n_pp,
                nx=nx, ny=ny, nz=nz, R=R, X_pad=X_pad,
                n_const=n_const, names=names, snames=snames,
                visc_m=visc_m, oxs=oxs, i=i, x0=x0)


def _edges_body(scal_ref, win, outs,
                inv_di, dt, theta_dtau, rel_lam, pp, n_pp, *,
                nx, ny, nz, R, X_pad, n_const, names, snames,
                visc_m, oxs, i, x0):
    co = _rebuild_vep_consts(
        lambda jj: win(_N_IN + jj), names,
        lambda jj: scal_ref[n_pp + jj], snames, pp, visc_m,
    )
    Vx, Vy, Vz = win(0), win(1), win(2)
    theta, eta = win(3), win(4)
    tau_c3 = tuple(win(5 + jj) for jj in range(3))
    tau_c6 = tau_c3 + tau_c3  # shear slots unread by the edge passes
    tau_e3 = tuple(win(8 + jj) for jj in range(3))
    lam_e3 = tuple(win(11 + jj) for jj in range(3))

    # strain rates from V (canvas twin of compute_strain_rate_3d, rolls)
    inv_dx, inv_dy, inv_dz = inv_di
    sp1 = lambda A, ax: jnp.roll(A, 1, axis=ax)   # noqa: E731
    sm1 = lambda A, ax: jnp.roll(A, -1, axis=ax)  # noqa: E731
    dVxdx = (Vx - sp1(Vx, 0)) * inv_dx
    dVydy = (Vy - sp1(Vy, 1)) * inv_dy
    dVzdz = (Vz - sp1(Vz, 2)) * inv_dz
    grad_V = dVxdx + dVydy + dVzdz
    third = 1.0 / 3.0
    eps_c3 = (dVxdx - grad_V * third, dVydy - grad_V * third,
              dVzdz - grad_V * third)
    eps_e3 = (
        0.5 * ((sm1(Vy, 2) - Vy) * inv_dz + (sm1(Vz, 1) - Vz) * inv_dy),
        0.5 * ((sm1(Vx, 2) - Vx) * inv_dz + (sm1(Vz, 0) - Vz) * inv_dx),
        0.5 * ((sm1(Vx, 1) - Vx) * inv_dy + (sm1(Vy, 0) - Vy) * inv_dx),
    )

    moves = canvas_moves((nx, ny, nz), shift="roll", x_off=x0)
    res = update_stresses_center_edges_3d(
        eps_c3, eps_e3, tau_c6, tau_e3, co.tau_o_c, co.tau_o_e,
        theta, eta, jnp.zeros_like(theta), lam_e3, None,
        None, None, (None, None, None),
        rel_lam, dt, theta_dtau,
        moves=moves, params=co.params, probe_passes=("edges",),
    )
    flat = (*res.tau_e, *res.lam_e)

    offx = i * R - x0
    for ox in oxs:
        @pl.when(offx == ox)
        def _(flat=flat, ox=ox):
            for jj in range(_N_OUT):
                outs[jj][...] = flat[jj][ox:ox + R]


def vep3d_edges_blocked(
    V, theta, eta, tau_c6, tau_e3, lam_e3,
    co: VEP3DCanvasConsts,
    inv_di,
    *,
    dt, theta_dtau, lambda_relaxation,
    interpret: bool = False,
    plane_block: Optional[int] = None,
    nvals: int = 40,
    double_buffer: bool = True,
):
    """Run the three edge return-mapping passes in one Pallas x-slab sweep.
    All operands are (nx+2, ny+2, nz+2) canvases; ``co`` must be built
    with ``scalar_plastic=True, hoist_tau_o=False`` (the kernel re-derives
    the τ_o edge interpolants in VMEM). Returns (tau_e3, lam_e3) canvases.

    ``double_buffer`` prefetches block i+1's windows during block i's
    compute (r05 measurement: the serialized window DMA alone is 691 us of
    the 1398 us kernel wall at 126^3); the const DMA list is trimmed to
    the fields the edge passes actually read (G_e + tau_o — the center
    -pass consts cost 4 canvases of dead traffic per window otherwise).
    """
    X, Y, Z = theta.shape
    nx, ny, nz = X - 2, Y - 2, Z - 2
    dtype = theta.dtype
    itemsize = jnp.dtype(dtype).itemsize

    const_arrays, names, extra_scalars, snames, pp_scalars = (
        _flatten_vep_consts(co))
    keep = ({f"G_e{i}" for i in range(3)}
            | {f"tau_o_c{i}" for i in range(3)}  # normals only (line 313)
            | {f"tau_o_e{i}" for i in range(3)})
    trimmed = [(a, nm) for a, nm in zip(const_arrays, names) if nm in keep]
    const_arrays = [a for a, _ in trimmed]
    names = tuple(nm for _, nm in trimmed)
    n_const = len(const_arrays)
    blocking = choose_blocking_edges(nx, ny, nz, n_const, itemsize,
                                     plane_block, nvals=nvals,
                                     buffers=2 if double_buffer else 1)
    if blocking is None:
        raise ValueError(
            f"no edges-kernel blocking fits VMEM for {nx}x{ny}x{nz}")
    R, nbx, X_pad, W = blocking
    oxs = tuple(sorted({
        b * R - min(max(b * R - _H, 0), X_pad - W) for b in range(nbx)
    }))
    y_pad = -(Y // -8) * 8
    z_pad = -(Z // -128) * 128

    def pad3(A):
        if X_pad == X and y_pad == Y and z_pad == Z:
            return A  # zero-copy fast path (the 126³ bench shape)
        return jnp.pad(A, ((0, X_pad - X), (0, y_pad - Y), (0, z_pad - Z)))

    dyn = [pad3(a) for a in (*V, theta, eta, *tau_c6[:3], *tau_e3, *lam_e3)]
    consts = [pad3(a.astype(dtype)) for a in const_arrays]
    scal = jnp.stack([
        jnp.asarray(v, dtype) for v in (
            *inv_di, dt, theta_dtau, lambda_relaxation,
            *pp_scalars, *extra_scalars,
        )
    ])

    kern = partial(
        _edges_kernel, nx=nx, ny=ny, nz=nz, R=R, W=W, X_pad=X_pad, nbx=nbx,
        n_const=n_const, names=names, snames=snames, visc_m=co.visc_m,
        oxs=oxs, db=double_buffer,
    )
    n_ops = _N_IN + n_const
    if double_buffer:
        scratch = [
            pltpu.VMEM((2, n_ops, W, y_pad, z_pad), dtype),
            pltpu.SemaphoreType.DMA((2, n_ops)),
        ]
    else:
        scratch = [
            pltpu.VMEM((n_ops, W, y_pad, z_pad), dtype),
            pltpu.SemaphoreType.DMA((n_ops,)),
        ]
    call = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nbx,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (_N_IN + n_const),
            out_specs=[
                pl.BlockSpec((R, y_pad, z_pad), lambda i, *_: (i, 0, 0))
            ] * _N_OUT,
            scratch_shapes=scratch,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((X_pad, y_pad, z_pad), dtype)
        ] * _N_OUT,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    o = call(scal, *dyn, *consts)
    if X_pad == X and y_pad == Y and z_pad == Z:
        out = tuple(o)
    else:
        out = tuple(a[:X, :Y, :Z] for a in o)
    return out[:3], out[3:]


# --------------------------------------------------------------------------
# per-family SPLIT kernels: one pallas_call per edge family, each carrying
# only that family's live set (~1/3 of the sequential-body footprint), with
# the solve-frozen tau_o edge interpolants HOISTED into per-family const
# canvases (vep3d_canvas_consts(hoist_tau_o=True)) instead of re-derived
# in VMEM — trading ~6 canvases of DMA per family for ~5 interpolation
# trees of per-iteration compute.
# --------------------------------------------------------------------------

# per-family dynamic inputs: Vx Vy Vz theta eta tau_c(3 normals)
# tau_e(3) lam_e(own)
_N_IN_F = 12
# per-family outputs: own tau_e, own lam_e
_N_OUT_F = 2


def _family_kernel(scal_ref, *refs,
                   fam, nx, ny, nz, R, W, X_pad, nbx, n_const,
                   g_is_canvas, oxs):
    dyn = refs[:_N_IN_F]
    kconst = refs[_N_IN_F:_N_IN_F + n_const]
    outs = refs[_N_IN_F + n_const:_N_IN_F + n_const + _N_OUT_F]
    scr = refs[_N_IN_F + n_const + _N_OUT_F]
    sems = refs[_N_IN_F + n_const + _N_OUT_F + 1]

    i = pl.program_id(0)
    inv_di = (scal_ref[0], scal_ref[1], scal_ref[2])
    dt, theta_dtau, rel_lam = scal_ref[3], scal_ref[4], scal_ref[5]
    pp = PlasticParams(*(
        scal_ref[_N_LEAD + jj] > 0.5 if f == "is_pl"
        else scal_ref[_N_LEAD + jj]
        for jj, f in enumerate(_PP_FIELDS)
    ))
    n_pp = _N_LEAD + len(_PP_FIELDS)
    K_s = scal_ref[n_pp]
    G_s = None if g_is_canvas else scal_ref[n_pp + 1]

    x0 = jnp.clip(i * R - _H, 0, X_pad - W)
    copies = [
        pltpu.make_async_copy(src.at[pl.ds(x0, W)], scr.at[jj], sems.at[jj])
        for jj, src in enumerate(dyn + kconst)
    ]
    for cp in copies:
        cp.start()
    for cp in copies:
        cp.wait()

    Vx, Vy, Vz = scr[0], scr[1], scr[2]
    theta, eta = scr[3], scr[4]
    tau_c3 = tuple(scr[5 + jj] for jj in range(3))
    tau_e3 = tuple(scr[8 + jj] for jj in range(3))
    lam_k = scr[11]
    t6o_k = tuple(scr[_N_IN_F + jj] for jj in range(6))
    G_k = scr[_N_IN_F + 6] if g_is_canvas else G_s

    # strain rates from V (canvas twin of compute_strain_rate_3d, rolls)
    inv_dx, inv_dy, inv_dz = inv_di
    sp1 = lambda A, ax: jnp.roll(A, 1, axis=ax)   # noqa: E731
    sm1 = lambda A, ax: jnp.roll(A, -1, axis=ax)  # noqa: E731
    dVxdx = (Vx - sp1(Vx, 0)) * inv_dx
    dVydy = (Vy - sp1(Vy, 1)) * inv_dy
    dVzdz = (Vz - sp1(Vz, 2)) * inv_dz
    grad_V = dVxdx + dVydy + dVzdz
    third = 1.0 / 3.0
    eps_c3 = (dVxdx - grad_V * third, dVydy - grad_V * third,
              dVzdz - grad_V * third)
    eps_e3 = (
        0.5 * ((sm1(Vy, 2) - Vy) * inv_dz + (sm1(Vz, 1) - Vz) * inv_dy),
        0.5 * ((sm1(Vx, 2) - Vx) * inv_dz + (sm1(Vz, 0) - Vz) * inv_dx),
        0.5 * ((sm1(Vx, 1) - Vx) * inv_dy + (sm1(Vy, 0) - Vy) * inv_dx),
    )

    from justrelax_tpu.ops.stokes3d_vep import VEPParams3D
    params = VEPParams3D(
        ppc=pp, G_c=None, K_c=None,
        ppe=(pp, pp, pp),
        G_e=(G_k, G_k, G_k), K_e=(K_s, K_s, K_s),
        tau_o6_e=(t6o_k, t6o_k, t6o_k),
    )
    moves = canvas_moves((nx, ny, nz), shift="roll", x_off=x0)
    res = update_stresses_center_edges_3d(
        eps_c3, eps_e3, tau_c3 + tau_c3, tau_e3,
        (None,) * 6, (None,) * 3,
        theta, eta, jnp.zeros_like(theta), (lam_k, lam_k, lam_k), None,
        None, None, (None, None, None),
        rel_lam, dt, theta_dtau,
        moves=moves, params=params, probe_passes=("edges",),
        edge_families=(fam,),
    )
    flat = (res.tau_e[fam], res.lam_e[fam])

    offx = i * R - x0
    for ox in oxs:
        @pl.when(offx == ox)
        def _(flat=flat, ox=ox):
            for jj in range(_N_OUT_F):
                outs[jj][...] = flat[jj][ox:ox + R]


def vep3d_edges_split(
    V, theta, eta, tau_c6, tau_e3, lam_e3,
    co: VEP3DCanvasConsts,
    inv_di,
    *,
    dt, theta_dtau, lambda_relaxation,
    interpret: bool = False,
    plane_block: Optional[int] = None,
    nvals: int = 22,
):
    """Run the three edge return-mapping passes as THREE per-family Pallas
    x-slab sweeps. ``co`` must be built with ``scalar_plastic=True,
    scalar_K=True, hoist_tau_o=True`` (per-family τ_o interpolants as const
    canvases). Returns (tau_e3, lam_e3) canvases."""
    X, Y, Z = theta.shape
    nx, ny, nz = X - 2, Y - 2, Z - 2
    dtype = theta.dtype
    itemsize = jnp.dtype(dtype).itemsize
    assert co.params.tau_o6_e is not None, \
        "vep3d_edges_split requires hoist_tau_o=True consts"
    pp = co.params.ppc
    assert jnp.asarray(pp.C_cosphi).ndim == 0, \
        "vep3d_edges_split requires scalar_plastic consts"
    pp_scalars = [jnp.asarray(getattr(pp, f)) for f in _PP_FIELDS]

    y_pad = -(Y // -8) * 8
    z_pad = -(Z // -128) * 128

    def pad3(A):
        if A.shape[1] == y_pad and A.shape[2] == z_pad:
            return A
        return jnp.pad(A, ((0, 0), (0, y_pad - A.shape[1]),
                           (0, z_pad - A.shape[2])))

    new_tau, new_lam = [], []
    for fam in range(3):
        K_fam = jnp.asarray(co.params.K_e[fam])
        assert K_fam.ndim == 0, \
            "vep3d_edges_split requires scalar_K consts"
        G_fam = jnp.asarray(co.params.G_e[fam], dtype)
        g_is_canvas = G_fam.ndim == 3
        consts = [pad3(t.astype(dtype)) for t in co.params.tau_o6_e[fam]]
        if g_is_canvas:
            consts.append(pad3(G_fam))
        n_const = len(consts)
        blocking = choose_blocking_edges(
            nx, ny, nz, n_const, itemsize, plane_block, nvals=nvals,
            n_in=_N_IN_F, n_out=_N_OUT_F)
        if blocking is None:
            raise ValueError(
                f"no split-kernel blocking fits VMEM for {nx}x{ny}x{nz}")
        R, nbx, X_pad, W = blocking
        oxs = tuple(sorted({
            b * R - min(max(b * R - _H, 0), X_pad - W) for b in range(nbx)
        }))

        def padx(A):
            A = pad3(A)
            if X_pad == A.shape[0]:
                return A
            return jnp.pad(A, ((0, X_pad - A.shape[0]), (0, 0), (0, 0)))

        dyn = [padx(a) for a in (*V, theta, eta, *tau_c6[:3], *tau_e3,
                                 lam_e3[fam])]
        consts_p = [padx(cst) for cst in consts]
        scal = jnp.stack([
            jnp.asarray(v, dtype) for v in (
                *inv_di, dt, theta_dtau, lambda_relaxation,
                *pp_scalars, K_fam,
                *(() if g_is_canvas else (G_fam,)),
            )
        ])

        kern = partial(
            _family_kernel, fam=fam, nx=nx, ny=ny, nz=nz, R=R, W=W,
            X_pad=X_pad, nbx=nbx, n_const=n_const,
            g_is_canvas=g_is_canvas, oxs=oxs,
        )
        call = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nbx,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
                * (_N_IN_F + n_const),
                out_specs=[
                    pl.BlockSpec((R, y_pad, z_pad), lambda i, *_: (i, 0, 0))
                ] * _N_OUT_F,
                scratch_shapes=[
                    pltpu.VMEM((_N_IN_F + n_const, W, y_pad, z_pad), dtype),
                    pltpu.SemaphoreType.DMA((_N_IN_F + n_const,)),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((X_pad, y_pad, z_pad), dtype)
            ] * _N_OUT_F,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=127 * 1024 * 1024,
            ),
            interpret=interpret,
        )
        o = call(scal, *dyn, *consts_p)
        if X_pad == X and y_pad == Y and z_pad == Z:
            t_new, l_new = o
        else:
            t_new, l_new = (a[:X, :Y, :Z] for a in o)
        new_tau.append(t_new)
        new_lam.append(l_new)
    return tuple(new_tau), tuple(new_lam)
