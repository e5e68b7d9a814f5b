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

__all__ = ["vep3d_edges_blocked", "choose_blocking_edges"]

# dynamic inputs: Vx Vy Vz theta eta tau_c(6) tau_e(3) lam_e(3)
_N_IN = 17
# outputs: tau_e(3) lam_e(3)
_N_OUT = 6
_H = 2  # x-radius: V -> eps (1) -> other_to_edge interp (1)

# scalar stack: inv_di(3) dt theta_dtau rel_lambda
_N_LEAD = 6


def choose_blocking_edges(nx, ny, nz, n_const, itemsize=4,
                          plane_block=None, budget=118 * 1024 * 1024,
                          nvals=40, prefer_divisor=True):
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
        vmem = (_N_IN + n_const + _N_OUT + nvals) * W * plane \
            + 2 * _N_OUT * R * plane
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
                  names, snames, visc_m, oxs):
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
    copies = [
        pltpu.make_async_copy(src.at[pl.ds(x0, W)], scr.at[jj], sems.at[jj])
        for jj, src in enumerate(dyn + kconst)
    ]
    for cp in copies:
        cp.start()
    for cp in copies:
        cp.wait()

    co = _rebuild_vep_consts(
        lambda jj: scr[_N_IN + jj], names,
        lambda jj: scal_ref[n_pp + jj], snames, pp, visc_m,
    )
    Vx, Vy, Vz = scr[0], scr[1], scr[2]
    theta, eta = scr[3], scr[4]
    tau_c6 = tuple(scr[5 + jj] for jj in range(6))
    tau_e3 = tuple(scr[11 + jj] for jj in range(3))
    lam_e3 = tuple(scr[14 + jj] for jj in range(3))

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
):
    """Run the three edge return-mapping passes in one Pallas x-slab sweep.
    All operands are (nx+2, ny+2, nz+2) canvases; ``co`` must be built
    with ``scalar_plastic=True, hoist_tau_o=False`` (the kernel re-derives
    the τ_o edge interpolants in VMEM). Returns (tau_e3, lam_e3) canvases.
    """
    X, Y, Z = theta.shape
    nx, ny, nz = X - 2, Y - 2, Z - 2
    dtype = theta.dtype
    itemsize = jnp.dtype(dtype).itemsize

    const_arrays, names, extra_scalars, snames, pp_scalars = (
        _flatten_vep_consts(co))
    n_const = len(const_arrays)
    blocking = choose_blocking_edges(nx, ny, nz, n_const, itemsize,
                                     plane_block, nvals=nvals)
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

    dyn = [pad3(a) for a in (*V, theta, eta, *tau_c6, *tau_e3, *lam_e3)]
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
        oxs=oxs,
    )
    call = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nbx,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (_N_IN + n_const),
            out_specs=[
                pl.BlockSpec((R, y_pad, z_pad), lambda i, *_: (i, 0, 0))
            ] * _N_OUT,
            scratch_shapes=[
                pltpu.VMEM((_N_IN + n_const, W, y_pad, z_pad), dtype),
                pltpu.SemaphoreType.DMA((_N_IN + n_const,)),
            ],
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
