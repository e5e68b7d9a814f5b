"""Pallas TPU kernel: temporally-blocked 3D VE Stokes chunk (x-slab streaming).

Round-2's single-iteration strip kernels (ops/pallas_stokes3d.py) lost to XLA
because every iteration paid a full host-side launch and an un-overlapped
window DMA; probe measurements this round (v5e, slope-timed) show the actual
VPU cost of the roll+mask canvas form is ~220 Gcell/s even on (12,128,128)
windows — compute was never the wall. This kernel therefore amortizes the
window traffic with TEMPORAL blocking, exactly like the 2D blocked kernel
(ops/pallas_stokes.py::stokes_chunk_blocked):

- blocks of ``R`` x-planes advance ``k`` iterations per pass inside VMEM,
  loading a (R + 4k)-plane window (the iteration's x-radius is 2, so a
  2k-plane halo per side makes the owned planes equal the full-canvas
  result exactly);
- per-block DMA runs serially before the block's compute by default:
  the double-buffered prefetch variant (``pipeline=True``) measured SLOWER
  on v5e (466 vs 384 µs/iter at 126³ — the cross-block prefetch interleaves
  badly with the output pipeline), so serial DMA is the default;
- HBM traffic per iteration drops from the XLA path's ~53 canvas-plane
  equivalents (46 materialized intermediates, BENCH_r02 HLO analysis) to
  ((10 + n_const)·W/R + 10)/k.

The physics body is ops/stokes3d_canvas.py::iteration3d_canvas — the same
single source that the XLA canvas family runs — evaluated with a traced
``x_off`` so the ownership bands live in global coordinates. VE/compressible
physics enters through the CanvasCoeffs3D coefficient canvases; coefficients
that are statically scalar (the viscous-limit decay factors) ride in SMEM
instead of costing a canvas of traffic.

Serial equivalence: tests/test_pallas3d_blocked.py (blocked == canvas chunk
== slice/pad op composition, interpret mode, viscous + full VE).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from justrelax_tpu.ops.stokes3d_canvas import (
    CanvasCoeffs3D,
    _edge_avg,
    _sm1,
    iteration3d_canvas,
)

Array = Any

__all__ = ["stokes3d_chunk_blocked", "choose_blocking_3d"]

_N_CARRY = 10


def _flatten_coeffs(co: CanvasCoeffs3D):
    """Split the coefficient pytree into (array canvases, names) +
    (scalars, names). Absent (None) fields are omitted entirely."""
    arrays, names, scalars, snames = [], [], [], []

    def put(name, v):
        if v is None:
            return
        if hasattr(v, "ndim") and v.ndim == 3:
            arrays.append(v)
            names.append(name)
        else:
            scalars.append(v)
            snames.append(name)

    put("c1", co.c1)
    put("c2", co.c2)
    put("c3", co.c3)
    put("a_c", co.a_c)
    put("b_c", co.b_c)
    for i in range(3):
        put(f"d_c{i}", None if co.d_c is None else co.d_c[i])
        put(f"a_e{i}", co.a_e[i])
        put(f"b_e{i}", co.b_e[i])
        put(f"d_e{i}", None if co.d_e is None else co.d_e[i])
        put(f"inv_eta{i}", co.inv_eta[i])
        put(f"f{i}", co.f[i])
    return arrays, tuple(names), scalars, tuple(snames)


def _rebuild_coeffs(get, names, sget, snames) -> CanvasCoeffs3D:
    vals = {nm: get(i) for i, nm in enumerate(names)}
    vals.update({nm: sget(i) for i, nm in enumerate(snames)})

    def tup(prefix):
        if f"{prefix}0" not in vals:
            return None
        return tuple(vals[f"{prefix}{i}"] for i in range(3))

    return CanvasCoeffs3D(
        c1=vals.get("c1"), c2=vals.get("c2"), c3=vals["c3"],
        a_c=vals["a_c"], b_c=vals["b_c"], d_c=tup("d_c"),
        a_e=tup("a_e"), b_e=tup("b_e"), d_e=tup("d_e"),
        inv_eta=tup("inv_eta"), f=tup("f"),
    )


def choose_blocking_3d(nx, ny, nz, n_const, itemsize=4,
                       plane_block=None, iters_per_pass=None,
                       budget=105 * 1024 * 1024, n_slots=2, n_derived=0,
                       y_block=None):
    """Pick (R, k, n_blocks, X_pad, W, Ry, nby, Y_pad, Wy) for the 3D
    blocked kernel.

    3D windows are fat (a halo PLANE costs a full (Y, Z) canvas), so the
    chooser scores candidates by modeled HBM traffic per iteration
    ((n_tot·(W·Wy)/(R·Ry) + 10)/k plane-equivalents) subject to the VMEM
    budget: scratch (n_slots·n_tot window volumes) + pipelined output
    (2·10·R·Ry) + 46 in-flight/register-spill window volumes. The 46 term
    is calibrated on two exact r04 compiler data points at 126³ (n_tot=21,
    serial, full-y): W=25 predicted 115.94 MB vs the compiler's reported
    115.98 (OOM over the 110 MB scoped limit), W=22 predicted 104.6 MB and
    compiles — the same spill phenomenology as the 2D VEP chooser's 90·W
    rows.

    r05: the y axis may also be blocked (nby > 1) so past-VMEM-residency
    grids (254³) fit. Mosaic/TPU constraint (r05 on-chip root cause,
    scripts/repro_2d_dma.py): the owned block Ry AND the DMA'd window Wy
    must be sublane-aligned (multiples of 8) or the async copy crashes the
    TPU worker."""
    X = nx + 2
    y_pad_g = -((ny + 2) // -8) * 8
    z_pad = -((nz + 2) // -128) * 128
    n_tot = _N_CARRY + n_const
    ks = [iters_per_pass] if iters_per_pass else [8, 6, 4, 3, 2]
    rs = [plane_block] if plane_block else list(range(64, 3, -1))
    rys = [y_block] if y_block else [y_pad_g] + list(range(112, 7, -8))
    best = None
    for k in ks:
        H = 2 * k
        for r_t in rs:
            n_blocks = -(X // -r_t)
            if n_blocks < 2:
                continue
            R = -(X // -n_blocks)
            W = R + 2 * H
            X_pad = R * n_blocks
            # window offsets must land in a small static set (predicated
            # stores): interior starts unclipped needs R ≥ H; the top clamp
            # needs (n_blocks−1)·R ≥ 2H
            if X_pad < W or R < H or (n_blocks - 1) * R < 2 * H:
                continue
            # y-halo rounded to sublane tiles so every window START is a
            # multiple of 8 BY CONSTRUCTION (j·Ry − Hy with Ry, Hy, and
            # both clip bounds all multiples of 8): Mosaic's divisibility
            # prover rejects unaligned dynamic slice starts in the
            # second-minor dim when z_pad > 128 (254³ compile failure,
            # r05; at z_pad = 128 unaligned starts compile and run —
            # measured on-chip — so alignment is applied only when needed)
            Hy = -(H // -8) * 8 if z_pad > 128 else H
            for ry_t in rys:
                nby = -(y_pad_g // -ry_t)
                if nby == 1:
                    Ry, Wy, Y_pad = y_pad_g, y_pad_g, y_pad_g
                else:
                    Ry = -((-(y_pad_g // -nby)) // -8) * 8
                    nby = -(y_pad_g // -Ry)
                    Wy = Ry + 2 * Hy
                    Y_pad = Ry * nby
                    if nby < 2 or Y_pad < Wy or Ry < H \
                            or (nby - 1) * Ry < 2 * H:
                        continue
                vol = W * Wy * z_pad * itemsize
                vmem = (n_slots * n_tot + n_derived + 46) * vol \
                    + 2 * _N_CARRY * R * Ry * z_pad * itemsize
                if vmem > budget:
                    continue
                traffic = (n_tot * (W * Wy) / (R * Ry) + _N_CARRY) / k
                if best is None or traffic < best[0]:
                    best = (traffic,
                            (R, k, n_blocks, X_pad, W, Ry, nby, Y_pad, Wy))
    return None if best is None else best[1]


def _blocked_kernel(scal_ref, nit_ref, carry_hbm, const_hbm, out_ref,
                    scr_c, scr_k, sem_c, sem_k,
                    *, nx, ny, nz, R, H, W, X_pad, n_blocks, n_slots,
                    Ry, nby, Y_pad, Wy, Hy, oxs, oys,
                    free_slip, pipeline, names, snames, derive_viscous):
    i = pl.program_id(0)
    j = pl.program_id(1)
    inv_di = (scal_ref[0], scal_ref[1], scal_ref[2])
    k_act = nit_ref[0]

    def wstart(b):
        return jnp.clip(b * R - H, 0, X_pad - W)

    def wstart_y(b):
        if nby == 1:
            return 0
        y0 = jnp.clip(b * Ry - Hy, 0, Y_pad - Wy)
        if Hy % 8 == 0 and Ry % 8 == 0 and (Y_pad - Wy) % 8 == 0:
            # every term is a multiple of 8, so the start is too;
            # pl.multiple_of asserts it to Mosaic's divisibility prover
            y0 = pl.multiple_of(y0, 8)
        return y0

    y0 = wstart_y(j)

    def dma_c(slot, b):
        return pltpu.make_async_copy(
            carry_hbm.at[:, pl.ds(wstart(b), W), pl.ds(y0, Wy)],
            scr_c.at[slot], sem_c.at[slot]
        )

    def dma_k(slot, b):
        return pltpu.make_async_copy(
            const_hbm.at[:, pl.ds(wstart(b), W), pl.ds(y0, Wy)],
            scr_k.at[slot], sem_k.at[slot]
        )

    if pipeline:
        @pl.when(i == 0)
        def _():
            dma_c(0, 0).start()
            dma_k(0, 0).start()

        @pl.when(i + 1 < n_blocks)
        def _():
            nxt = (i + 1) % n_slots
            dma_c(nxt, i + 1).start()
            dma_k(nxt, i + 1).start()

        slot = i % n_slots
    else:
        slot = 0
        dma_c(0, i).start()
        dma_k(0, i).start()
    dma_c(slot, i).wait()
    dma_k(slot, i).wait()

    start = wstart(i)
    carry = tuple(scr_c[slot, j] for j in range(_N_CARRY))
    if derive_viscous:
        # stream only (η, ητ, fx, fy, fz) edge-padded canvases and derive
        # the viscous-limit coefficients per pass — the hoisted rolls cost
        # ~one iteration's ops per k iterations while removing 6 canvases
        # of HBM traffic. Derived values at the window-top row come from a
        # wrapped roll; that row is halo (discarded) for every block, and
        # for the last block it maps past the physical domain where no
        # ownership band applies.
        eta_w = scr_k[slot, 0]
        etat_w = scr_k[slot, 1]
        r_theta = scal_ref[3]
        theta_dtau = scal_ref[4]
        etadtau = scal_ref[5]
        dtau_r = 1.0 / (theta_dtau + 1.0)
        edge_axes = ((1, 2), (0, 2), (0, 1))
        co = CanvasCoeffs3D(
            c1=None, c2=None, c3=etat_w * r_theta,
            a_c=1.0 - dtau_r, b_c=2.0 * dtau_r * eta_w, d_c=None,
            a_e=(1.0 - dtau_r,) * 3,
            b_e=tuple(2.0 * dtau_r * _edge_avg(eta_w, *ax) for ax in edge_axes),
            d_e=None,
            inv_eta=tuple(
                etadtau / (0.5 * (etat_w + _sm1(etat_w, ax))) for ax in range(3)
            ),
            f=tuple(
                0.5 * (scr_k[slot, 2 + ax] + _sm1(scr_k[slot, 2 + ax], ax))
                for ax in range(3)
            ),
        )
    else:
        co = _rebuild_coeffs(
            lambda j: scr_k[slot, j], names,
            lambda j: scal_ref[3 + j], snames,
        )

    def body(_, c):
        return iteration3d_canvas(
            c, co, inv_di, nx=nx, ny=ny, nz=nz,
            free_slip=free_slip, x_off=start, y_off=y0,
        )

    out = lax.fori_loop(0, k_act, body, carry)

    off = i * R - start   # ∈ oxs; predicated static-slice stores
    offy = j * Ry - y0    # ∈ oys (0 when nby == 1)
    for o_val in oxs:
        for oy in oys:
            @pl.when((off == o_val) & (offy == oy))
            def _(out=out, o_val=o_val, oy=oy):
                for jj in range(_N_CARRY):
                    out_ref[jj] = out[jj][o_val:o_val + R, oy:oy + Ry]


def stokes3d_chunk_blocked(
    carry, co: Optional[CanvasCoeffs3D], inv_di, nout,
    free_slip: bool = True, interpret: bool = False,
    plane_block: Optional[int] = None, iters_per_pass: Optional[int] = None,
    pipeline: bool = False, viscous_consts=None, pt_scalars=None,
    y_block: Optional[int] = None,
):
    """Advance ``nout`` fused 3D VE iterations via temporally-blocked x-slab
    streaming. Same contract as
    :func:`justrelax_tpu.ops.stokes3d_canvas.stokes3d_chunk_canvas`:
    ``carry`` is the tuple of 10 collocated canvases (``pack_carry``
    unstacked), ``co`` the coefficient canvases, ``nout`` may be traced."""
    X, Y, Z = carry[3].shape
    nx, ny, nz = X - 2, Y - 2, Z - 2
    dtype = carry[3].dtype
    itemsize = jnp.dtype(dtype).itemsize

    derive_viscous = viscous_consts is not None
    if derive_viscous:
        # (η, ητ, fx, fy, fz) cell arrays → edge-padded canvases;
        # pt_scalars = (r/θ_dτ, θ_dτ, ηdτ)
        p1 = ((1, 1), (1, 1), (1, 1))
        const_arrays = [
            jnp.pad(a, p1, mode="edge") for a in viscous_consts
        ]
        names, snames = (), ()
        scalars = list(pt_scalars)
        n_derived = 11
    else:
        const_arrays, names, scalars, snames = _flatten_coeffs(co)
        n_derived = 0
    # serial (default) mode single-buffers the scratch window — budget the
    # chooser accordingly (an n_slots=2 budget halves the feasible W and
    # drives R down to 10 at 126³: W/R = 2.2× redundant compute, measured
    # r04 at 811 µs/iter vs the XLA canvas path's 492)
    blocking = choose_blocking_3d(
        nx, ny, nz, len(const_arrays), itemsize, plane_block, iters_per_pass,
        n_slots=2 if pipeline else 1, n_derived=n_derived, y_block=y_block,
    )
    if blocking is None:
        raise ValueError(f"no 3D blocked configuration fits VMEM for {nx}x{ny}x{nz}")
    R, k, n_blocks, X_pad, W, Ry, nby, Y_pad, Wy = blocking
    H = 2 * k
    Hy = (Wy - Ry) // 2 if nby > 1 else H  # chooser: Wy = Ry + 2·Hy
    if pipeline and nby > 1:
        raise ValueError("pipeline=True supports x-only blocking (nby == 1)")
    # every block's local output offset must hit a predicated store slot
    oxs = tuple(sorted({
        b * R - min(max(b * R - H, 0), X_pad - W) for b in range(n_blocks)
    }))
    oys = (0,) if nby == 1 else tuple(sorted({
        b * Ry - min(max(b * Ry - Hy, 0), Y_pad - Wy) for b in range(nby)
    }))
    for o in oxs:
        assert 0 <= o <= W - R
    for o in oys:
        assert 0 <= o <= Wy - Ry
    y_pad = Y_pad
    z_pad = -(Z // -128) * 128

    def pad3(A):
        return jnp.pad(A, ((0, X_pad - X), (0, y_pad - Y), (0, z_pad - Z)))

    carry0 = jnp.stack([pad3(c) for c in carry])
    const = jnp.stack([pad3(a.astype(dtype)) for a in const_arrays])
    scal = jnp.stack(
        [jnp.asarray(v, dtype) for v in (*inv_di, *scalars)]
    )

    n_slots = 2 if pipeline else 1
    kern = partial(
        _blocked_kernel, nx=nx, ny=ny, nz=nz, R=R, H=H, W=W, X_pad=X_pad,
        n_blocks=n_blocks, n_slots=n_slots,
        Ry=Ry, nby=nby, Y_pad=Y_pad, Wy=Wy, Hy=Hy, oxs=oxs, oys=oys,
        free_slip=free_slip,
        pipeline=pipeline, names=names, snames=snames,
        derive_viscous=derive_viscous,
    )
    call = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_blocks, nby),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (_N_CARRY, R, Ry, z_pad), lambda i, j, *_: (0, i, j, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((n_slots, _N_CARRY, W, Wy, z_pad), dtype),
                pltpu.VMEM((n_slots, len(const_arrays), W, Wy, z_pad), dtype),
                pltpu.SemaphoreType.DMA((n_slots,)),
                pltpu.SemaphoreType.DMA((n_slots,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((_N_CARRY, X_pad, y_pad, z_pad), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    nout = jnp.asarray(nout, jnp.int32)
    n_pass = (nout + k - 1) // k

    def one_pass(p, cs):
        k_act = jnp.minimum(k, nout - p * k).astype(jnp.int32)
        return call(scal, k_act.reshape(1), cs, const)

    o = lax.fori_loop(0, n_pass, one_pass, carry0)
    return tuple(o[j, :X, :Y, :Z] for j in range(_N_CARRY))
