"""Pallas TPU kernel: blocked 3D VEP Stokes chunk (x-slab streaming).

Why this exists (measured motivation, scripts/probe_vep3d.py + AOT cost
analysis, v5e 126³ f32): the 3D VEP iteration is the weakest bench row.
XLA's optimized module plans only 452 B/cell (mixed-shape) / 337 B/cell
(canvas) of HBM traffic — ~1 ms at peak — yet measures 3.5 / 4.8 ms,
because the deep interpolation trees of the three edge return-mapping
passes are re-computed per consumer tile inside XLA's loop fusions (the
classic in-fusion duplication blow-up; the shallow center pass alone runs
at 0.81× peak). Pallas fixes the root cause: every intermediate is
materialized ONCE in VMEM and reused.

Design (clone of ops/pallas_stokes3d_blocked.py, VEP body):

- blocks of ``R`` x-planes advance ``k`` iterations per pass in VMEM,
  loading a (R + 6k)-plane window — the VEP iteration's x-radius is 3
  (V → ε → edge-interpolated trial → τ → V), vs the VE body's 2;
- the physics body is ops/stokes3d_vep_canvas.py::iteration_vep3d_canvas —
  the SAME single source the XLA canvas family runs — with ``shift="roll"``
  (Mosaic lowering) and a traced ``x_off`` for global ownership bands;
- consts are lean: G/K blend canvases (8), τ_o canvases (9; the edge
  interpolants re-derive in VMEM where compute is free — the XLA paths
  hoist them as 18 extra canvases of traffic), P0, Q, optional buoyancy
  affine pair and collapsed-power-law viscosity canvases. Plastic
  parameters ride as SMEM scalars under the phase-uniform guard
  (:func:`vep3d_blocked_supported`), the 2D chunk's restriction pattern.

Serial equivalence: tests/test_pallas_vep3d_blocked.py (blocked == canvas
chunk == serial composition, interpret mode).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from justrelax_tpu.ops.stokes3d_vep import VEPParams3D
from justrelax_tpu.ops.stokes3d_vep_canvas import (
    VEP3DCanvasCarry,
    VEP3DCanvasConsts,
    iteration_vep3d_canvas,
)
from justrelax_tpu.rheology.plasticity import PlasticParams

Array = Any

__all__ = [
    "stokes3d_vep_chunk_blocked",
    "choose_blocking_vep3d",
    "vep3d_blocked_supported",
]

_N_CARRY = 19  # Vx Vy Vz P theta tau_c(6) tau_e(3) eta lam lam_e(3)

# plastic scalar order in the SMEM stack (PlasticParams fields)
_PP_FIELDS = ("is_pl", "pl_frac", "C_cosphi", "sinphi", "cosphi", "sinpsi",
              "eta_reg", "pT", "dq_shear")
# fixed leading scalars before the plastic block
_N_LEAD_SCALARS = 10  # inv_di(3) dt r theta_dtau etadtau rel_lam rel_visc… see below


def vep3d_blocked_supported(material) -> bool:
    """Concrete-material guard for the scalar-plastic blocked kernel:
    plasticity must be phase-uniform (every PlasticParams field collapses
    to one scalar) and strain-softening off (no EII dependence)."""
    import numpy as np

    from justrelax_tpu.rheology.materials import _as_stack

    p = _as_stack(material).params

    def uni(name):
        v = np.asarray(getattr(p, name))
        return bool(np.all(v == v.ravel()[0]))

    uniform = all(uni(n) for n in (
        "is_plastic", "C", "friction_angle", "dilation_angle", "eta_reg",
        "tension_pT", "dqdtau_alt",
    ))
    soft_off = not any(
        np.any(np.asarray(getattr(p, n)) != 0)
        for n in ("soft_C_active", "soft_phi_active", "soft_C_nl")
    )
    return uniform and soft_off


def _flatten_vep_consts(co: VEP3DCanvasConsts):
    """(canvas list, names) + (plastic scalars from co.params.ppc).
    Requires scalar-plastic consts (vep3d_canvas_consts(scalar_plastic=True,
    hoist_tau_o=False))."""
    arrays, names = [], []

    def put(name, v):
        if v is None:
            return
        assert v.ndim == 3, (name, v.shape)
        arrays.append(v)
        names.append(name)

    p = co.params
    put("G_c", p.G_c)
    put("K_c", p.K_c)
    for i in range(3):
        put(f"G_e{i}", p.G_e[i])
        put(f"K_e{i}", p.K_e[i])
    for i in range(6):
        put(f"tau_o_c{i}", co.tau_o_c[i])
    for i in range(3):
        put(f"tau_o_e{i}", co.tau_o_e[i])
    put("P0", co.P0)
    put("Q", co.Q)
    put("fzA", co.fzA)
    put("fzB", co.fzB)
    put("visc_eta", co.visc_eta)
    put("visc_A", co.visc_A)
    put("visc_B", co.visc_B)
    pp = co.params.ppc
    assert jnp.asarray(pp.C_cosphi).ndim == 0, "scalar_plastic consts required"
    # keep full precision here — the caller's scalar stack picks the dtype
    pp_scalars = [jnp.asarray(getattr(pp, f)) for f in _PP_FIELDS]
    return arrays, tuple(names), pp_scalars


def _rebuild_vep_consts(get, names, pp: PlasticParams,
                        visc_m) -> VEP3DCanvasConsts:
    vals = {nm: get(i) for i, nm in enumerate(names)}
    params = VEPParams3D(
        ppc=pp,
        G_c=vals["G_c"], K_c=vals["K_c"],
        ppe=(pp, pp, pp),
        G_e=tuple(vals[f"G_e{i}"] for i in range(3)),
        K_e=tuple(vals[f"K_e{i}"] for i in range(3)),
        tau_o6_e=None,
    )
    return VEP3DCanvasConsts(
        params=params,
        tau_o_c=tuple(vals[f"tau_o_c{i}"] for i in range(6)),
        tau_o_e=tuple(vals[f"tau_o_e{i}"] for i in range(3)),
        P0=vals["P0"], Q=vals["Q"],
        fzA=vals.get("fzA"), fzB=vals.get("fzB"),
        visc_eta=vals.get("visc_eta"),
        visc_A=vals.get("visc_A"), visc_B=vals.get("visc_B"),
        visc_m=visc_m,
    )


def choose_blocking_vep3d(nx, ny, nz, n_const, itemsize=4,
                          plane_block=None, iters_per_pass=None,
                          budget=105 * 1024 * 1024, n_slots=1,
                          spill=110):
    """Pick (R, k, n_blocks, X_pad, W) for the blocked VEP kernel.

    Same score/constraints as choose_blocking_3d but with the VEP's
    x-radius 3 (halo H = 3k) and a ``spill``·W in-flight/register-spill
    term for the much larger return-mapping body (the VE body calibrated
    at 46·W; the 2D VEP chunk at ~90·W rows — start high and let the
    compiler's exact OOM reports recalibrate)."""
    X = nx + 2
    y_pad = -((ny + 2) // -8) * 8
    z_pad = -((nz + 2) // -128) * 128
    plane = y_pad * z_pad * itemsize
    n_tot = _N_CARRY + n_const
    ks = [iters_per_pass] if iters_per_pass else [4, 3, 2, 1]
    rs = [plane_block] if plane_block else list(range(64, 3, -1))
    best = None
    for k in ks:
        H = 3 * k
        for r_t in rs:
            n_blocks = -(X // -r_t)
            if n_blocks < 2:
                continue
            R = -(X // -n_blocks)
            W = R + 2 * H
            X_pad = R * n_blocks
            if X_pad < W or R < H or (n_blocks - 1) * R < 2 * H:
                continue
            vmem = (
                (n_slots * n_tot + spill) * W + 2 * _N_CARRY * R
            ) * plane
            if vmem > budget:
                continue
            traffic = (n_tot * W / R + _N_CARRY) / k
            if best is None or traffic < best[0]:
                best = (traffic, (R, k, n_blocks, X_pad, W))
    return None if best is None else best[1]


def _blocked_kernel(scal_ref, nit_ref, carry_hbm, const_hbm, out_ref,
                    scr_c, scr_k, sem_c, sem_k,
                    *, nx, ny, nz, R, H, W, X_pad, n_blocks, n_slots,
                    pipeline, names, visc_m):
    i = pl.program_id(0)
    inv_di = (scal_ref[0], scal_ref[1], scal_ref[2])
    dt, r, theta_dtau, etadtau = (scal_ref[3], scal_ref[4], scal_ref[5],
                                  scal_ref[6])
    rel_lam, rel_visc = scal_ref[7], scal_ref[8]
    cut_lo, cut_hi = scal_ref[9], scal_ref[10]
    n_lead = 11
    pp = PlasticParams(*(
        scal_ref[n_lead + j] > 0.5 if f == "is_pl" else scal_ref[n_lead + j]
        for j, f in enumerate(_PP_FIELDS)
    ))
    k_act = nit_ref[0]

    def wstart(b):
        return jnp.clip(b * R - H, 0, X_pad - W)

    def dma_c(slot, b):
        return pltpu.make_async_copy(
            carry_hbm.at[:, pl.ds(wstart(b), W)], scr_c.at[slot], sem_c.at[slot]
        )

    def dma_k(slot, b):
        return pltpu.make_async_copy(
            const_hbm.at[:, pl.ds(wstart(b), W)], scr_k.at[slot], sem_k.at[slot]
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
    co = _rebuild_vep_consts(lambda j: scr_k[slot, j], names, pp, visc_m)
    carry = VEP3DCanvasCarry(
        V=(scr_c[slot, 0], scr_c[slot, 1], scr_c[slot, 2]),
        P=scr_c[slot, 3], theta=scr_c[slot, 4],
        tau_c=tuple(scr_c[slot, 5 + j] for j in range(6)),
        tau_e=tuple(scr_c[slot, 11 + j] for j in range(3)),
        eta=scr_c[slot, 14], lam=scr_c[slot, 15],
        lam_e=tuple(scr_c[slot, 16 + j] for j in range(3)),
    )

    def body(_, c):
        return iteration_vep3d_canvas(
            c, co, None, inv_di, nx=nx, ny=ny, nz=nz, dt=dt,
            r=r, theta_dtau=theta_dtau, etadtau=etadtau,
            lambda_relaxation=rel_lam, viscosity_relaxation=rel_visc,
            viscosity_cutoff=(cut_lo, cut_hi),
            shift="roll", x_off=start,
        )

    out = lax.fori_loop(0, k_act, body, carry)
    flat = (*out.V, out.P, out.theta, *out.tau_c, *out.tau_e, out.eta,
            out.lam, *out.lam_e)

    off = i * R - start  # ∈ {0, H, 2H}; predicated static-slice stores
    for o_val in (0, H, 2 * H):
        @pl.when(off == o_val)
        def _(flat=flat, o_val=o_val):
            for j in range(_N_CARRY):
                out_ref[j] = flat[j][o_val:o_val + R]


def stokes3d_vep_chunk_blocked(
    c: VEP3DCanvasCarry,
    co: VEP3DCanvasConsts,
    inv_di,
    nout,
    *,
    dt, r, theta_dtau, etadtau,
    lambda_relaxation, viscosity_relaxation,
    viscosity_cutoff=(-jnp.inf, jnp.inf),
    interpret: bool = False,
    plane_block: Optional[int] = None,
    iters_per_pass: Optional[int] = None,
    pipeline: bool = False,
    spill: int = 110,
) -> VEP3DCanvasCarry:
    """Advance ``nout`` fused canvas VEP iterations via blocked x-slab
    streaming. Same contract as
    :func:`justrelax_tpu.ops.stokes3d_vep_canvas.vep3d_chunk_canvas`;
    ``co`` must be built with ``scalar_plastic=True, hoist_tau_o=False``.
    ``nout`` may be traced."""
    X, Y, Z = c.P.shape
    nx, ny, nz = X - 2, Y - 2, Z - 2
    dtype = c.P.dtype
    itemsize = jnp.dtype(dtype).itemsize

    const_arrays, names, pp_scalars = _flatten_vep_consts(co)
    blocking = choose_blocking_vep3d(
        nx, ny, nz, len(const_arrays), itemsize, plane_block, iters_per_pass,
        n_slots=2 if pipeline else 1, spill=spill,
    )
    if blocking is None:
        raise ValueError(
            f"no blocked VEP 3D configuration fits VMEM for {nx}x{ny}x{nz}"
        )
    R, k, n_blocks, X_pad, W = blocking
    H = 3 * k
    offs = {
        b * R - min(max(b * R - H, 0), X_pad - W) for b in range(n_blocks)
    }
    assert offs <= {0, H, 2 * H}, (blocking, offs)
    y_pad = -(Y // -8) * 8
    z_pad = -(Z // -128) * 128

    def pad3(A):
        return jnp.pad(A, ((0, X_pad - X), (0, y_pad - Y), (0, z_pad - Z)))

    flat = (*c.V, c.P, c.theta, *c.tau_c, *c.tau_e, c.eta, c.lam, *c.lam_e)
    carry0 = jnp.stack([pad3(a) for a in flat])
    const = jnp.stack([pad3(a.astype(dtype)) for a in const_arrays])
    scal = jnp.stack([
        jnp.asarray(v, dtype) for v in (
            *inv_di, dt, r, theta_dtau, etadtau,
            lambda_relaxation, viscosity_relaxation,
            viscosity_cutoff[0], viscosity_cutoff[1], *pp_scalars,
        )
    ])

    n_slots = 2 if pipeline else 1
    kern = partial(
        _blocked_kernel, nx=nx, ny=ny, nz=nz, R=R, H=H, W=W, X_pad=X_pad,
        n_blocks=n_blocks, n_slots=n_slots, pipeline=pipeline,
        names=names, visc_m=co.visc_m,
    )
    call = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (_N_CARRY, R, y_pad, z_pad), lambda i, *_: (0, i, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((n_slots, _N_CARRY, W, y_pad, z_pad), dtype),
                pltpu.VMEM((n_slots, len(const_arrays), W, y_pad, z_pad),
                           dtype),
                pltpu.SemaphoreType.DMA((n_slots,)),
                pltpu.SemaphoreType.DMA((n_slots,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((_N_CARRY, X_pad, y_pad, z_pad), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
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
    flat_out = tuple(o[j, :X, :Y, :Z] for j in range(_N_CARRY))
    return VEP3DCanvasCarry(
        V=flat_out[:3], P=flat_out[3], theta=flat_out[4],
        tau_c=flat_out[5:11], tau_e=flat_out[11:14],
        eta=flat_out[14], lam=flat_out[15], lam_e=flat_out[16:19],
    )
