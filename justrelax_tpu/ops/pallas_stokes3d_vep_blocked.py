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
# fixed leading scalars before the plastic block:
# inv_di(3) dt r theta_dtau etadtau rel_lam rel_visc cut_lo cut_hi
_N_LEAD_SCALARS = 11


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
    """(canvas list, canvas names, extra scalars, scalar names, plastic
    scalars). 0-d const values (e.g. the scalar-K collapse) ride in SMEM.
    Requires scalar-plastic consts (vep3d_canvas_consts(scalar_plastic=True,
    hoist_tau_o=False))."""
    arrays, names, scalars, snames = [], [], [], []

    def put(name, v):
        if v is None:
            return
        v = jnp.asarray(v)
        if v.ndim == 0:
            scalars.append(v)
            snames.append(name)
        else:
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
    return arrays, tuple(names), scalars, tuple(snames), pp_scalars


def _rebuild_vep_consts(get, names, sget, snames, pp: PlasticParams,
                        visc_m) -> VEP3DCanvasConsts:
    vals = {nm: get(i) for i, nm in enumerate(names)}
    vals.update({nm: sget(i) for i, nm in enumerate(snames)})
    # .get: the edges kernel trims its const DMA to the fields the edge
    # passes read (G_e + tau_o); center-pass fields are absent there
    params = VEPParams3D(
        ppc=pp,
        G_c=vals.get("G_c"), K_c=vals.get("K_c"),
        ppe=(pp, pp, pp),
        G_e=tuple(vals[f"G_e{i}"] for i in range(3)),
        K_e=tuple(vals[f"K_e{i}"] for i in range(3)),
        tau_o6_e=None,
    )
    return VEP3DCanvasConsts(
        params=params,
        tau_o_c=tuple(vals.get(f"tau_o_c{i}") for i in range(6)),
        tau_o_e=tuple(vals[f"tau_o_e{i}"] for i in range(3)),
        P0=vals.get("P0"), Q=vals.get("Q"),
        fzA=vals.get("fzA"), fzB=vals.get("fzB"),
        visc_eta=vals.get("visc_eta"),
        visc_A=vals.get("visc_A"), visc_B=vals.get("visc_B"),
        visc_m=visc_m,
    )


def choose_blocking_vep3d(nx, ny, nz, n_const, itemsize=4,
                          plane_block=None, iters_per_pass=None,
                          budget=123 * 1024 * 1024, n_slots=1,
                          nvals=None, y_block=None):
    """Pick (R, Ry, k, nbx, nby, X_pad, Y_pad, W, Wy) for the 2D-blocked
    VEP kernel.

    Unlike the VE kernel's 46·W spill model, the VEP body's register-spill
    footprint is ~nvals INDEPENDENT (W, Wy, Z)-shaped values (measured:
    98.77 MB at W=10 full-y = 151 values; 113.22 MB at W=9 = 192 — NOT
    proportional to W; k=1 measures 146 at 126³, r05 compiler OOM report),
    so x-only blocking cannot fit 126³: the kernel blocks x AND y to
    shrink every value. Halo is 3k per side per blocked axis (the VEP
    iteration's stencil radius is 3).

    Scoring (r05, set by ON-CHIP measurement at 126³ f32): the VEP body is
    COMPUTE-bound (VPU roofline probe: flop-SOL 399 µs vs 3452 µs
    measured), so candidates are ranked by window compute redundancy
    (W·Wy)/(R·Ry) FIRST, modeled HBM traffic as tiebreak — the traffic-
    first objective picked R13/Ry24/k2 (redundancy 3.2×, 5.0 ms/iter)
    while redundancy-first picks the measured-best k=1 square window
    (1.6×, 3.74 ms/iter)."""
    X = nx + 2
    Y = ny + 2
    y_pad_g = -(Y // -8) * 8
    z_pad = -((nz + 2) // -128) * 128
    n_tot = _N_CARRY + n_const
    ks = [iters_per_pass] if iters_per_pass else [1, 2, 3]
    nvals_given = nvals
    rs = [plane_block] if plane_block else list(range(64, 2, -1))
    rys = [y_block] if y_block else [y_pad_g] + list(range(112, 7, -8))
    best = None
    for k in ks:
        H = 3 * k
        # window starts must be provably sublane-aligned when z_pad > 128
        # (Mosaic divisibility prover; see pallas_stokes3d_blocked.py r05)
        Hy = -(H // -8) * 8 if z_pad > 128 else H
        # measured spill counts (126³ compiler reports): ~190 live window
        # values at k>=2, ~146-155 at k=1 (smaller unrolled live set)
        nvals = nvals_given if nvals_given is not None \
            else (155 if k == 1 else 190)
        for r_t in rs:
            nbx = -(X // -r_t)
            if nbx < 2:
                continue
            R = -(X // -nbx)
            W = R + 2 * H
            X_pad = R * nbx
            if X_pad < W or R < H or (nbx - 1) * R < 2 * H:
                continue
            for ry_t in rys:
                nby = -(y_pad_g // -ry_t)
                if nby == 1:
                    Ry, Wy, Y_pad = y_pad_g, y_pad_g, y_pad_g
                else:
                    # Mosaic/TPU alignment (r05 on-chip root cause): BOTH
                    # the out-spec block's sublane dim (Ry) AND the DMA'd
                    # VMEM window's sublane dim (Wy) must be multiples of
                    # 8 — an async copy into a scratch with unaligned
                    # second-minor dim crashes the TPU worker
                    # (scripts/repro_2d_dma.py: Wy=34 faults, 40 runs).
                    Ry = -((-(y_pad_g // -nby)) // -8) * 8
                    nby = -(y_pad_g // -Ry)
                    Wy = -((Ry + 2 * Hy) // -8) * 8
                    Y_pad = Ry * nby
                    if nby < 2 or Y_pad < Wy or Ry < H \
                            or (nby - 1) * Ry < 2 * H:
                        continue
                # sublane tiling pads Wy up to a multiple of 8 in VMEM
                v = W * (-(Wy // -8) * 8) * z_pad * itemsize
                vmem = (nvals + n_slots * n_tot) * v \
                    + 2 * _N_CARRY * R * Ry * z_pad * itemsize
                if vmem > budget:
                    continue
                redundancy = (W * Wy) / (R * Ry)
                traffic = (n_tot * redundancy + _N_CARRY) / k
                score = (redundancy, traffic)
                if best is None or score < best[0]:
                    best = (score, (R, Ry, k, nbx, nby, X_pad, Y_pad, W, Wy))
    return None if best is None else best[1]


def _blocked_kernel(scal_ref, nit_ref, carry_hbm, const_hbm, out_ref,
                    scr_c, scr_k, sem_c, sem_k,
                    *, nx, ny, nz, R, Ry, H, Hy, W, Wy, X_pad, Y_pad,
                    nbx, nby, names, snames, visc_m, oxs, oys):
    i = pl.program_id(0)
    j = pl.program_id(1)
    inv_di = (scal_ref[0], scal_ref[1], scal_ref[2])
    dt, r, theta_dtau, etadtau = (scal_ref[3], scal_ref[4], scal_ref[5],
                                  scal_ref[6])
    rel_lam, rel_visc = scal_ref[7], scal_ref[8]
    cut_lo, cut_hi = scal_ref[9], scal_ref[10]
    n_lead = _N_LEAD_SCALARS
    pp = PlasticParams(*(
        scal_ref[n_lead + jj] > 0.5 if f == "is_pl" else scal_ref[n_lead + jj]
        for jj, f in enumerate(_PP_FIELDS)
    ))
    n_pp = n_lead + len(_PP_FIELDS)
    k_act = nit_ref[0]

    def wstart_x(b):
        return jnp.clip(b * R - H, 0, X_pad - W)

    def wstart_y(b):
        if nby == 1:
            return 0
        y0 = jnp.clip(b * Ry - Hy, 0, Y_pad - Wy)
        if Hy % 8 == 0 and Ry % 8 == 0 and (Y_pad - Wy) % 8 == 0:
            y0 = pl.multiple_of(y0, 8)
        return y0

    x0 = wstart_x(i)
    y0 = wstart_y(j)
    pltpu.make_async_copy(
        carry_hbm.at[:, pl.ds(x0, W), pl.ds(y0, Wy)], scr_c, sem_c
    ).start()
    pltpu.make_async_copy(
        const_hbm.at[:, pl.ds(x0, W), pl.ds(y0, Wy)], scr_k, sem_k
    ).start()
    pltpu.make_async_copy(
        carry_hbm.at[:, pl.ds(x0, W), pl.ds(y0, Wy)], scr_c, sem_c
    ).wait()
    pltpu.make_async_copy(
        const_hbm.at[:, pl.ds(x0, W), pl.ds(y0, Wy)], scr_k, sem_k
    ).wait()

    co = _rebuild_vep_consts(
        lambda jj: scr_k[jj], names,
        lambda jj: scal_ref[n_pp + jj], snames, pp, visc_m,
    )
    carry = VEP3DCanvasCarry(
        V=(scr_c[0], scr_c[1], scr_c[2]),
        P=scr_c[3], theta=scr_c[4],
        tau_c=tuple(scr_c[5 + jj] for jj in range(6)),
        tau_e=tuple(scr_c[11 + jj] for jj in range(3)),
        eta=scr_c[14], lam=scr_c[15],
        lam_e=tuple(scr_c[16 + jj] for jj in range(3)),
    )

    def body(_, c):
        return iteration_vep3d_canvas(
            c, co, None, inv_di, nx=nx, ny=ny, nz=nz, dt=dt,
            r=r, theta_dtau=theta_dtau, etadtau=etadtau,
            lambda_relaxation=rel_lam, viscosity_relaxation=rel_visc,
            viscosity_cutoff=(cut_lo, cut_hi),
            shift="roll", x_off=x0, y_off=y0,
        )

    out = lax.fori_loop(0, k_act, body, carry)
    flat = (*out.V, out.P, out.theta, *out.tau_c, *out.tau_e, out.eta,
            out.lam, *out.lam_e)

    offx = i * R - x0   # ∈ oxs (host-enumerated owned-band offsets)
    offy = j * Ry - y0  # ∈ oys (0 when nby == 1)
    for ox in oxs:
        for oy in oys:
            @pl.when((offx == ox) & (offy == oy))
            def _(flat=flat, ox=ox, oy=oy):
                for jj in range(_N_CARRY):
                    out_ref[jj] = flat[jj][ox:ox + R, oy:oy + Ry]


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
    y_block: Optional[int] = None,
    nvals: Optional[int] = None,
) -> VEP3DCanvasCarry:
    """Advance ``nout`` fused canvas VEP iterations via 2D-blocked (x, y)
    window streaming. Same contract as
    :func:`justrelax_tpu.ops.stokes3d_vep_canvas.vep3d_chunk_canvas`;
    ``co`` must be built with ``scalar_plastic=True, hoist_tau_o=False``.
    ``nout`` may be traced."""
    X, Y, Z = c.P.shape
    nx, ny, nz = X - 2, Y - 2, Z - 2
    dtype = c.P.dtype
    itemsize = jnp.dtype(dtype).itemsize

    const_arrays, names, extra_scalars, snames, pp_scalars = (
        _flatten_vep_consts(co))
    blocking = choose_blocking_vep3d(
        nx, ny, nz, len(const_arrays), itemsize, plane_block, iters_per_pass,
        nvals=nvals, y_block=y_block,
    )
    if blocking is None:
        raise ValueError(
            f"no blocked VEP 3D configuration fits VMEM for {nx}x{ny}x{nz}"
        )
    R, Ry, k, nbx, nby, X_pad, Y_pad, W, Wy = blocking
    H = 3 * k
    z_pad_chk = -(Z // -128) * 128
    Hy = -(H // -8) * 8 if z_pad_chk > 128 else H

    def owned_offsets(nb, Rb, Pad, Wb, Hb=None):
        """Static set of (block start − window start) offsets the clipped
        window formula can produce; the kernel's unrolled copy-out
        dispatches over exactly this set."""
        Hb = H if Hb is None else Hb
        return tuple(sorted({
            b * Rb - min(max(b * Rb - Hb, 0), Pad - Wb) for b in range(nb)
        }))

    oxs = owned_offsets(nbx, R, X_pad, W)
    oys = (0,) if nby == 1 else owned_offsets(nby, Ry, Y_pad, Wy, Hy)
    for o in oxs:
        assert 0 <= o <= W - R
    for o in oys:
        assert 0 <= o <= Wy - Ry
    z_pad = -(Z // -128) * 128

    def pad3(A):
        return jnp.pad(A, ((0, X_pad - X), (0, Y_pad - Y), (0, z_pad - Z)))

    flat = (*c.V, c.P, c.theta, *c.tau_c, *c.tau_e, c.eta, c.lam, *c.lam_e)
    carry0 = jnp.stack([pad3(a) for a in flat])
    const = jnp.stack([pad3(a.astype(dtype)) for a in const_arrays])
    scal = jnp.stack([
        jnp.asarray(v, dtype) for v in (
            *inv_di, dt, r, theta_dtau, etadtau,
            lambda_relaxation, viscosity_relaxation,
            viscosity_cutoff[0], viscosity_cutoff[1], *pp_scalars,
            *extra_scalars,
        )
    ])

    kern = partial(
        _blocked_kernel, nx=nx, ny=ny, nz=nz, R=R, Ry=Ry, H=H, W=W, Wy=Wy,
        X_pad=X_pad, Y_pad=Y_pad, nbx=nbx, nby=nby, Hy=Hy,
        names=names, snames=snames, visc_m=co.visc_m, oxs=oxs, oys=oys,
    )
    call = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nbx, nby),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (_N_CARRY, R, Ry, z_pad), lambda i, j, *_: (0, i, j, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((_N_CARRY, W, Wy, z_pad), dtype),
                pltpu.VMEM((len(const_arrays), W, Wy, z_pad), dtype),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((_N_CARRY, X_pad, Y_pad, z_pad),
                                       dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=127 * 1024 * 1024,
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
