"""Pallas TPU kernel: VMEM-resident APT Stokes PT chunk (2D, viscous limit).

The APT method is memory-bound: the reference pays full HBM traffic for every
one of its ~8 kernel launches per PT iteration (SURVEY.md §6). On TPU, for
grids whose working set fits in VMEM (~16 MB/core: up to ~448² f32 with 10
arrays), the *entire chunk of ``nout`` iterations* can run inside one Pallas
kernel with all state held in VMEM — HBM is touched once per chunk instead of
once per iteration, taking the hot loop off the memory wall entirely.

Mosaic notes (v5e toolchain): concatenations of sliced operands trip
"result/input offset mismatch on non-concat dimension", and two-axis
``jnp.pad`` is miscompiled. The kernel therefore uses a **collocated canvas**
formulation: every staggered field is embedded in a common (nx+2, ny+2)
canvas, neighbor access is ``jnp.roll`` with static ±1 shifts (which lowers
cleanly), and staggered-subgrid/boundary ownership is enforced with
``broadcasted_iota`` freeze-masks. All per-iteration ops are full-canvas
elementwise + single-step rolls; clamped boundary material properties come
from edge-padding the read-only canvases on the host.

Canvas layout (a, b are canvas indices; nx×ny cells):
- cell (i, j)   -> (i+1, j+1)   P, τxx, τyy, η, ητ, ρgx, ρgy
- vertex (i, j) -> (i, j)       τxy (i ∈ 0..nx)
- Vx face (i) × cell-with-ghost (j ∈ -1..ny) -> (i, j+1)
- Vy cell-with-ghost (i) × face (j)          -> (i+1, j)
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from justrelax_tpu.ops.stencil import av_a

Array = Any

__all__ = [
    "stokes_chunk_vmem",
    "stokes_chunk_blocked",
    "vmem_bytes_needed",
    "choose_blocking",
]


VMEM_BUDGET = 100 * 1024 * 1024  # raised scoped-VMEM limit (see pallas_call)


def vmem_bytes_needed(nx: int, ny: int, itemsize: int = 4) -> int:
    """Calibrated VMEM footprint of the chunk kernel.

    Mosaic's scoped-vmem accounting measured 16.54 MB at a 384² canvas for
    the viscous kernel (≈ 28 canvas-equivalents: inputs + loop-carry double
    buffers + hoisted invariants + in-body temporaries); the VE coefficient
    canvases (cc 7 + vc 3 minus the dropped η/η_v hoists) raise it to ~34.
    Canvas dims are padded to the (8, 128) f32 tile."""
    a = -((nx + 2) // -8) * 8
    b = -((ny + 2) // -128) * 128
    return 34 * a * b * itemsize


def _sm1(A, ax):
    """B[i] = A[i+1] (wraps at the end; wrapped slots are always masked)."""
    return jnp.roll(A, -1, axis=ax)


def _sp1(A, ax):
    """B[i] = A[i-1]."""
    return jnp.roll(A, 1, axis=ax)


def _band(shape, axis, lo, hi, offset=0):
    i = lax.broadcasted_iota(jnp.int32, shape, axis) + offset
    return (i >= lo) & (i <= hi)


# coefficient-stack slot order shared by both kernels (see _ve_coefficients)
_CC = ("c1", "c2", "c3", "a_c", "b_c", "dxx_c", "dyy_c")
_VC = ("a_v", "b_v", "dxy_v")


def _ve_iteration(carry, co, *, nx, ny, inv_dx, inv_dy, free_slip, x_off=0):
    """One fused VE PT iteration on collocated canvases (shared by the
    VMEM-resident and the grid-blocked kernels).

    ``co`` holds the chunk-invariant canvases: the 7+3 pressure/stress
    coefficients (:func:`_ve_coefficients`), the folded damped-update
    reciprocals ``inv_etax``/``inv_etay`` and the face forces ``gxf``/``gyf``.
    ``x_off`` maps local canvas rows to global rows (a traced scalar in the
    blocked kernel, 0 in the resident one); all axis-0 ownership bands are
    evaluated in global coordinates so a window sees exactly the updates the
    full-canvas kernel would apply."""
    Vx, Vy, P, txx, tyy, txy = carry
    shape = P.shape
    third = 1.0 / 3.0

    def xband(lo, hi):
        return _band(shape, 0, lo, hi, offset=x_off)

    def yband(lo, hi):
        return _band(shape, 1, lo, hi)

    # freeze masks, recomputed per iteration: iota+compare is ~free on the
    # VPU and keeps them out of the persistent VMEM working set (measured:
    # hoisted masks push 382² past the default 16 MB scoped-vmem limit).
    Mc = xband(1, nx) & yband(1, ny)            # cells
    Mv = xband(1, nx - 1) & yband(1, ny - 1)    # interior vertices
    MVx = xband(1, nx - 1) & yband(1, ny)       # interior x-faces
    MVy = xband(1, nx) & yband(1, ny - 1)       # interior y-faces

    # divergence + compressible VE pressure (coefficient form)
    dVxdx = (Vx - _sp1(Vx, 0)) * inv_dx
    dVydy = (Vy - _sp1(Vy, 1)) * inv_dy
    grad_V = dVxdx + dVydy
    P = jnp.where(Mc, P * co["c1"] + co["c2"] - grad_V * co["c3"], P)

    # deviatoric strain rates + VE PT stress update (cells)
    exx = dVxdx - grad_V * third
    eyy = dVydy - grad_V * third
    txx = jnp.where(Mc, co["a_c"] * txx + co["b_c"] * exx + co["dxx_c"], txx)
    tyy = jnp.where(Mc, co["a_c"] * tyy + co["b_c"] * eyy + co["dyy_c"], tyy)

    # shear strain rate + stress at interior vertices
    exy = 0.5 * (
        (_sm1(Vx, 1) - Vx) * inv_dy + (_sm1(Vy, 0) - Vy) * inv_dx
    )
    txy = jnp.where(Mv, co["a_v"] * txy + co["b_v"] * exy + co["dxy_v"], txy)

    # damped velocity update on interior faces
    rx = (
        (_sm1(txx, 0) - txx) * inv_dx
        + (txy - _sp1(txy, 1)) * inv_dy
        - (_sm1(P, 0) - P) * inv_dx
        - co["gxf"]
    )
    Vx = jnp.where(MVx, Vx + rx * co["inv_etax"], Vx)
    ry = (
        (_sm1(tyy, 1) - tyy) * inv_dy
        + (txy - _sp1(txy, 0)) * inv_dx
        - (_sm1(P, 1) - P) * inv_dy
        - co["gyf"]
    )
    Vy = jnp.where(MVy, Vy + ry * co["inv_etay"], Vy)

    if free_slip:
        # tangential ghost mirrors
        gxl = yband(0, 0) & xband(0, nx)          # Vx ghost col
        gxr = yband(ny + 1, ny + 1) & xband(0, nx)
        gyl = xband(0, 0) & yband(0, ny)          # Vy ghost row
        gyr = xband(nx + 1, nx + 1) & yband(0, ny)
        Vx = jnp.where(gxl, _sm1(Vx, 1), Vx)
        Vx = jnp.where(gxr, _sp1(Vx, 1), Vx)
        Vy = jnp.where(gyl, _sm1(Vy, 0), Vy)
        Vy = jnp.where(gyr, _sp1(Vy, 0), Vy)
    return Vx, Vy, P, txx, tyy, txy


def _kernel(Vx_ref, Vy_ref, P_ref, txx_ref, tyy_ref, txy_ref,
            cc_ref, vc_ref, etat_ref, gx_ref, gy_ref, scal_ref, nit_ref,
            Vx_o, Vy_o, P_o, txx_o, tyy_o, txy_o,
            *, nx, ny, free_slip):
    etat = etat_ref[:]
    # VE/compressible physics arrives as chunk-invariant COEFFICIENT
    # canvases (precomputed host-side once per chunk; see stokes_chunk_vmem):
    #   P   <- P*c1 + c2 - grad_V*c3
    #   tau <- a*tau + b*eps + d        (d folds eta*_Gdt*tau_o)
    # The viscous incompressible limit reduces to c1=1, c2=0, c3=psi,
    # a=1-dtau_r, b=2*eta*dtau_r, d=0 — one kernel serves every limit.
    co = {k: cc_ref[i] for i, k in enumerate(_CC)}
    co.update({k: vc_ref[i] for i, k in enumerate(_VC)})
    # PT scalars arrive via SMEM so one compiled kernel serves any chunk
    # length and traced PTStokesCoeffs (solve_ve is jitted over them).
    inv_dx = scal_ref[0]
    inv_dy = scal_ref[1]
    etadtau = scal_ref[2]
    nout = nit_ref[0]

    # -- static per-chunk quantities -------------------------------------
    # VMEM budget note: every hoisted full-canvas value is live for the whole
    # loop. Only genuinely expensive invariants are hoisted (the two damped-
    # update reciprocals — the divide would otherwise run per iteration —
    # and the face forces).
    # face-averaged maxloc preconditioner, folded with ηdτ (divide hoisted)
    co["inv_etax"] = etadtau / (0.5 * (etat + _sm1(etat, 0)))
    co["inv_etay"] = etadtau / (0.5 * (etat + _sm1(etat, 1)))
    co["gxf"] = 0.5 * (gx_ref[:] + _sm1(gx_ref[:], 0))
    co["gyf"] = 0.5 * (gy_ref[:] + _sm1(gy_ref[:], 1))

    def body(_, carry):
        return _ve_iteration(
            carry, co, nx=nx, ny=ny, inv_dx=inv_dx, inv_dy=inv_dy,
            free_slip=free_slip,
        )

    out = lax.fori_loop(
        0, nout, body,
        (Vx_ref[:], Vy_ref[:], P_ref[:], txx_ref[:], tyy_ref[:], txy_ref[:]),
    )
    Vx_o[:], Vy_o[:], P_o[:], txx_o[:], tyy_o[:], txy_o[:] = out


def _ve_coefficients(nx, ny, dtype, eta, eta_tau, r, theta_dtau,
                     G=None, K=None, P0=None, Q=None, tau_o=None, dt=None):
    """Chunk-invariant coefficient canvases of the VE PT iteration
    (serial formula references: ops/stokes.py compute_P / compute_tau_ve).

    Returns the stacked cell-coefficient canvas ``cc`` (7, nx+2, ny+2) and
    vertex-coefficient canvas ``vc`` (3, ...) in the `_CC`/`_VC` slot order.
    Omitted physics (``G``/``K`` ∞, zero sources/elastic memory) reproduces
    the viscous incompressible limit exactly.
    """
    def cell(A, mode="constant"):
        return jnp.pad(A, ((1, 1), (1, 1)), mode=mode)

    if dt is None:
        dt = jnp.inf
    inf_c = jnp.full((nx, ny), jnp.inf, dtype)
    zero_c = jnp.zeros((nx, ny), dtype)
    G = inf_c if G is None else G
    K = inf_c if K is None else K
    P0 = zero_c if P0 is None else P0
    Q = zero_c if Q is None else Q
    if tau_o is None:
        tau_o = (zero_c, zero_c, jnp.zeros((nx + 1, ny + 1), dtype))
    txx_o, tyy_o, txy_o = tau_o

    _Gdt = 1.0 / (G * dt)   # ∞ → 0
    _Kdt = 1.0 / (K * dt)
    inv_dt = jnp.where(jnp.isinf(dt), 0.0, 1.0 / dt)
    psi = 1.0 / (1.0 / eta_tau + _Gdt) * (r / theta_dtau)
    c1 = 1.0 / (1.0 + _Kdt * psi)
    c2 = (P0 * _Kdt + Q * inv_dt) * psi * c1
    c3 = psi * c1
    dtau_r_c = 1.0 / (theta_dtau + eta * _Gdt + 1.0)
    a_c = 1.0 - dtau_r_c * (1.0 + eta * _Gdt)
    b_c = 2.0 * eta * dtau_r_c
    coef_c = dtau_r_c * eta * _Gdt
    cc = jnp.stack([
        cell(c1, "edge"), cell(c2), cell(c3, "edge"),
        cell(a_c, "edge"), cell(b_c, "edge"),
        cell(coef_c * txx_o), cell(coef_c * tyy_o),
    ])
    # interior vertices: arithmetic averages exactly as the serial kernel
    # (compute_tau_ve: av_a(eta), 1/(av_a(G)·dt))
    eta_vi = av_a(eta)
    _Gdt_vi = 1.0 / (av_a(G) * dt)
    dtau_r_v = 1.0 / (theta_dtau + eta_vi * _Gdt_vi + 1.0)
    a_vi = 1.0 - dtau_r_v * (1.0 + eta_vi * _Gdt_vi)
    b_vi = 2.0 * eta_vi * dtau_r_v
    dxy_vi = dtau_r_v * eta_vi * _Gdt_vi * txy_o[1:-1, 1:-1]

    def vert(A):
        # interior vertices (i, j = 1..n-1) sit at canvas (a=i, b=j)
        return jnp.pad(A, ((1, 2), (1, 2)))

    vc = jnp.stack([vert(a_vi), vert(b_vi), vert(dxy_vi)])
    return cc.astype(dtype), vc.astype(dtype)


def stokes_chunk_vmem(
    Vx, Vy, P, txx, tyy, txy, eta, eta_tau, rho_gx, rho_gy,
    inv_dx: float, inv_dy: float, r: float, theta_dtau: float, etadtau: float,
    nout: int = 100, free_slip: bool = True, interpret: bool = False,
    G=None, K=None, P0=None, Q=None, tau_o=None, dt=None,
):
    """Run ``nout`` APT iterations fully inside VMEM.

    Takes/returns the solver's staggered arrays (Vx (nx+1, ny+2),
    Vy (nx+2, ny+1), cell fields (nx, ny), τxy (nx+1, ny+1)); embedding into
    the common canvas happens here (host-side XLA pads, which are cheap and
    outside the hot loop).

    Physics beyond the viscous incompressible limit enters through the
    optional ``G``/``K`` (cell moduli, ∞ allowed), ``P0``/``Q`` (pressure
    sources), ``tau_o`` ((τxx_o, τyy_o, τxy_o) elastic memory) and ``dt``:
    the per-iteration updates are algebraically refactored into
    chunk-invariant coefficient canvases (see _kernel) computed here once
    per chunk, so the VE/compressible path costs the kernel nothing extra
    per iteration. Omitting them reproduces the viscous limit exactly.
    """
    nx, ny = P.shape
    shape = (nx + 2, ny + 2)

    def cell(A, mode="constant"):
        return jnp.pad(A, ((1, 1), (1, 1)), mode=mode)

    dtype = P.dtype
    cc, vc = _ve_coefficients(
        nx, ny, dtype, eta, eta_tau, r, theta_dtau,
        G=G, K=K, P0=P0, Q=Q, tau_o=tau_o, dt=dt,
    )

    scal = jnp.stack([
        jnp.asarray(v, dtype) for v in (inv_dx, inv_dy, etadtau)
    ])
    nit = jnp.asarray(nout, jnp.int32).reshape(1)
    canv = (
        jnp.pad(Vx, ((0, 1), (0, 0))),          # faces 0..nx at a=0..nx
        jnp.pad(Vy, ((0, 0), (0, 1))),
        cell(P), cell(txx), cell(tyy),
        jnp.pad(txy, ((0, 1), (0, 1))),         # vertices at (i, j)
        cc.astype(dtype), vc.astype(dtype),
        cell(eta_tau, "edge"),
        cell(rho_gx, "edge"), cell(rho_gy, "edge"),
    )

    kern = partial(_kernel, nx=nx, ny=ny, free_slip=free_slip)
    out_shape = tuple(jax.ShapeDtypeStruct(shape, dtype) for _ in range(6))
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    # raise the scoped-VMEM budget above the conservative 16 MB default:
    # this kernel is a single unpipelined block (no grid double-buffering),
    # so the whole physical VMEM is available to the working set + Mosaic's
    # stack temporaries (measured: ~28 canvas-equivalents live at 384²,
    # ~34 with the VE coefficient canvases).
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    o = pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=[vspec] * 11 + [sspec, sspec],
        out_specs=(vspec,) * 6,
        input_output_aliases={i: i for i in range(6)},
        compiler_params=params,
        interpret=interpret,
    )(*canv, scal, nit)
    return (
        o[0][:-1, :], o[1][:, :-1], o[2][1:-1, 1:-1], o[3][1:-1, 1:-1],
        o[4][1:-1, 1:-1], o[5][:-1, :-1],
    )


# ===========================================================================
# Grid-blocked temporally-blocked chunk kernel (HBM-resident grids)
# ===========================================================================
#
# For grids past VMEM residency (~820² f32), the chunk is strip-mined over
# row-blocks with TEMPORAL blocking: each pass advances the whole grid by
# ``k`` iterations, and each block loads a (R + 4k)-row window, runs the k
# iterations on it in VMEM, and stores only its R owned rows. The stencil
# chain V ← τ ← ε ← V has x-radius 2 per iteration, so a 2k-row halo per
# side guarantees the owned rows equal the full-canvas result exactly
# (window-edge rows go stale at 2 rows/iteration — redundant compute, ~W/R
# overhead). HBM traffic per iteration drops from ~2×carry+consts (the XLA
# streaming path) to (20·W/R + 6)/k canvases — ~4 canvas-equivalents at
# k=8 — and the per-block DMA is double-buffered behind the previous
# block's compute (scratch persists across sequential grid steps).

_BLK = _CC + _VC + ("inv_etax", "inv_etay", "gxf", "gyf")
_N_CARRY = 6


def choose_blocking(nx, ny, itemsize=4, row_block=None, iters_per_pass=None,
                    budget=86 * 1024 * 1024, n_slots=2):
    """Pick (R, k, n_blocks, A_pad, W) for the blocked chunk kernel.

    R = owned rows per block (multiple of 8, sized so ceil sharing wastes <8
    rows/block), k = iterations per pass (halo H = 2k), W = R + 2H window
    rows. The VMEM model counts the double-buffered scratch windows
    (n_slots·20·W), the pipelined output buffer (12·R) and ~28 in-flight
    value canvases of W rows. Returns None if no configuration fits."""
    A = nx + 2
    b_pad = -((ny + 2) // -128) * 128
    # default k keeps H = 2k a multiple of 8 so the dynamic window start is
    # provably sublane-tile aligned (explicit iters_per_pass may break this —
    # interpret-mode tests only)
    ks = [iters_per_pass] if iters_per_pass else [8, 4]
    r_targets = [row_block] if row_block else [512, 384, 256, 192, 128, 96, 64, 48, 32]
    for k in ks:
        H = 2 * k
        for r_t in r_targets:
            if r_t < 2 * H:
                continue
            n_blocks = -(A // -r_t)
            if n_blocks < 2:
                continue
            R = -((-(A // -n_blocks)) // -8) * 8
            if R < 2 * H:
                continue
            A_pad = R * n_blocks
            W = R + 2 * H
            if A_pad < W:
                continue
            vmem = (
                n_slots * (len(_BLK) + _N_CARRY) * W + 12 * R + 28 * W
            ) * b_pad * itemsize
            if vmem <= budget:
                return R, k, n_blocks, A_pad, W
    return None


def _blocked_kernel(scal_ref, nit_ref, carry_hbm, const_hbm, out_ref,
                    scr_c, scr_k, sem_c, sem_k,
                    *, nx, ny, R, H, W, A_pad, n_blocks, n_slots,
                    free_slip, pipeline):
    i = pl.program_id(0)
    inv_dx = scal_ref[0]
    inv_dy = scal_ref[1]
    k_act = nit_ref[0]

    def wstart(b):
        # every reachable value (0, b·R−H, A_pad−W) is a multiple of
        # gcd(R, H); Mosaic must prove sublane-tile (8) alignment of the
        # dynamic HBM slice start, which choose_blocking guarantees by
        # keeping H a multiple of 8
        import math as _math

        return pl.multiple_of(
            jnp.clip(b * R - H, 0, A_pad - W), _math.gcd(R, H)
        )

    def dma_c(slot, b):
        return pltpu.make_async_copy(
            carry_hbm.at[:, pl.ds(wstart(b), W)], scr_c.at[slot], sem_c.at[slot]
        )

    def dma_k(slot, b):
        return pltpu.make_async_copy(
            const_hbm.at[:, pl.ds(wstart(b), W)], scr_k.at[slot], sem_k.at[slot]
        )

    if pipeline:
        # scratch persists across the sequential grid steps: block i+1's
        # window DMAs while block i computes (double-buffered slots)
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
    co = {name: scr_k[slot, j] for j, name in enumerate(_BLK)}

    def body(_, c):
        return _ve_iteration(
            c, co, nx=nx, ny=ny, inv_dx=inv_dx, inv_dy=inv_dy,
            free_slip=free_slip, x_off=start,
        )

    out = lax.fori_loop(0, k_act, body, carry)

    # off = R·i − start ∈ {0, H, 2H} (first block / interior / window clamp
    # at the top). Mosaic has no in-register dynamic_slice — store via
    # predicated static slices.
    off = i * R - start
    for o_val in (0, H, 2 * H):
        @pl.when(off == o_val)
        def _(out=out, o_val=o_val):
            for j in range(_N_CARRY):
                out_ref[j] = out[j][o_val:o_val + R]


def stokes_chunk_blocked(
    Vx, Vy, P, txx, tyy, txy, eta, eta_tau, rho_gx, rho_gy,
    inv_dx: float, inv_dy: float, r: float, theta_dtau: float, etadtau: float,
    nout: int = 100, free_slip: bool = True, interpret: bool = False,
    G=None, K=None, P0=None, Q=None, tau_o=None, dt=None,
    row_block=None, iters_per_pass=None, pipeline: bool = True,
):
    """Run ``nout`` APT iterations via temporally-blocked row streaming.

    Same contract and physics coverage as :func:`stokes_chunk_vmem` (the
    VE/compressible coefficient form, free-slip BCs), for grids whose
    working set exceeds VMEM. ``nout`` may be traced; passes of
    ``iters_per_pass`` (default 8) iterations each stream the grid through
    VMEM until ``nout`` iterations have been applied (the final pass runs
    the remainder). ``pipeline=False`` disables the cross-block DMA
    double-buffering (used by interpret-mode tests, where scratch
    persistence across grid steps is not guaranteed).
    """
    nx, ny = P.shape
    dtype = P.dtype
    itemsize = jnp.dtype(dtype).itemsize
    blocking = choose_blocking(nx, ny, itemsize, row_block, iters_per_pass)
    if blocking is None:
        raise ValueError(f"no blocked configuration fits VMEM for {nx}x{ny}")
    R, k, n_blocks, A_pad, W = blocking
    H = 2 * k
    A, B = nx + 2, ny + 2
    # Mosaic requires HBM DMA slices tile-aligned on the minor dim: pad the
    # canvas columns to the 128-lane tile (pad columns are excluded from
    # every ownership band and stay zero)
    B_pad = -(B // -128) * 128

    def cell(X, mode="constant"):
        return jnp.pad(X, ((1, 1), (1, 1)), mode=mode)

    cc, vc = _ve_coefficients(
        nx, ny, dtype, eta, eta_tau, r, theta_dtau,
        G=G, K=K, P0=P0, Q=Q, tau_o=tau_o, dt=dt,
    )
    # the damped-update reciprocals and face forces the resident kernel
    # hoists in-kernel are chunk-invariant — precompute them as canvases
    etat_c = cell(eta_tau, "edge")
    gxc = cell(rho_gx, "edge")
    gyc = cell(rho_gy, "edge")
    inv_etax = etadtau / (0.5 * (etat_c + jnp.roll(etat_c, -1, 0)))
    inv_etay = etadtau / (0.5 * (etat_c + jnp.roll(etat_c, -1, 1)))
    gxf = 0.5 * (gxc + jnp.roll(gxc, -1, 0))
    gyf = 0.5 * (gyc + jnp.roll(gyc, -1, 1))
    const = jnp.concatenate(
        [cc, vc, jnp.stack([inv_etax, inv_etay, gxf, gyf]).astype(dtype)]
    )
    const = jnp.pad(const, ((0, 0), (0, A_pad - A), (0, B_pad - B)))

    carry0 = jnp.stack([
        jnp.pad(Vx, ((0, 1), (0, 0))),
        jnp.pad(Vy, ((0, 0), (0, 1))),
        cell(P), cell(txx), cell(tyy),
        jnp.pad(txy, ((0, 1), (0, 1))),
    ])
    carry0 = jnp.pad(carry0, ((0, 0), (0, A_pad - A), (0, B_pad - B)))

    scal = jnp.stack([jnp.asarray(v, dtype) for v in (inv_dx, inv_dy)])
    kern = partial(
        _blocked_kernel, nx=nx, ny=ny, R=R, H=H, W=W, A_pad=A_pad,
        n_blocks=n_blocks, n_slots=2 if pipeline else 1,
        free_slip=free_slip, pipeline=pipeline,
    )
    n_slots = 2 if pipeline else 1
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
                (_N_CARRY, R, B_pad), lambda i, *_: (0, i, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((n_slots, _N_CARRY, W, B_pad), dtype),
                pltpu.VMEM((n_slots, len(_BLK), W, B_pad), dtype),
                pltpu.SemaphoreType.DMA((n_slots,)),
                pltpu.SemaphoreType.DMA((n_slots,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((_N_CARRY, A_pad, B_pad), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    nout = jnp.asarray(nout, jnp.int32)
    n_pass = (nout + k - 1) // k

    def one_pass(p, cs):
        k_act = jnp.minimum(k, nout - p * k).astype(jnp.int32)
        return call(scal, k_act.reshape(1), cs, const)

    o = lax.fori_loop(0, n_pass, one_pass, carry0)
    o = o[:, :A, :B]
    return (
        o[0][:-1, :], o[1][:, :-1], o[2][1:-1, 1:-1],
        o[3][1:-1, 1:-1], o[4][1:-1, 1:-1], o[5][:-1, :-1],
    )
