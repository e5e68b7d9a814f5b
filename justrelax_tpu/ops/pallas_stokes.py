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

__all__ = ["stokes_chunk_vmem", "vmem_bytes_needed"]


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


def _band(shape, axis, lo, hi):
    i = lax.broadcasted_iota(jnp.int32, shape, axis)
    return (i >= lo) & (i <= hi)


def _kernel(Vx_ref, Vy_ref, P_ref, txx_ref, tyy_ref, txy_ref,
            cc_ref, vc_ref, etat_ref, gx_ref, gy_ref, scal_ref, nit_ref,
            Vx_o, Vy_o, P_o, txx_o, tyy_o, txy_o,
            *, nx, ny, free_slip):
    shape = P_ref.shape
    etat = etat_ref[:]
    # VE/compressible physics arrives as chunk-invariant COEFFICIENT
    # canvases (precomputed host-side once per chunk; see stokes_chunk_vmem):
    #   P   <- P*c1 + c2 - grad_V*c3
    #   tau <- a*tau + b*eps + d        (d folds eta*_Gdt*tau_o)
    # The viscous incompressible limit reduces to c1=1, c2=0, c3=psi,
    # a=1-dtau_r, b=2*eta*dtau_r, d=0 — one kernel serves every limit.
    c1, c2, c3 = cc_ref[0], cc_ref[1], cc_ref[2]
    a_c, b_c, dxx_c, dyy_c = cc_ref[3], cc_ref[4], cc_ref[5], cc_ref[6]
    a_v, b_v, dxy_v = vc_ref[0], vc_ref[1], vc_ref[2]
    third = 1.0 / 3.0
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
    # and the face forces); the freeze masks are recomputed in-loop from
    # iota+compare, which is ~free on the VPU and keeps them out of the
    # persistent working set (measured: hoisted masks push 382² past the
    # default 16 MB scoped-vmem limit).
    # face-averaged maxloc preconditioner, folded with ηdτ (divide hoisted)
    inv_etax = etadtau / (0.5 * (etat + _sm1(etat, 0)))
    inv_etay = etadtau / (0.5 * (etat + _sm1(etat, 1)))
    gxf = 0.5 * (gx_ref[:] + _sm1(gx_ref[:], 0))
    gyf = 0.5 * (gy_ref[:] + _sm1(gy_ref[:], 1))

    def body(_, carry):
        Vx, Vy, P, txx, tyy, txy = carry
        # freeze masks, recomputed per iteration (see budget note above)
        Mc = _band(shape, 0, 1, nx) & _band(shape, 1, 1, ny)          # cells
        Mv = _band(shape, 0, 1, nx - 1) & _band(shape, 1, 1, ny - 1)  # int. vertices
        MVx = _band(shape, 0, 1, nx - 1) & _band(shape, 1, 1, ny)     # int. x-faces
        MVy = _band(shape, 0, 1, nx) & _band(shape, 1, 1, ny - 1)     # int. y-faces

        # divergence + compressible VE pressure (coefficient form)
        dVxdx = (Vx - _sp1(Vx, 0)) * inv_dx
        dVydy = (Vy - _sp1(Vy, 1)) * inv_dy
        grad_V = dVxdx + dVydy
        P = jnp.where(Mc, P * c1 + c2 - grad_V * c3, P)

        # deviatoric strain rates + VE PT stress update (cells)
        exx = dVxdx - grad_V * third
        eyy = dVydy - grad_V * third
        txx = jnp.where(Mc, a_c * txx + b_c * exx + dxx_c, txx)
        tyy = jnp.where(Mc, a_c * tyy + b_c * eyy + dyy_c, tyy)

        # shear strain rate + stress at interior vertices
        exy = 0.5 * (
            (_sm1(Vx, 1) - Vx) * inv_dy + (_sm1(Vy, 0) - Vy) * inv_dx
        )
        txy = jnp.where(Mv, a_v * txy + b_v * exy + dxy_v, txy)

        # damped velocity update on interior faces
        rx = (
            (_sm1(txx, 0) - txx) * inv_dx
            + (txy - _sp1(txy, 1)) * inv_dy
            - (_sm1(P, 0) - P) * inv_dx
            - gxf
        )
        Vx = jnp.where(MVx, Vx + rx * inv_etax, Vx)
        ry = (
            (_sm1(tyy, 1) - tyy) * inv_dy
            + (txy - _sp1(txy, 0)) * inv_dx
            - (_sm1(P, 1) - P) * inv_dy
            - gyf
        )
        Vy = jnp.where(MVy, Vy + ry * inv_etay, Vy)

        if free_slip:
            # tangential ghost mirrors
            gxl = _band(shape, 1, 0, 0) & _band(shape, 0, 0, nx)  # Vx ghost col
            gxr = _band(shape, 1, ny + 1, ny + 1) & _band(shape, 0, 0, nx)
            gyl = _band(shape, 0, 0, 0) & _band(shape, 1, 0, ny)  # Vy ghost row
            gyr = _band(shape, 0, nx + 1, nx + 1) & _band(shape, 1, 0, ny)
            Vx = jnp.where(gxl, _sm1(Vx, 1), Vx)
            Vx = jnp.where(gxr, _sp1(Vx, 1), Vx)
            Vy = jnp.where(gyl, _sm1(Vy, 0), Vy)
            Vy = jnp.where(gyr, _sp1(Vy, 0), Vy)
        return Vx, Vy, P, txx, tyy, txy

    out = lax.fori_loop(
        0, nout, body,
        (Vx_ref[:], Vy_ref[:], P_ref[:], txx_ref[:], tyy_ref[:], txy_ref[:]),
    )
    Vx_o[:], Vy_o[:], P_o[:], txx_o[:], tyy_o[:], txy_o[:] = out


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

    # --- chunk-invariant coefficient canvases (serial formula references:
    # ops/stokes.py compute_P / compute_tau_ve) ---------------------------
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
