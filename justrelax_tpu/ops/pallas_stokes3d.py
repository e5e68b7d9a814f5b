"""Pallas TPU kernel: strip-mined fused 3D APT Stokes iteration (viscous limit).

Motivation (measured on v5e, 126³): the XLA path's while-body materializes
~46 intermediate arrays (HLO analysis: 331 MB of writes/iteration vs ~80 MB
of necessary carry writes), so although the chip runs at wire speed the
*algorithmic* traffic is ~4× the Räss-convention necessity and T_eff lands
at 0.44× HBM peak. A 126³ working set (20 arrays ≈ 160 MB) cannot be
VMEM-resident like the 2D chunk kernel (ops/pallas_stokes.py), so this
kernel strip-mines ONE fused PT iteration over x-slabs:

- the whole iteration (∇·V → P → ε → τ → V → free-slip BCs) for a slab of
  ``B`` x-planes runs in VMEM; τ and P are computed redundantly on one halo
  plane each side so the velocity update needs no second pass;
- inputs stay in HBM (``memory_space=ANY``); each grid step manually DMAs
  the ``B+4``-plane window (stencil chain V←τ←ε←V has radius 2) into VMEM
  scratch — the only HBM traffic is the carry (R+W) and the read-only
  fields, ×(B+4)/B for the halo overlap;
- carry fields travel as ONE stacked canvas array (10, X, Y, Z) whose
  layout is identical for input and output, so successive iterations chain
  with zero re-packing;
- in-kernel neighbor access uses the collocated-canvas roll+iota-mask form
  proven on the v5e Mosaic toolchain by the 2D chunk kernel (no concats, no
  in-kernel pads).

Canvas collocation ((a,b,c) canvas indices; nx×ny×nz cells):
  cell (i,j,k)        -> (i+1, j+1, k+1)   P, τxx, τyy, τzz, η, ητ, f
  Vx face i           -> a=i   (b=j+1, c=k+1; transverse ghosts included)
  Vy face j           -> b=j   (a=i+1, c=k+1)
  Vz face k           -> c=k   (a=i+1, b=j+1)
  τyz edge (i,j,k)    -> (i+1, j,   k)
  τxz edge (i,j,k)    -> (i,   j+1, k)
  τxy edge (i,j,k)    -> (i,   j,   k+1)

Serial equivalence: one call == compute_grad_V_3d → compute_P →
compute_strain_rate_3d → compute_tau_ve_3d → compute_V_3d → flow_bcs
(free-slip) to roundoff; tests/test_pallas3d.py.

MEASURED OUTCOME (v5e, 126³ f32) — both formulations compile and run on
hardware but LOSE to the XLA twin, which this module therefore does not
replace:

  XLA fused while-body (production path)   619 µs/iter  (wire-speed on its
                                            actual ~450 MB/iter traffic)
  v1 window-value form (this kernel)      1262 µs/iter  (B=8; B=16 slower:
                                            VMEM-pressure/VPU-bound — full
                                            (B+4,Y,Z) values, x-rolls,
                                            full-window masks)
  v2 plane-revolving form                 4110 µs/iter  (B=8; 2609 at B=16:
                                            128×128 plane ops are too small
                                            to feed the VPU, and per-plane
                                            scr_new round-trips defeat
                                            register caching)

The HBM-traffic saving (~2×) is real but the VPU cost of the mask/roll
canvas (v1) or the short-op pipeline (v2) exceeds it — the 3D iteration at
this size is not memory-bound enough to profit, unlike the 2D VMEM-chunk
kernel (ops/pallas_stokes.py, 2.9× HBM peak) where a whole nout-chunk stays
resident. Kept as tested experimental paths and as the measurement record.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = Any

__all__ = ["stokes3d_iteration_strips", "CARRY_FIELDS"]

# stacked-carry slot order
CARRY_FIELDS = ("Vx", "Vy", "Vz", "P", "txx", "tyy", "tzz", "tyz", "txz", "txy")
_CONST_FIELDS = ("eta", "eta_tau", "fx", "fy", "fz")
HALO = 2  # V <- tau <- eps <- V chain radius in x


def _sm1(A, ax):
    return jnp.roll(A, -1, axis=ax)


def _sp1(A, ax):
    return jnp.roll(A, 1, axis=ax)


def _band(shape, axis, lo, hi, offset=0):
    i = lax.broadcasted_iota(jnp.int32, shape, axis) + offset
    return (i >= lo) & (i <= hi)


def _kernel(scal_ref, carry_hbm, const_hbm, out_ref, scr_c, scr_k, sem_c, sem_k,
            *, nx, ny, nz, B, X):
    i = pl.program_id(0)
    start = jnp.clip(B * i - HALO, 0, X - (B + 2 * HALO))
    off = B * i - start  # local index of the slab's first output plane

    cp = pltpu.make_async_copy(
        carry_hbm.at[:, pl.ds(start, B + 2 * HALO)], scr_c, sem_c
    )
    kp = pltpu.make_async_copy(
        const_hbm.at[:, pl.ds(start, B + 2 * HALO)], scr_k, sem_k
    )
    cp.start()
    kp.start()
    cp.wait()
    kp.wait()

    Vx, Vy, Vz = scr_c[0], scr_c[1], scr_c[2]
    P = scr_c[3]
    txx, tyy, tzz = scr_c[4], scr_c[5], scr_c[6]
    tyz, txz, txy = scr_c[7], scr_c[8], scr_c[9]
    eta, etat = scr_k[0], scr_k[1]
    fx, fy, fz = scr_k[2], scr_k[3], scr_k[4]

    shape = P.shape
    inv_dx = scal_ref[0]
    inv_dy = scal_ref[1]
    inv_dz = scal_ref[2]
    r_theta = scal_ref[3]
    theta_dtau = scal_ref[4]
    etadtau = scal_ref[5]
    third = 1.0 / 3.0
    dtau_r = 1.0 / (theta_dtau + 1.0)

    # global-x bands take `start` as the iota offset
    def xband(lo, hi):
        return _band(shape, 0, lo, hi, offset=start)

    def yband(lo, hi):
        return _band(shape, 1, lo, hi)

    def zband(lo, hi):
        return _band(shape, 2, lo, hi)

    # --- masks (global index spaces; see canvas table in module doc) -------
    Mc = xband(1, nx) & yband(1, ny) & zband(1, nz)                   # cells
    Myz = xband(1, nx) & yband(1, ny - 1) & zband(1, nz - 1)          # int yz-edges
    Mxz = xband(1, nx - 1) & yband(1, ny) & zband(1, nz - 1)          # int xz-edges
    Mxy = xband(1, nx - 1) & yband(1, ny - 1) & zband(1, nz)          # int xy-edges
    MVx = xband(1, nx - 1) & yband(1, ny) & zband(1, nz)              # int x-faces
    MVy = xband(1, nx) & yband(1, ny - 1) & zband(1, nz)
    MVz = xband(1, nx) & yband(1, ny) & zband(1, nz - 1)

    # --- divergence + pressure (viscous incompressible: ψ = ητ·r/θ) --------
    dVxdx = (Vx - _sp1(Vx, 0)) * inv_dx
    dVydy = (Vy - _sp1(Vy, 1)) * inv_dy
    dVzdz = (Vz - _sp1(Vz, 2)) * inv_dz
    grad_V = dVxdx + dVydy + dVzdz
    P = jnp.where(Mc, P - grad_V * etat * r_theta, P)

    # --- deviatoric strain + PT stress update ------------------------------
    exx = dVxdx - grad_V * third
    eyy = dVydy - grad_V * third
    ezz = dVzdz - grad_V * third
    txx = jnp.where(Mc, txx + dtau_r * (2.0 * eta * exx - txx), txx)
    tyy = jnp.where(Mc, tyy + dtau_r * (2.0 * eta * eyy - tyy), tyy)
    tzz = jnp.where(Mc, tzz + dtau_r * (2.0 * eta * ezz - tzz), tzz)

    eyz = 0.5 * ((_sm1(Vy, 2) - Vy) * inv_dz + (_sm1(Vz, 1) - Vz) * inv_dy)
    exz = 0.5 * ((_sm1(Vx, 2) - Vx) * inv_dz + (_sm1(Vz, 0) - Vz) * inv_dx)
    exy = 0.5 * ((_sm1(Vx, 1) - Vx) * inv_dy + (_sm1(Vy, 0) - Vy) * inv_dx)

    e_y = 0.5 * (eta + _sm1(eta, 1))
    e_z = 0.5 * (eta + _sm1(eta, 2))
    e_x = 0.5 * (eta + _sm1(eta, 0))
    eta_yz = 0.5 * (e_y + _sm1(e_y, 2))
    eta_xz = 0.5 * (e_x + _sm1(e_x, 2))
    eta_xy = 0.5 * (e_x + _sm1(e_x, 1))
    tyz = jnp.where(Myz, tyz + dtau_r * (2.0 * eta_yz * eyz - tyz), tyz)
    txz = jnp.where(Mxz, txz + dtau_r * (2.0 * eta_xz * exz - txz), txz)
    txy = jnp.where(Mxy, txy + dtau_r * (2.0 * eta_xy * exy - txy), txy)

    # --- damped velocity update on interior faces --------------------------
    inv_ex = etadtau / (0.5 * (etat + _sm1(etat, 0)))
    inv_ey = etadtau / (0.5 * (etat + _sm1(etat, 1)))
    inv_ez = etadtau / (0.5 * (etat + _sm1(etat, 2)))
    rx = (
        (_sm1(txx, 0) - txx) * inv_dx
        + (txy - _sp1(txy, 1)) * inv_dy
        + (txz - _sp1(txz, 2)) * inv_dz
        - (_sm1(P, 0) - P) * inv_dx
        - 0.5 * (fx + _sm1(fx, 0))
    )
    Vx = jnp.where(MVx, Vx + rx * inv_ex, Vx)
    ry = (
        (txy - _sp1(txy, 0)) * inv_dx
        + (_sm1(tyy, 1) - tyy) * inv_dy
        + (tyz - _sp1(tyz, 2)) * inv_dz
        - (_sm1(P, 1) - P) * inv_dy
        - 0.5 * (fy + _sm1(fy, 1))
    )
    Vy = jnp.where(MVy, Vy + ry * inv_ey, Vy)
    rz = (
        (txz - _sp1(txz, 0)) * inv_dx
        + (tyz - _sp1(tyz, 1)) * inv_dy
        + (_sm1(tzz, 2) - tzz) * inv_dz
        - (_sm1(P, 2) - P) * inv_dz
        - 0.5 * (fz + _sm1(fz, 2))
    )
    Vz = jnp.where(MVz, Vz + rz * inv_ez, Vz)

    # --- free-slip tangential mirrors (ops/bc.py order: front, back, top,
    # bot, left, right — serial .at[].set semantics reproduced sequentially)
    front = yband(0, 0)
    back_vx = yband(ny + 1, ny + 1)  # Vx/Vz transverse ghost b = ny+1
    Vx = jnp.where(front, _sm1(Vx, 1), Vx)
    Vz = jnp.where(front, _sm1(Vz, 1), Vz)
    Vx = jnp.where(back_vx, _sp1(Vx, 1), Vx)
    Vz = jnp.where(back_vx, _sp1(Vz, 1), Vz)
    top = zband(0, 0)
    bot = zband(nz + 1, nz + 1)
    Vx = jnp.where(top, _sm1(Vx, 2), Vx)
    Vy = jnp.where(top, _sm1(Vy, 2), Vy)
    Vx = jnp.where(bot, _sp1(Vx, 2), Vx)
    Vy = jnp.where(bot, _sp1(Vy, 2), Vy)
    left = xband(0, 0)
    right = xband(nx + 1, nx + 1)
    Vy = jnp.where(left, _sm1(Vy, 0), Vy)
    Vz = jnp.where(left, _sm1(Vz, 0), Vz)
    Vy = jnp.where(right, _sp1(Vy, 0), Vy)
    Vz = jnp.where(right, _sp1(Vz, 0), Vz)

    # --- write the slab ----------------------------------------------------
    # off = B·i − start ∈ {0, HALO, 2·HALO} (interior slabs: HALO; first/last:
    # 0 / 2·HALO from the window clamp). Mosaic has no in-register
    # dynamic_slice, so store via predicated static slices.
    for j, val in enumerate((Vx, Vy, Vz, P, txx, tyy, tzz, tyz, txz, txy)):
        for o in (0, HALO, 2 * HALO):
            @pl.when(off == o)
            def _(val=val, j=j, o=o):
                out_ref[j] = val[o:o + B]


def _embed(A, pads):
    return jnp.pad(A, pads)


def pack_carry(Vx, Vy, Vz, P, txx, tyy, tzz, tyz, txz, txy):
    """Staggered arrays → stacked carry canvas (10, nx+2, ny+2, nz+2)."""
    return jnp.stack([
        _embed(Vx, ((0, 1), (0, 0), (0, 0))),
        _embed(Vy, ((0, 0), (0, 1), (0, 0))),
        _embed(Vz, ((0, 0), (0, 0), (0, 1))),
        _embed(P, ((1, 1), (1, 1), (1, 1))),
        _embed(txx, ((1, 1), (1, 1), (1, 1))),
        _embed(tyy, ((1, 1), (1, 1), (1, 1))),
        _embed(tzz, ((1, 1), (1, 1), (1, 1))),
        _embed(tyz, ((1, 1), (0, 1), (0, 1))),
        _embed(txz, ((0, 1), (1, 1), (0, 1))),
        _embed(txy, ((0, 1), (0, 1), (1, 1))),
    ])


def unpack_carry(C, nx, ny, nz):
    """Inverse of :func:`pack_carry`."""
    return (
        C[0][:-1, :, :],                # Vx (nx+1, ny+2, nz+2)
        C[1][:, :-1, :],                # Vy
        C[2][:, :, :-1],                # Vz
        C[3][1:-1, 1:-1, 1:-1],         # P
        C[4][1:-1, 1:-1, 1:-1],
        C[5][1:-1, 1:-1, 1:-1],
        C[6][1:-1, 1:-1, 1:-1],
        C[7][1:-1, :-1, :-1],           # tyz (nx, ny+1, nz+1)
        C[8][:-1, 1:-1, :-1],           # txz
        C[9][:-1, :-1, 1:-1],           # txy
    )


def pack_consts(eta, eta_tau, fx, fy, fz):
    p1 = ((1, 1), (1, 1), (1, 1))
    return jnp.stack([
        jnp.pad(eta, p1, mode="edge"), jnp.pad(eta_tau, p1, mode="edge"),
        jnp.pad(fx, p1, mode="edge"), jnp.pad(fy, p1, mode="edge"),
        jnp.pad(fz, p1, mode="edge"),
    ])


def stokes3d_iteration_strips(
    carry: Array,
    const: Array,
    inv_di: Tuple[float, float, float],
    r: float,
    theta_dtau: float,
    etadtau: float,
    B: int = 8,
    interpret: bool = False,
) -> Array:
    """One fused viscous APT iteration on the stacked canvases.

    ``carry`` is the (10, nx+2, ny+2, nz+2) stacked canvas of
    :func:`pack_carry`; ``const`` the (5, ...) canvas of
    :func:`pack_consts`. Returns the updated carry canvas (same layout, so
    calls chain under ``lax.fori_loop`` with no repacking). Free-slip BCs on
    all six faces are applied in-kernel.

    ``(nx+2) % B == 0`` is required (slab decomposition of the canvas).
    """
    _, X, Y, Z = carry.shape
    nx, ny, nz = X - 2, Y - 2, Z - 2
    if X % B:
        raise ValueError(f"canvas x-dim {X} not divisible by slab size {B}")
    dtype = carry.dtype
    scal = jnp.stack([
        jnp.asarray(v, dtype)
        for v in (inv_di[0], inv_di[1], inv_di[2], r / theta_dtau,
                  theta_dtau, etadtau)
    ])
    kern = partial(_kernel, nx=nx, ny=ny, nz=nz, B=B, X=X)
    grid = (X // B,)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((10, B, Y, Z), lambda i, *_: (0, i, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((10, B + 2 * HALO, Y, Z), dtype),
                pltpu.VMEM((5, B + 2 * HALO, Y, Z), dtype),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((10, X, Y, Z), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(scal, carry, const)
    return out


# ---------------------------------------------------------------------------
# v2: plane-revolving formulation
# ---------------------------------------------------------------------------
def _kernel_planes(scal_ref, carry_hbm, const_hbm, out_ref,
                   scr_in, scr_k, scr_new, sem_c, sem_k,
                   *, nx, ny, nz, B, X):
    """Plane-revolving variant of :func:`_kernel`.

    The window-value form (v1) loads whole (B+4, Y, Z) values and shifts
    them with axis-0 rolls — measured VPU/VMEM-pressure-bound on v5e
    (1.26 ms/iter at 126³, and B=16 SLOWER than B=8). Here every op is a 2D
    (Y, Z) plane op: x-neighbors are *plane indices* (free), only y/z rolls
    remain, and the per-plane working set is a few vreg tiles. The plane
    loops are statically unrolled (B+2 iterations) — all ref indices static;
    the only dynamic indexing is the final windowed load, which refs
    support.
    """
    i = pl.program_id(0)
    start = jnp.clip(B * i - HALO, 0, X - (B + 2 * HALO))
    off = B * i - start

    cp = pltpu.make_async_copy(
        carry_hbm.at[:, pl.ds(start, B + 2 * HALO)], scr_in, sem_c
    )
    kp = pltpu.make_async_copy(
        const_hbm.at[:, pl.ds(start, B + 2 * HALO)], scr_k, sem_k
    )
    cp.start()
    kp.start()
    cp.wait()
    kp.wait()

    inv_dx = scal_ref[0]
    inv_dy = scal_ref[1]
    inv_dz = scal_ref[2]
    r_theta = scal_ref[3]
    theta_dtau = scal_ref[4]
    etadtau = scal_ref[5]
    third = 1.0 / 3.0
    dtau_r = 1.0 / (theta_dtau + 1.0)

    pshape = (scr_in.shape[2], scr_in.shape[3])  # (Y, Z) plane

    def yb(lo, hi):
        return _band(pshape, 0, lo, hi)

    def zb(lo, hi):
        return _band(pshape, 1, lo, hi)

    # plane-invariant 2D masks (y/z parts); x parts are scalar predicates
    yz_cell = yb(1, ny) & zb(1, nz)
    m_yz_e = yb(1, ny - 1) & zb(1, nz - 1)
    m_xz_e = yb(1, ny) & zb(1, nz - 1)
    m_xy_e = yb(1, ny - 1) & zb(1, nz)
    m_vy = yb(1, ny - 1) & zb(1, nz)
    m_vz = yb(1, ny) & zb(1, nz - 1)

    IVX, IVY, IVZ, IP, IXX, IYY, IZZ, IYZ, IXZ, IXY = range(10)

    # copy the frozen window-edge planes (never recomputed, may be selected
    # into the output by the clamped window of the first/last slab); velocity
    # planes still receive their in-plane free-slip mirrors (the serial BC
    # pass mirrors tangential ghosts on EVERY x-plane, ops/bc.py:209-230)
    def _vx_mirrors(v):
        v = jnp.where(yb(0, 0), _sm1(v, 0), v)
        v = jnp.where(yb(ny + 1, ny + 1), _sp1(v, 0), v)
        v = jnp.where(zb(0, 0), _sm1(v, 1), v)
        v = jnp.where(zb(nz + 1, nz + 1), _sp1(v, 1), v)
        return v

    def _vy_mirrors(v):
        v = jnp.where(zb(0, 0), _sm1(v, 1), v)
        v = jnp.where(zb(nz + 1, nz + 1), _sp1(v, 1), v)
        return v

    def _vz_mirrors(v):
        v = jnp.where(yb(0, 0), _sm1(v, 0), v)
        v = jnp.where(yb(ny + 1, ny + 1), _sp1(v, 0), v)
        return v

    for f in range(10):
        for q_edge in (0, B + 2 * HALO - 1):
            v = scr_in[f, q_edge]
            if f == 0:
                v = _vx_mirrors(v)
            elif f == 1:
                v = _vy_mirrors(v)
            elif f == 2:
                v = _vz_mirrors(v)
            scr_new[f, q_edge] = v

    # --- pass 1: P + stress planes q ∈ [1, B+3) ---------------------------
    for q in range(1, B + 2 * HALO - 1):
        ga = start + q  # global canvas x-index (traced scalar)
        Vx_m, Vx_q = scr_in[IVX, q - 1], scr_in[IVX, q]
        Vy_q, Vy_p = scr_in[IVY, q], scr_in[IVY, q + 1]
        Vz_q, Vz_p = scr_in[IVZ, q], scr_in[IVZ, q + 1]
        eta_q, eta_p = scr_k[0, q], scr_k[0, q + 1]
        etat_q = scr_k[1, q]

        dVxdx = (Vx_q - Vx_m) * inv_dx
        dVydy = (Vy_q - _sp1(Vy_q, 0)) * inv_dy
        dVzdz = (Vz_q - _sp1(Vz_q, 1)) * inv_dz
        grad_V = dVxdx + dVydy + dVzdz

        cell_x = (ga >= 1) & (ga <= nx)
        Mc = yz_cell & cell_x
        P_q = scr_in[IP, q]
        scr_new[IP, q] = jnp.where(Mc, P_q - grad_V * etat_q * r_theta, P_q)

        exx = dVxdx - grad_V * third
        eyy = dVydy - grad_V * third
        ezz = dVzdz - grad_V * third
        t = scr_in[IXX, q]
        scr_new[IXX, q] = jnp.where(Mc, t + dtau_r * (2.0 * eta_q * exx - t), t)
        t = scr_in[IYY, q]
        scr_new[IYY, q] = jnp.where(Mc, t + dtau_r * (2.0 * eta_q * eyy - t), t)
        t = scr_in[IZZ, q]
        scr_new[IZZ, q] = jnp.where(Mc, t + dtau_r * (2.0 * eta_q * ezz - t), t)

        # shear strain at edges collocated on this plane
        eyz = 0.5 * ((_sm1(Vy_q, 1) - Vy_q) * inv_dz + (_sm1(Vz_q, 0) - Vz_q) * inv_dy)
        exz = 0.5 * ((_sm1(Vx_q, 1) - Vx_q) * inv_dz + (Vz_p - Vz_q) * inv_dx)
        exy = 0.5 * ((_sm1(Vx_q, 0) - Vx_q) * inv_dy + (Vy_p - Vy_q) * inv_dx)

        e_y = 0.5 * (eta_q + _sm1(eta_q, 0))
        eta_yz = 0.5 * (e_y + _sm1(e_y, 1))
        e_xz = 0.5 * (eta_q + eta_p)
        eta_xz = 0.5 * (e_xz + _sm1(e_xz, 1))
        eta_xy = 0.5 * (e_xz + _sm1(e_xz, 0))

        t = scr_in[IYZ, q]
        scr_new[IYZ, q] = jnp.where(
            m_yz_e & cell_x, t + dtau_r * (2.0 * eta_yz * eyz - t), t
        )
        edge_x = (ga >= 1) & (ga <= nx - 1)
        t = scr_in[IXZ, q]
        scr_new[IXZ, q] = jnp.where(
            m_xz_e & edge_x, t + dtau_r * (2.0 * eta_xz * exz - t), t
        )
        t = scr_in[IXY, q]
        scr_new[IXY, q] = jnp.where(
            m_xy_e & edge_x, t + dtau_r * (2.0 * eta_xy * exy - t), t
        )

    # --- pass 2: velocities planes q ∈ [1, B+3) ---------------------------
    for q in range(1, B + 2 * HALO - 1):
        ga = start + q
        P_q = scr_new[IP, q]
        P_p = scr_new[IP, q + 1]
        txx_q, txx_p = scr_new[IXX, q], scr_new[IXX, q + 1]
        tyy_q = scr_new[IYY, q]
        tzz_q = scr_new[IZZ, q]
        tyz_q = scr_new[IYZ, q]
        txz_q, txz_m = scr_new[IXZ, q], scr_new[IXZ, q - 1]
        txy_q, txy_m = scr_new[IXY, q], scr_new[IXY, q - 1]
        etat_q, etat_p = scr_k[1, q], scr_k[1, q + 1]
        fx_q, fx_p = scr_k[2, q], scr_k[2, q + 1]
        fy_q = scr_k[3, q]
        fz_q = scr_k[4, q]

        face_x = (ga >= 1) & (ga <= nx - 1)
        cell_x = (ga >= 1) & (ga <= nx)

        rx = (
            (txx_p - txx_q) * inv_dx
            + (txy_q - _sp1(txy_q, 0)) * inv_dy
            + (txz_q - _sp1(txz_q, 1)) * inv_dz
            - (P_p - P_q) * inv_dx
            - 0.5 * (fx_q + fx_p)
        )
        v = scr_in[IVX, q]
        v = jnp.where(
            yz_cell & face_x,
            v + rx * (etadtau / (0.5 * (etat_q + etat_p))),
            v,
        )
        # in-plane free-slip mirrors (front/back on b, top/bot on c)
        v = jnp.where(yb(0, 0), _sm1(v, 0), v)
        v = jnp.where(yb(ny + 1, ny + 1), _sp1(v, 0), v)
        v = jnp.where(zb(0, 0), _sm1(v, 1), v)
        v = jnp.where(zb(nz + 1, nz + 1), _sp1(v, 1), v)
        scr_new[IVX, q] = v

        ry = (
            (txy_q - txy_m) * inv_dx
            + (_sm1(tyy_q, 0) - tyy_q) * inv_dy
            + (tyz_q - _sp1(tyz_q, 1)) * inv_dz
            - (_sm1(P_q, 0) - P_q) * inv_dy
            - 0.5 * (fy_q + _sm1(fy_q, 0))
        )
        v = scr_in[IVY, q]
        v = jnp.where(
            m_vy & cell_x,
            v + ry * (etadtau / (0.5 * (etat_q + _sm1(etat_q, 0)))),
            v,
        )
        v = jnp.where(zb(0, 0), _sm1(v, 1), v)
        v = jnp.where(zb(nz + 1, nz + 1), _sp1(v, 1), v)
        scr_new[IVY, q] = v

        rz = (
            (txz_q - txz_m) * inv_dx
            + (tyz_q - _sp1(tyz_q, 0)) * inv_dy
            + (_sm1(tzz_q, 1) - tzz_q) * inv_dz
            - (_sm1(P_q, 1) - P_q) * inv_dz
            - 0.5 * (fz_q + _sm1(fz_q, 1))
        )
        v = scr_in[IVZ, q]
        v = jnp.where(
            m_vz & cell_x,
            v + rz * (etadtau / (0.5 * (etat_q + _sm1(etat_q, 1)))),
            v,
        )
        v = jnp.where(yb(0, 0), _sm1(v, 0), v)
        v = jnp.where(yb(ny + 1, ny + 1), _sp1(v, 0), v)
        scr_new[IVZ, q] = v

    # --- x-direction free-slip mirrors (left/right ghost planes) ----------
    # serial order applies x mirrors LAST, wholesale plane copies of the
    # already y/z-mirrored neighbors (ops/bc.py _free_slip_velocity_3d)
    @pl.when(start == 0)
    def _():
        scr_new[IVY, 0] = scr_new[IVY, 1]
        scr_new[IVZ, 0] = scr_new[IVZ, 1]

    last_plane = B + 2 * HALO - 1

    @pl.when(start + last_plane == nx + 1)
    def _():
        scr_new[IVY, last_plane] = scr_new[IVY, last_plane - 1]
        scr_new[IVZ, last_plane] = scr_new[IVZ, last_plane - 1]

    # --- emit the slab via a dynamic windowed ref load ---------------------
    for f in range(10):
        out_ref[f] = scr_new[f, pl.ds(off, B)]


def stokes3d_iteration_planes(
    carry: Array,
    const: Array,
    inv_di: Tuple[float, float, float],
    r: float,
    theta_dtau: float,
    etadtau: float,
    B: int = 8,
    interpret: bool = False,
) -> Array:
    """Plane-revolving twin of :func:`stokes3d_iteration_strips` (same
    contract, same packed-canvas layouts, same serial-equivalence oracle)."""
    _, X, Y, Z = carry.shape
    nx, ny, nz = X - 2, Y - 2, Z - 2
    if X % B:
        raise ValueError(f"canvas x-dim {X} not divisible by slab size {B}")
    dtype = carry.dtype
    scal = jnp.stack([
        jnp.asarray(v, dtype)
        for v in (inv_di[0], inv_di[1], inv_di[2], r / theta_dtau,
                  theta_dtau, etadtau)
    ])
    kern = partial(_kernel_planes, nx=nx, ny=ny, nz=nz, B=B, X=X)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(X // B,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((10, B, Y, Z), lambda i, *_: (0, i, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((10, B + 2 * HALO, Y, Z), dtype),
                pltpu.VMEM((5, B + 2 * HALO, Y, Z), dtype),
                pltpu.VMEM((10, B + 2 * HALO, Y, Z), dtype),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((10, X, Y, Z), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(scal, carry, const)
    return out
