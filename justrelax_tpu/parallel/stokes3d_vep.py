"""Distributed (multi-device) visco-elasto-plastic APT Stokes solver, 3D.

The VEP twin of :mod:`justrelax_tpu.parallel.stokes3d` (reference: the 3D
GeoParams ``_solve!`` driver Stokes3D.jl:204-660 run under
ImplicitGlobalGrid/MPI): the full plastic return-mapping loop — compressible
pressure iterate θ, fused center+edge Drucker-Prager stress update, τII
viscosity relaxation — runs inside one ``shard_map`` over an ("x","y","z")
device mesh.

The fused stress kernel is *shared* with the serial solver: it is
parameterized by :class:`~justrelax_tpu.ops.stokes3d_vep.StaggeredMoves`, and
this module supplies halo-aware moves in which

- the backward clamped pair average (``av_clamped_*`` center→edge) becomes a
  plain pair average of a ``halo.extend``-ed block — ``extend`` replicates the
  outermost layer on physical-boundary devices, which IS the serial edge
  clamp, and fetches the neighbor layer elsewhere;
- the forward center-count-clamped pair average and the index clamp act on
  locally-shared staggered faces with the clamp applied only on the last
  device along the axis (``lax.axis_index`` masks).

Shared faces/edges are computed redundantly and bit-identically on adjacent
devices, so the solve reproduces the serial solver to roundoff
(tests/test_distributed_vep3d.py).

Not yet threaded (round-2): plastic-strain accumulation outputs (EII/EVol),
the φ rock-ratio masked variational variant, nonuniform spacing.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from justrelax_tpu.core.coeffs import PTStokesCoeffs
from justrelax_tpu.ops.bc import VelocityBoundaryConditions
from justrelax_tpu.ops.stencil import interior_add, maxloc
from justrelax_tpu.ops.stokes import compute_P
from justrelax_tpu.ops.stokes3d_vep import (
    _EDGE_AXES,
    _edge_to_center,
    _inv_II,
    StaggeredMoves,
    update_stresses_center_edges_3d,
)
from justrelax_tpu.parallel import halo
from justrelax_tpu.parallel.decomp import Decomp3D
from justrelax_tpu.parallel.stokes3d import _free_slip_local_3d, _freeze
from justrelax_tpu.rheology.materials import (
    _as_stack,
    compute_density,
    get_bulk_modulus,
    get_shear_modulus,
    phase_average,
)
from justrelax_tpu.rheology.viscosity import continuation_linear, phase_viscosity

Array = Any

__all__ = ["solve_vep_sharded_3d", "distributed_moves"]


class ShardedVEPResult3D(NamedTuple):
    Vx: Array
    Vy: Array
    Vz: Array
    P: Array
    txx: Array
    tyy: Array
    tzz: Array
    tyz_c: Array
    txz_c: Array
    txy_c: Array
    tyz: Array
    txz: Array
    txy: Array
    eta: Array
    lam: Array
    tau_II: Array
    err: Array
    iters: Array


def _take(A, axis, sl):
    idx = [slice(None)] * A.ndim
    idx[axis] = sl
    return A[tuple(idx)]


def distributed_moves(edges) -> StaggeredMoves:
    """Halo-aware clamped staggered moves for blocked-local containers.

    ``edges[axis] = (is_first, is_last)`` physical-boundary masks. Center
    inputs are disjoint per-device tiles; edge-family arrays carry shared
    faces. Each move reproduces the serial clamped move's global values
    bit-for-bit (shared outputs computed redundantly in the same a+b order
    on both adjacent devices).
    """

    def pair_back(A, axis):
        # serial _pair_back: size n → n+1, (A[j-1]+A[j])/2 with edge clamp.
        # extend's physical-boundary replicate == the serial clamp.
        E = halo.extend(A, axis, 1)
        return 0.5 * (
            _take(E, axis, slice(None, -1)) + _take(E, axis, slice(1, None))
        )

    def pair_fwd(A, axis):
        # serial _pair_fwd on a face array (global ng+1 → ng), reads
        # A[min(i, ng-1)], A[min(i+1, ng-1)]: local faces are shared so no
        # exchange is needed; only the LAST device's final entry clamps
        # (0.5·(A[ng-1]+A[ng-1]) = A[ng-1], the penultimate local face).
        n = A.shape[axis] - 1
        out = 0.5 * (_take(A, axis, slice(0, n)) + _take(A, axis, slice(1, n + 1)))
        pen = _take(A, axis, slice(n - 1, n))
        cur = _take(out, axis, slice(n - 1, n))
        fixed = jnp.where(edges[axis][1], pen, cur)
        return jnp.concatenate([_take(out, axis, slice(0, n - 1)), fixed], axis=axis)

    def idx_clamp(A, axis):
        # serial _idx_clamp: B[k] = A[min(k, ng-1)] along a shared staggered
        # axis — identity except the last device's outermost face.
        s = A.shape[axis]
        cur = _take(A, axis, slice(s - 1, s))
        pen = _take(A, axis, slice(s - 2, s - 1))
        new = jnp.where(edges[axis][1], pen, cur)
        return jnp.concatenate([_take(A, axis, slice(0, s - 1)), new], axis=axis)

    def center_to_edge(A, a, b):
        return pair_back(pair_back(A, a), b)

    def harm_center_to_edge(A, a, b):
        return 1.0 / center_to_edge(1.0 / A, a, b)

    def other_to_edge(src_name, dst_name, A):
        sa = _EDGE_AXES[src_name]
        da = _EDGE_AXES[dst_name]
        shared = [x for x in sa if x in da][0]
        src_only = [x for x in sa if x not in da][0]
        dst_only = [x for x in da if x not in sa][0]
        return idx_clamp(pair_back(pair_fwd(A, src_only), dst_only), shared)

    return StaggeredMoves(
        center_to_edge=center_to_edge,
        harm_center_to_edge=harm_center_to_edge,
        other_to_edge=other_to_edge,
        edge_to_center=_edge_to_center,  # interior 4-point average: local
    )


# blocked-local inputs, in signature order
_ORDER = (
    "Vx", "Vy", "Vz", "P", "Q",
    "txx", "tyy", "tzz", "tyz_c", "txz_c", "txy_c", "tyz", "txz", "txy",
    "txx_o", "tyy_o", "tzz_o", "tyz_c_o", "txz_c_o", "txy_c_o",
    "tyz_o", "txz_o", "txy_o",
    "EII_pl", "eta",
)
_OPTIONAL = ("T", "pr_c", "pr_yz", "pr_xz", "pr_xy")


def solve_vep_sharded_3d(
    mesh,
    decomp: Decomp3D,
    blocks: dict,
    pt_stokes: PTStokesCoeffs,
    flow_bc: VelocityBoundaryConditions,
    material,
    dt,
    iter_max: int = 10_000,
    iter_min: int = 100,
    nout: int = 500,
    viscosity_relaxation: float = 1.0e-2,
    lambda_relaxation: float = 0.2,
    viscosity_cutoff: Tuple[float, float] = (-jnp.inf, jnp.inf),
):
    """Run the VEP APT Stokes solve over a 3D mesh.

    ``blocks`` holds the blocked-local containers listed in ``_ORDER`` plus
    ``inv_dx/y/z`` scalars; optional: ``T`` (blocked centers) and blocked
    phase-ratio stacks ``pr_c``/``pr_yz``/``pr_xz``/``pr_xy`` (trailing phase
    axis unsharded). ``P0 ← P`` at solve entry, matching the serial driver.
    """
    blocks = dict(blocks)
    nl = decomp.ni_local
    ng = decomp.ni_global
    inv_di = (blocks.pop("inv_dx"), blocks.pop("inv_dy"), blocks.pop("inv_dz"))
    _dx, _dy, _dz = inv_di
    r, theta_dtau, etadtau = pt_stokes.r, pt_stokes.theta_dtau, pt_stokes.etadtau
    eps_rel, eps_abs = pt_stokes.eps_rel, pt_stokes.eps_abs
    nout_i = int(nout)
    max_chunks = max(1, int(math.ceil(iter_max / nout_i)))
    min_chunks = int(math.ceil(iter_min / nout_i))

    present_opt = tuple(k for k in _OPTIONAL if k in blocks)
    has_T = "T" in present_opt
    has_pr = "pr_c" in present_opt

    def local_solve(*args):
        named = dict(zip(_ORDER + present_opt, args))
        Vx, Vy, Vz = named["Vx"], named["Vy"], named["Vz"]
        Pr, Q = named["P"], named["Q"]
        eta0, EII_pl = named["eta"], named["EII_pl"]
        tau_c6 = tuple(named[k] for k in ("txx", "tyy", "tzz", "tyz_c", "txz_c", "txy_c"))
        tau_e3 = tuple(named[k] for k in ("tyz", "txz", "txy"))
        tau_o_c6 = tuple(
            named[k] for k in
            ("txx_o", "tyy_o", "tzz_o", "tyz_c_o", "txz_c_o", "txy_c_o")
        )
        tau_o_e3 = tuple(named[k] for k in ("tyz_o", "txz_o", "txy_o"))
        T = named.get("T")
        ratios_c = named.get("pr_c")
        ratios_e = (named.get("pr_yz"), named.get("pr_xz"), named.get("pr_xy"))

        dtype = Pr.dtype
        P0 = Pr
        edges = tuple(halo.axis_edges(a) for a in ("x", "y", "z"))
        moves = distributed_moves(edges)

        K_c = get_bulk_modulus(material, ratios_c)
        G_c = get_shear_modulus(material, ratios_c)

        # hoist the solve-invariants of the fused stress update with the
        # halo-aware moves (bitwise-equal; see solvers/stokes3d_vep.py)
        from justrelax_tpu.ops.stokes3d_vep import make_vep_params_3d

        vep_params = make_vep_params_3d(
            material, EII_pl, ratios_c, ratios_e, tau_o_c6, tau_o_e3,
            moves=moves,
        )

        def rho_g_fields(Pc):
            rho = compute_density(material, T=T, P=Pc, phase_ratios=ratios_c)
            g = phase_average(_as_stack(material).params.gravity, ratios_c)
            z = jnp.zeros_like(rho)
            return z, z, rho * jnp.broadcast_to(g, rho.shape)

        def refresh_viscosity(eta_old, tau_c):
            eps0 = jnp.where(
                sum(jnp.abs(t) for t in tau_c) == 0, jnp.finfo(dtype).eps, 0.0
            )
            tII = _inv_II((tau_c[0] + eps0,) + tau_c[1:])
            eta_n = phase_viscosity(material, tII, T, ratios_c, "tau")
            eta_n = continuation_linear(eta_n, eta_old, viscosity_relaxation)
            return jnp.clip(eta_n, viscosity_cutoff[0], viscosity_cutoff[1])

        def eta_tau_fields(eta):
            # maxloc over ghost-extended η: the physical-boundary replicate
            # equals the serial clamp; interior ghosts give the true
            # neighbor-device window. (+1 faces per axis for face averages.)
            eta_e2 = halo.extend(
                halo.extend(halo.extend(eta, 0, 2), 1, 2), 2, 2
            )
            etat_full = maxloc(eta_e2, window=1)[1:-1, 1:-1, 1:-1]
            return (
                etat_full[1:-1, 1:-1, 1:-1],  # centers
                etat_full[:, 1:-1, 1:-1],
                etat_full[1:-1, :, 1:-1],
                etat_full[1:-1, 1:-1, :],
            )

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

        def momentum(Pc, txx, tyy, tzz, tyz, txz, txy, fx, fy, fz):
            # residuals on ALL local faces from ghost-extended center fields
            P_ex, txx_ex = halo.extend(Pc, 0, 1), halo.extend(txx, 0, 1)
            fx_ex = halo.extend(fx, 0, 1)
            Rx = (
                (txx_ex[1:, :, :] - txx_ex[:-1, :, :]) * _dx
                + (txy[:, 1:, :] - txy[:, :-1, :]) * _dy
                + (txz[:, :, 1:] - txz[:, :, :-1]) * _dz
                - (P_ex[1:, :, :] - P_ex[:-1, :, :]) * _dx
                - 0.5 * (fx_ex[1:, :, :] + fx_ex[:-1, :, :])
            )
            P_ey, tyy_ey = halo.extend(Pc, 1, 1), halo.extend(tyy, 1, 1)
            fy_ey = halo.extend(fy, 1, 1)
            Ry = (
                (txy[1:, :, :] - txy[:-1, :, :]) * _dx
                + (tyy_ey[:, 1:, :] - tyy_ey[:, :-1, :]) * _dy
                + (tyz[:, :, 1:] - tyz[:, :, :-1]) * _dz
                - (P_ey[:, 1:, :] - P_ey[:, :-1, :]) * _dy
                - 0.5 * (fy_ey[:, 1:, :] + fy_ey[:, :-1, :])
            )
            P_ez, tzz_ez = halo.extend(Pc, 2, 1), halo.extend(tzz, 2, 1)
            fz_ez = halo.extend(fz, 2, 1)
            Rz = (
                (txz[1:, :, :] - txz[:-1, :, :]) * _dx
                + (tyz[:, 1:, :] - tyz[:, :-1, :]) * _dy
                + (tzz_ez[:, :, 1:] - tzz_ez[:, :, :-1]) * _dz
                - (P_ez[:, :, 1:] - P_ez[:, :, :-1]) * _dz
                - 0.5 * (fz_ez[:, :, 1:] + fz_ez[:, :, :-1])
            )
            return Rx, Ry, Rz

        class C(NamedTuple):
            V: Tuple
            P: Array
            theta: Array
            tau_c: Tuple
            tau_e: Tuple
            eta: Array
            lam: Array
            lam_e: Tuple
            tau_II: Array
            RP: Array
            err: Array
            err1: Array
            chunk: Array

        def one_iteration(_, c: C):
            Vx, Vy, Vz = c.V
            eta_tau, etat_x, etat_y, etat_z = eta_tau_fields(c.eta)
            grad_V, exx, eyy, ezz, eyz, exz, exy = grad_and_strain(Vx, Vy, Vz)
            RP, theta = compute_P(
                c.theta, P0, grad_V, Q, eta_tau, K_c, G_c, dt, r, theta_dtau
            )
            fx, fy, fz = rho_g_fields(c.P)
            res = update_stresses_center_edges_3d(
                (exx, eyy, ezz), (eyz, exz, exy),
                c.tau_c, c.tau_e, tau_o_c6, tau_o_e3,
                theta, c.eta, c.lam, c.lam_e, EII_pl,
                material, ratios_c, ratios_e,
                lambda_relaxation, dt, theta_dtau,
                moves=moves, params=vep_params,
            )
            eta = refresh_viscosity(c.eta, res.tau_c)
            tau6 = res.tau_c[:3] + res.tau_e
            Rx, Ry, Rz = momentum(res.P_corrected, *tau6, fx, fy, fz)
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
            return c._replace(
                V=(Vx, Vy, Vz), P=res.P_corrected, theta=theta,
                tau_c=res.tau_c, tau_e=res.tau_e, eta=eta,
                lam=res.lam, lam_e=res.lam_e, tau_II=res.tau_II, RP=RP,
            )

        def residual_norms(c: C):
            fx, fy, fz = rho_g_fields(c.P)
            tau6 = c.tau_c[:3] + c.tau_e
            Rx, Ry, Rz = momentum(c.P, *tau6, fx, fy, fz)

            idx = [lax.axis_index(a) for a in ("x", "y", "z")]

            def face_mask(d_face, shape):
                # ownership + interior window matching serial R*[1:-1,1:-1,1:-1]
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
            ss_p = lax.psum(jnp.sum(c.RP**2), axes3)
            nRx = jnp.sqrt(ss_x) / ((ng[0] - 2) * (ng[1] - 1) * (ng[2] - 1))
            nRy = jnp.sqrt(ss_y) / ((ng[0] - 1) * (ng[1] - 2) * (ng[2] - 1))
            nRz = jnp.sqrt(ss_z) / ((ng[0] - 1) * (ng[1] - 1) * (ng[2] - 2))
            nRP = jnp.sqrt(ss_p) / (ng[0] * ng[1] * ng[2])
            return nRx, nRy, nRz, nRP

        def cond(c: C):
            not_conv = ((c.err / c.err1) > eps_rel) & (c.err > eps_abs)
            return (c.chunk < min_chunks) | (not_conv & (c.chunk < max_chunks))

        def body(c: C):
            _CORE = ("V", "P", "theta", "tau_c", "tau_e", "eta", "lam",
                     "lam_e")

            def one_iteration_core(i, t):
                # diagnostics out of the fori carry (see
                # solvers/stokes2d_vep.py — measured 1.48x there)
                cc = _core_template._replace(**dict(zip(_CORE, t)))
                c2 = one_iteration(i, cc)
                return tuple(getattr(c2, k) for k in _CORE)

            t = lax.fori_loop(
                0, nout_i - 1, one_iteration_core,
                tuple(getattr(c, k) for k in _CORE),
            )
            c = one_iteration(0, c._replace(**dict(zip(_CORE, t))))
            nRx, nRy, nRz, nRP = residual_norms(c)
            err = jnp.max(jnp.stack([nRx, nRy, nRz, nRP]))
            err1 = jnp.where(c.chunk == 0, err, c.err1)
            return c._replace(err=err, err1=err1, chunk=c.chunk + 1)

        init = C(
            V=(Vx, Vy, Vz), P=Pr, theta=Pr,
            tau_c=tau_c6, tau_e=tau_e3, eta=eta0,
            lam=jnp.zeros_like(Pr),
            lam_e=tuple(jnp.zeros_like(t) for t in tau_e3),
            tau_II=jnp.zeros_like(Pr),
            RP=jnp.zeros_like(Pr),
            err=jnp.asarray(jnp.inf, dtype),
            err1=jnp.asarray(1.0, dtype),
            chunk=jnp.asarray(0, jnp.int32),
        )
        _core_template = init
        c = lax.while_loop(cond, body, init)
        Vx, Vy, Vz = c.V
        return ShardedVEPResult3D(
            Vx=Vx, Vy=Vy, Vz=Vz, P=c.P,
            txx=c.tau_c[0], tyy=c.tau_c[1], tzz=c.tau_c[2],
            tyz_c=c.tau_c[3], txz_c=c.tau_c[4], txy_c=c.tau_c[5],
            tyz=c.tau_e[0], txz=c.tau_e[1], txy=c.tau_e[2],
            eta=c.eta, lam=c.lam, tau_II=c.tau_II,
            err=c.err, iters=c.chunk * nout_i,
        )

    spec = P("x", "y", "z")
    spec4 = P("x", "y", "z", None)
    in_specs = tuple(spec for _ in _ORDER) + tuple(
        spec if k == "T" else spec4 for k in present_opt
    )
    out_specs = ShardedVEPResult3D(
        **{k: spec for k in ShardedVEPResult3D._fields if k not in ("err", "iters")},
        err=P(), iters=P(),
    )
    fn = jax.shard_map(
        local_solve, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )
    return fn(*(blocks[k] for k in _ORDER + present_opt))
