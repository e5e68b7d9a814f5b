"""Distributed (multi-device) visco-elasto-plastic APT Stokes solver, 2D.

The flagship solver (solvers/stokes2d_vep.py; reference multi-phase
``_solve!`` Stokes2D.jl:577-883 under ImplicitGlobalGrid/MPI) run inside one
``shard_map`` over an ("x","y") device mesh. It shares the fused
center+vertex stress kernel with the serial solver — the kernel's clamped
center→vertex averages are parameterized by an ``extend`` hook
(ops/stokes_vep.py), and this module passes ``halo.extend``-based extension:
physical-boundary devices replicate the outermost layer (identical to the
serial edge clamp), interior devices fetch the true neighbor layer via
``lax.ppermute``. Shared vertices are computed redundantly and bit-identically
on adjacent devices, so the solve reproduces the serial solver to roundoff
(tests/test_distributed_vep2d.py).

Per PT iteration the only collectives are the ghost extensions of the center
fields feeding the vertex pass + momentum stencil and the velocity ghost-row
exchange; convergence norms are ``lax.psum`` reductions (reference:
MPI.Allreduce), so the whole solve is one device program.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from justrelax_tpu.core.coeffs import PTStokesCoeffs
from justrelax_tpu.ops.bc import VelocityBoundaryConditions
from justrelax_tpu.ops.stencil import av_a, interior_add, interior_set, maxloc
from justrelax_tpu.ops.stokes_vep import update_stresses_center_vertex
from justrelax_tpu.parallel import halo
from justrelax_tpu.parallel.decomp import Decomp2D
from justrelax_tpu.parallel.stokes2d import (
    _flow_bcs_local,
    _freeze_rows,
    momentum_all_faces,
)
from justrelax_tpu.rheology.materials import (
    _as_stack,
    compute_density,
    get_bulk_modulus,
    get_shear_modulus,
    phase_average,
)
from justrelax_tpu.rheology.viscosity import compute_viscosity_fields

Array = Any

__all__ = ["solve_vep_sharded"]


class ShardedVEPResult2D(NamedTuple):
    Vx: Array
    Vy: Array
    P: Array
    txx: Array
    tyy: Array
    txy_c: Array
    txy_v: Array
    eta: Array
    eta_v: Array
    lam: Array
    lam_v: Array
    tau_II: Array
    eta_vep: Array
    err: Array
    iters: Array


_ORDER = (
    "Vx", "Vy", "P", "Q",
    "txx", "tyy", "txy_c", "txy_v",
    "txx_o", "tyy_o", "txy_c_o", "txy_v_o",
    "EII_pl", "eta", "eta_v",
)
_OPTIONAL = ("T", "pr_c", "pr_v")


def solve_vep_sharded(
    mesh,
    decomp: Decomp2D,
    blocks: dict,
    pt_stokes: PTStokesCoeffs,
    flow_bc: VelocityBoundaryConditions,
    material,
    dt,
    iter_max: int = 50_000,
    iter_min: int = 100,
    nout: int = 500,
    viscosity_relaxation: float = 1.0e-2,
    lambda_relaxation: float = 0.2,
    viscosity_cutoff: Tuple[float, float] = (-jnp.inf, jnp.inf),
):
    """Run the multi-phase VEP APT solve over the mesh.

    ``blocks`` holds the blocked-local containers listed in ``_ORDER`` plus
    ``inv_dx``/``inv_dy`` scalars; optional ``T`` (blocked centers) and
    blocked phase-ratio stacks ``pr_c`` (centers) / ``pr_v`` (vertices,
    shared rows; trailing phase axis unsharded). ``P0 ← P`` at solve entry,
    matching the serial driver (Stokes2D.jl:610).
    """
    blocks = dict(blocks)
    nxl, nyl = decomp.ni_local
    nx_g, ny_g = decomp.ni_global
    inv_dx, inv_dy = blocks.pop("inv_dx"), blocks.pop("inv_dy")
    r, theta_dtau, etadtau = pt_stokes.r, pt_stokes.theta_dtau, pt_stokes.etadtau
    eps_rel, eps_abs = pt_stokes.eps_rel, pt_stokes.eps_abs
    nout_i = int(nout)
    max_chunks = max(1, int(math.ceil(iter_max / nout_i)))
    min_chunks = int(math.ceil(iter_min / nout_i))

    present_opt = tuple(k for k in _OPTIONAL if k in blocks)

    def local_solve(*args):
        named = dict(zip(_ORDER + present_opt, args))
        Vx0, Vy0 = named["Vx"], named["Vy"]
        Pr0, Q = named["P"], named["Q"]
        txx_o, tyy_o = named["txx_o"], named["tyy_o"]
        txy_c_o, txy_v_o = named["txy_c_o"], named["txy_v_o"]
        EII_pl = named["EII_pl"]
        T = named.get("T")
        pr_c = named.get("pr_c")
        pr_v = named.get("pr_v")

        dtype = Pr0.dtype
        P0 = Pr0
        fx, lx_ = halo.axis_edges("x")
        fy, ly_ = halo.axis_edges("y")
        rx = lax.axis_index("x")
        ry = lax.axis_index("y")

        def extend2(A):
            return halo.extend(halo.extend(A, 0, 1), 1, 1)

        K_c = get_bulk_modulus(material, pr_c)
        G_c = get_shear_modulus(material, pr_c)
        T_vertex = None if T is None else av_a(extend2(T))

        def rho_g_fields(Pc):
            rho = compute_density(material, T=T, P=Pc, phase_ratios=pr_c)
            g = phase_average(_as_stack(material).params.gravity, pr_c)
            return jnp.zeros_like(rho), rho * jnp.broadcast_to(g, rho.shape)

        def eta_tau_fields(eta):
            # maxloc over a 2-deep ghost extension: physical-boundary
            # replicate == the serial clamp; interior == true neighbor window
            eta_e2 = halo.extend(halo.extend(eta, 0, 2), 1, 2)
            etat_full = maxloc(eta_e2, window=1)[1:-1, 1:-1]
            return etat_full[1:-1, 1:-1], etat_full[:, 1:-1], etat_full[1:-1, :]

        def momentum(Pc, txx, tyy, txy_v, rho_gx, rho_gy):
            # shared all-faces momentum kernels (parallel/stokes2d.py →
            # ops/stokes.py); ρg is buoyancy-coupled here so it is extended
            # per call rather than hoisted
            return momentum_all_faces(
                Pc, txx, tyy, txy_v,
                halo.extend(rho_gx, 0, 1), halo.extend(rho_gy, 1, 1),
                inv_dx, inv_dy,
            )

        class C(NamedTuple):
            Vx: Array
            Vy: Array
            P: Array
            theta: Array
            txx: Array
            tyy: Array
            txy_c: Array
            txy_v: Array
            eta: Array
            eta_v: Array
            lam: Array
            lam_v: Array
            tau_II: Array
            eta_vep: Array
            RP: Array
            err: Array
            err1: Array
            chunk: Array

        def one_iteration(_, c: C):
            eta_tau, etat_x, etat_y = eta_tau_fields(c.eta)
            grad_V = (c.Vx[1:, 1:-1] - c.Vx[:-1, 1:-1]) * inv_dx + (
                c.Vy[1:-1, 1:] - c.Vy[1:-1, :-1]
            ) * inv_dy
            _Kdt = 1.0 / (K_c * dt)
            rhs = -grad_V + Q / dt
            RP = -(c.theta - P0) * _Kdt + rhs
            psi = 1.0 / (1.0 / eta_tau + 1.0 / (G_c * dt)) * (r / theta_dtau)
            theta = ((P0 * _Kdt + rhs) * psi + c.theta) / (1.0 + _Kdt * psi)

            rho_gx, rho_gy = rho_g_fields(c.P)
            third = 1.0 / 3.0
            exx = (c.Vx[1:, 1:-1] - c.Vx[:-1, 1:-1]) * inv_dx - grad_V * third
            eyy = (c.Vy[1:-1, 1:] - c.Vy[1:-1, :-1]) * inv_dy - grad_V * third
            exy = 0.5 * (
                (c.Vx[:, 1:] - c.Vx[:, :-1]) * inv_dy
                + (c.Vy[1:, :] - c.Vy[:-1, :]) * inv_dx
            )
            res = update_stresses_center_vertex(
                exx, eyy, exy,
                c.txx, c.tyy, c.txy_c, c.txy_v,
                txx_o, tyy_o, txy_c_o, txy_v_o,
                theta, c.eta, c.lam, c.lam_v, EII_pl,
                material, pr_c, pr_v,
                lambda_relaxation, dt, theta_dtau,
                extend=extend2,
            )
            eta, eta_v = compute_viscosity_fields(
                c.eta, c.eta_v, material,
                res.txx, res.tyy, res.txy_c,
                jnp.zeros_like(c.eta_v), jnp.zeros_like(c.eta_v), res.txy_v,
                pr_c, pr_v,
                T=T, T_v=T_vertex,
                mode="tau",
                relaxation=viscosity_relaxation,
                cutoff=viscosity_cutoff,
            )
            Rx, Ry = momentum(res.P_corrected, res.txx, res.tyy, res.txy_v,
                              rho_gx, rho_gy)
            etax = 0.5 * (etat_x[1:, :] + etat_x[:-1, :])
            etay = 0.5 * (etat_y[:, 1:] + etat_y[:, :-1])
            Vx_new = interior_add(c.Vx, Rx * etadtau / etax, pads=((0, 0), (1, 1)))
            Vy_new = interior_add(c.Vy, Ry * etadtau / etay, pads=((1, 1), (0, 0)))
            Vx = _freeze_rows(c.Vx, Vx_new, 0, fx, lx_)
            Vy = _freeze_rows(c.Vy, Vy_new, 1, fy, ly_)
            Vx, Vy = _flow_bcs_local(Vx, Vy, flow_bc, fx, lx_, fy, ly_)
            Vx = halo.exchange_ghosts(Vx, 1, nyl)
            Vy = halo.exchange_ghosts(Vy, 0, nxl)
            return c._replace(
                Vx=Vx, Vy=Vy, P=res.P_corrected, theta=theta,
                txx=res.txx, tyy=res.tyy, txy_c=res.txy_c, txy_v=res.txy_v,
                eta=eta, eta_v=eta_v, lam=res.lam, lam_v=res.lam_v,
                tau_II=res.tau_II, eta_vep=res.eta_vep, RP=RP,
            )

        def residual_norms(c: C):
            rho_gx, rho_gy = rho_g_fields(c.P)
            Rx, Ry = momentum(c.P, c.txx, c.tyy, c.txy_v, rho_gx, rho_gy)
            # ownership + the serial interior window Rx[1:-1, 1:-1]
            gfx = rx * nxl + jnp.arange(nxl + 1)
            gcy = ry * nyl + jnp.arange(nyl)
            own_x = jnp.arange(nxl + 1) >= 1
            mx = (own_x & (gfx >= 2) & (gfx <= nx_g - 2))[:, None] & (
                (gcy >= 1) & (gcy <= ny_g - 2)
            )[None, :]
            gcx = rx * nxl + jnp.arange(nxl)
            gfy = ry * nyl + jnp.arange(nyl + 1)
            own_y = jnp.arange(nyl + 1) >= 1
            my = ((gcx >= 1) & (gcx <= nx_g - 2))[:, None] & (
                own_y & (gfy >= 2) & (gfy <= ny_g - 2)
            )[None, :]
            ss_x = lax.psum(jnp.sum(jnp.where(mx, Rx, 0.0) ** 2), ("x", "y"))
            ss_y = lax.psum(jnp.sum(jnp.where(my, Ry, 0.0) ** 2), ("x", "y"))
            ss_p = lax.psum(jnp.sum(c.RP**2), ("x", "y"))
            nRx = jnp.sqrt(ss_x) / math.sqrt((nx_g - 2) * (ny_g - 1))
            nRy = jnp.sqrt(ss_y) / math.sqrt((nx_g - 1) * (ny_g - 2))
            nRP = jnp.sqrt(ss_p) / math.sqrt(nx_g * ny_g)
            return nRx, nRy, nRP

        def cond(c: C):
            not_conv = ((c.err / c.err1) > eps_rel) & (c.err > eps_abs)
            return (c.chunk < min_chunks) | (not_conv & (c.chunk < max_chunks))

        def body(c: C):
            _CORE = ("Vx", "Vy", "P", "theta", "txx", "tyy", "txy_c", "txy_v", "eta", "eta_v", "lam", "lam_v")

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
            nRx, nRy, nRP = residual_norms(c)
            err = jnp.maximum(jnp.maximum(nRx, nRy), nRP)
            err1 = jnp.where(c.chunk == 0, err, c.err1)
            return c._replace(err=err, err1=err1, chunk=c.chunk + 1)

        init = C(
            Vx=Vx0, Vy=Vy0, P=Pr0, theta=Pr0,
            txx=named["txx"], tyy=named["tyy"],
            txy_c=named["txy_c"], txy_v=named["txy_v"],
            eta=named["eta"], eta_v=named["eta_v"],
            lam=jnp.zeros_like(Pr0), lam_v=jnp.zeros_like(named["txy_v"]),
            tau_II=jnp.zeros_like(Pr0), eta_vep=jnp.zeros_like(Pr0),
            RP=jnp.zeros_like(Pr0),
            err=jnp.asarray(jnp.inf, dtype),
            err1=jnp.asarray(1.0, dtype),
            chunk=jnp.asarray(0, jnp.int32),
        )
        _core_template = init
        c = lax.while_loop(cond, body, init)
        return ShardedVEPResult2D(
            Vx=c.Vx, Vy=c.Vy, P=c.P,
            txx=c.txx, tyy=c.tyy, txy_c=c.txy_c, txy_v=c.txy_v,
            eta=c.eta, eta_v=c.eta_v, lam=c.lam, lam_v=c.lam_v,
            tau_II=c.tau_II, eta_vep=c.eta_vep,
            err=c.err, iters=c.chunk * nout_i,
        )

    spec = P("x", "y")
    spec3 = P("x", "y", None)
    in_specs = tuple(spec for _ in _ORDER) + tuple(
        spec if k == "T" else spec3 for k in present_opt
    )
    out_specs = ShardedVEPResult2D(
        **{k: spec for k in ShardedVEPResult2D._fields if k not in ("err", "iters")},
        err=P(), iters=P(),
    )
    fn = jax.shard_map(
        local_solve, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )
    return fn(*(blocks[k] for k in _ORDER + present_opt))
