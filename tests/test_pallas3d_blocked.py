"""Temporally-blocked 3D Pallas chunk == XLA canvas chunk (interpret, f64).

The canvas chunk itself is pinned against the slice/pad op composition in
tests/test_stokes3d_canvas.py, so equality here closes the chain
blocked == canvas == serial kernels.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from justrelax_tpu.core.coeffs import PTStokesCoeffs
from justrelax_tpu.core.grid import Geometry
from justrelax_tpu.ops.pallas_stokes3d_blocked import (
    choose_blocking_3d,
    stokes3d_chunk_blocked,
)
from justrelax_tpu.ops.stencil import maxloc
from justrelax_tpu.ops.stokes3d_canvas import (
    pack_carry,
    stokes3d_chunk_canvas,
    unpack_carry,
    ve3d_canvas_coefficients,
)
NAMES = ("Vx", "Vy", "Vz", "P", "txx", "tyy", "tzz", "tyz", "txz", "txy")


def _random_state(ni, seed=0):
    nx, ny, nz = ni
    rng = np.random.default_rng(seed)

    def r(*shape):
        return jnp.asarray(rng.standard_normal(shape))

    Vx = r(nx + 1, ny + 2, nz + 2)
    Vy = r(nx + 2, ny + 1, nz + 2)
    Vz = r(nx + 2, ny + 2, nz + 1)
    P = r(nx, ny, nz)
    txx, tyy, tzz = r(nx, ny, nz), r(nx, ny, nz), r(nx, ny, nz)
    tyz = r(nx, ny + 1, nz + 1)
    txz = r(nx + 1, ny, nz + 1)
    txy = r(nx + 1, ny + 1, nz)
    eta = jnp.exp(0.5 * r(nx, ny, nz))
    fx, fy, fz = r(nx, ny, nz), r(nx, ny, nz), r(nx, ny, nz)
    return (Vx, Vy, Vz, P, txx, tyy, tzz, tyz, txz, txy), (eta, fx, fy, fz)


@pytest.mark.parametrize("ve", [False, True])
@pytest.mark.parametrize("pipeline", [False, True])
def test_blocked3d_matches_canvas(ve, pipeline):
    ni = (22, 9, 7)
    nx, ny, nz = ni
    geometry = Geometry(ni, (1.0, 1.3, 0.8))
    pt = PTStokesCoeffs.make(geometry.li, geometry.di, CFL=0.9 / math.sqrt(3.1))
    fields, (eta, fx, fy, fz) = _random_state(ni, seed=4)
    eta_tau = maxloc(eta, window=1)
    inv_di = tuple(1.0 / d for d in geometry.di)
    kw = {}
    if ve:
        rng = np.random.default_rng(7)

        def r(*shape):
            return jnp.asarray(rng.standard_normal(shape)) * 0.1

        kw = dict(
            G=jnp.exp(r(*ni) + 1.0), K=jnp.exp(r(*ni) + 2.0),
            P0=r(*ni), Q=r(*ni),
            tau_o=(r(*ni), r(*ni), r(*ni), r(nx, ny + 1, nz + 1),
                   r(nx + 1, ny, nz + 1), r(nx + 1, ny + 1, nz)),
            dt=0.5,
        )
    co = ve3d_canvas_coefficients(
        eta, eta_tau, float(pt.r), float(pt.theta_dtau), float(pt.etadtau),
        fx=fx, fy=fy, fz=fz, **kw,
    )
    carry = tuple(pack_carry(*fields))
    # 2 iterations per pass, 3 plane-blocks; nout=5 exercises the remainder
    assert choose_blocking_3d(nx, ny, nz, 11, 8, plane_block=8,
                              iters_per_pass=2) is not None
    for nout in (5,):
        want = unpack_carry(
            jnp.stack(stokes3d_chunk_canvas(carry, co, inv_di, nout)), *ni
        )
        got = unpack_carry(
            jnp.stack(stokes3d_chunk_blocked(
                carry, co, inv_di, nout, interpret=True,
                plane_block=8, iters_per_pass=2, pipeline=pipeline,
            )), *ni,
        )
        for name, a, b in zip(NAMES, want, got):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-12, atol=1e-14,
                err_msg=f"{name} (ve={ve}, pipeline={pipeline})",
            )


@pytest.mark.parametrize("ve", [False, True])
def test_blocked3d_y_blocked_matches_canvas(ve):
    """(x, y)-blocked windows (nby > 1, r05 — the past-VMEM-residency
    path for 254³-class grids) == the XLA canvas chunk. Forces y_block=16
    on a 30-cell y axis → 2 y-blocks with 2·H halos and a sublane-aligned
    window."""
    ni = (22, 30, 7)
    nx, ny, nz = ni
    geometry = Geometry(ni, (1.0, 1.3, 0.8))
    pt = PTStokesCoeffs.make(geometry.li, geometry.di, CFL=0.9 / math.sqrt(3.1))
    fields, (eta, fx, fy, fz) = _random_state(ni, seed=11)
    eta_tau = maxloc(eta, window=1)
    inv_di = tuple(1.0 / d for d in geometry.di)
    kw = {}
    if ve:
        rng = np.random.default_rng(3)

        def r(*shape):
            return jnp.asarray(rng.standard_normal(shape)) * 0.1

        kw = dict(
            G=jnp.exp(r(*ni) + 1.0), K=jnp.exp(r(*ni) + 2.0),
            P0=r(*ni), Q=r(*ni),
            tau_o=(r(*ni), r(*ni), r(*ni), r(nx, ny + 1, nz + 1),
                   r(nx + 1, ny, nz + 1), r(nx + 1, ny + 1, nz)),
            dt=0.5,
        )
    co = ve3d_canvas_coefficients(
        eta, eta_tau, float(pt.r), float(pt.theta_dtau), float(pt.etadtau),
        fx=fx, fy=fy, fz=fz, **kw,
    )
    carry = tuple(pack_carry(*fields))
    blocking = choose_blocking_3d(nx, ny, nz, 11, 8, plane_block=8,
                                  iters_per_pass=2, y_block=16)
    assert blocking is not None and blocking[6] == 2  # nby == 2
    for nout in (5,):
        want = unpack_carry(
            jnp.stack(stokes3d_chunk_canvas(carry, co, inv_di, nout)), *ni
        )
        got = unpack_carry(
            jnp.stack(stokes3d_chunk_blocked(
                carry, co, inv_di, nout, interpret=True,
                plane_block=8, iters_per_pass=2, y_block=16,
            )), *ni,
        )
        for name, a, b in zip(NAMES, want, got):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-12, atol=1e-14,
                err_msg=f"{name} (y-blocked, ve={ve})",
            )


def test_blocked3d_derive_viscous_matches_canvas():
    """The derive-in-kernel viscous-coefficient path (streams only η, ητ, f)
    == the streamed-coefficient path == the XLA canvas chunk."""
    ni = (22, 9, 7)
    nx, ny, nz = ni
    geometry = Geometry(ni, (1.0, 1.3, 0.8))
    pt = PTStokesCoeffs.make(geometry.li, geometry.di, CFL=0.9 / math.sqrt(3.1))
    fields, (eta, fx, fy, fz) = _random_state(ni, seed=4)
    eta_tau = maxloc(eta, window=1)
    inv_di = tuple(1.0 / d for d in geometry.di)
    co = ve3d_canvas_coefficients(
        eta, eta_tau, float(pt.r), float(pt.theta_dtau), float(pt.etadtau),
        fx=fx, fy=fy, fz=fz,
    )
    carry = tuple(pack_carry(*fields))
    want = unpack_carry(
        jnp.stack(stokes3d_chunk_canvas(carry, co, inv_di, 5)), *ni
    )
    got = unpack_carry(
        jnp.stack(stokes3d_chunk_blocked(
            carry, None, inv_di, 5, interpret=True,
            plane_block=8, iters_per_pass=2, pipeline=False,
            viscous_consts=(eta, eta_tau, fx, fy, fz),
            pt_scalars=(
                float(pt.r) / float(pt.theta_dtau), float(pt.theta_dtau),
                float(pt.etadtau),
            ),
        )), *ni,
    )
    for name, a, b in zip(NAMES, want, got):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-12, atol=1e-14,
            err_msg=f"{name} (derive_viscous)",
        )


@pytest.mark.slow
def test_solve_ve_3d_use_pallas_matches_xla():
    """solve_ve_3d(use_pallas=True) through the full solver loop == the
    slice/pad XLA path at a forced fixed iteration count (interpret mode)."""
    from justrelax_tpu.core.state import StokesState
    from justrelax_tpu.ops.bc import Faces, VelocityBoundaryConditions
    from justrelax_tpu.solvers.stokes3d import solve_ve_3d

    n = 14
    ni = (n, n, n)
    geometry = Geometry(ni, (1.0, 1.0, 1.0))
    pt = PTStokesCoeffs.make(geometry.li, geometry.di, eps_abs=0.0, eps_rel=0.0)
    rng = np.random.default_rng(0)
    eta = jnp.asarray(np.exp(0.3 * rng.normal(size=ni)))
    fz = jnp.asarray(rng.normal(size=ni))
    Z = jnp.zeros(ni)
    stokes = StokesState.make(ni)
    stokes = stokes.replace(viscosity=stokes.viscosity.replace(eta=eta))
    bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True,
                        front=True, back=True)
    )
    G = jnp.full(ni, 4.0)
    K = jnp.full(ni, 9.0)
    args = (stokes, pt, geometry, bc, (Z, Z, fz), G, K, 0.5)
    kwargs = dict(iter_max=60, nout=30)
    ref, i_ref = solve_ve_3d(*args, **kwargs)
    out, i_out = solve_ve_3d(*args, use_pallas=True, **kwargs)
    assert int(i_ref.iters) == int(i_out.iters)
    np.testing.assert_allclose(
        np.asarray(ref.V.Vz), np.asarray(out.V.Vz), rtol=1e-11, atol=1e-14
    )
    np.testing.assert_allclose(
        np.asarray(ref.P), np.asarray(out.P), rtol=1e-11, atol=1e-13
    )
    np.testing.assert_allclose(
        np.asarray(ref.tau.yz), np.asarray(out.tau.yz), rtol=1e-11, atol=1e-14
    )
