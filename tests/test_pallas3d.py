"""Strip-mined Pallas 3D fused-iteration kernel == serial op composition.

Runs in interpret mode (f64, CPU): one stokes3d_iteration_strips call must
reproduce compute_grad_V_3d → compute_P → compute_strain_rate_3d →
compute_tau_ve_3d → compute_V_3d → flow_bcs(free-slip) to roundoff, for
several grid sizes / slab widths (odd local offsets at the first/last slab).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from justrelax_tpu.core.coeffs import PTStokesCoeffs
from justrelax_tpu.core.grid import Geometry
from justrelax_tpu.ops import stokes3d as k3
from justrelax_tpu.ops.bc import Faces, VelocityBoundaryConditions, flow_bcs
from justrelax_tpu.ops.pallas_stokes3d import (
    pack_carry,
    pack_consts,
    stokes3d_iteration_strips,
    unpack_carry,
)
from justrelax_tpu.ops.stencil import maxloc
from justrelax_tpu.ops.stokes import compute_P


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


def _serial_iteration(fields, consts, geometry, pt):
    Vx, Vy, Vz, P, txx, tyy, tzz, tyz, txz, txy = fields
    eta, fx, fy, fz = consts
    inv_di = tuple(1.0 / d for d in geometry.di)
    eta_tau = maxloc(eta, window=1)
    Z = jnp.zeros_like(P)
    G = jnp.full_like(P, jnp.inf)
    K = jnp.full_like(P, jnp.inf)
    dt = jnp.asarray(jnp.inf)
    bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True,
                        front=True, back=True)
    )
    grad_V = k3.compute_grad_V_3d(Vx, Vy, Vz, inv_di)
    _, P = compute_P(P, Z, grad_V, Z, eta_tau, K, G, dt, pt.r, pt.theta_dtau)
    eps = k3.compute_strain_rate_3d(grad_V, Vx, Vy, Vz, inv_di)
    tau = k3.compute_tau_ve_3d(
        (txx, tyy, tzz, tyz, txz, txy),
        (Z, Z, Z, jnp.zeros_like(tyz), jnp.zeros_like(txz), jnp.zeros_like(txy)),
        eps, eta, G, pt.theta_dtau, dt,
    )
    Vx, Vy, Vz, *_ = k3.compute_V_3d(
        Vx, Vy, Vz, P, tau, fx, fy, fz, eta_tau, pt.etadtau, inv_di
    )
    Vx, Vy, Vz = flow_bcs((Vx, Vy, Vz), bc)
    txx, tyy, tzz, tyz, txz, txy = tau
    return Vx, Vy, Vz, P, txx, tyy, tzz, tyz, txz, txy


@pytest.mark.parametrize("ni,B", [((14, 10, 12), 8), ((14, 10, 12), 4), ((22, 9, 7), 8)])
def test_pallas3d_matches_serial_iteration(ni, B):
    geometry = Geometry(ni, (1.0, 1.3, 0.8))
    pt = PTStokesCoeffs.make(geometry.li, geometry.di, CFL=0.9 / math.sqrt(3.1))
    fields, (eta, fx, fy, fz) = _random_state(ni)
    eta_tau = maxloc(eta, window=1)

    want = _serial_iteration(fields, (eta, fx, fy, fz), geometry, pt)

    carry = pack_carry(*fields)
    const = pack_consts(eta, eta_tau, fx, fy, fz)
    inv_di = tuple(1.0 / d for d in geometry.di)
    out = stokes3d_iteration_strips(
        carry, const, inv_di,
        float(pt.r), float(pt.theta_dtau), float(pt.etadtau),
        B=B, interpret=True,
    )
    got = unpack_carry(out, *ni)
    names = ("Vx", "Vy", "Vz", "P", "txx", "tyy", "tzz", "tyz", "txz", "txy")
    for name, a, b in zip(names, want, got):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=2e-13,
            err_msg=f"pallas3d mismatch in {name}",
        )


def test_pallas3d_chained_iterations_match():
    """5 chained kernel calls == 5 serial iterations (carry layout stable)."""
    ni = (14, 10, 12)
    geometry = Geometry(ni, (1.0, 1.0, 1.0))
    pt = PTStokesCoeffs.make(geometry.li, geometry.di, CFL=0.9 / math.sqrt(3.1))
    fields, (eta, fx, fy, fz) = _random_state(ni, seed=3)
    eta_tau = maxloc(eta, window=1)
    inv_di = tuple(1.0 / d for d in geometry.di)

    want = fields
    for _ in range(5):
        want = _serial_iteration(want, (eta, fx, fy, fz), geometry, pt)

    carry = pack_carry(*fields)
    const = pack_consts(eta, eta_tau, fx, fy, fz)
    for _ in range(5):
        carry = stokes3d_iteration_strips(
            carry, const, inv_di,
            float(pt.r), float(pt.theta_dtau), float(pt.etadtau),
            B=8, interpret=True,
        )
    got = unpack_carry(carry, *ni)
    for a, b in zip(want, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=1e-12)


def test_pallas3d_rejects_bad_slab():
    fields, (eta, fx, fy, fz) = _random_state((14, 10, 12))
    carry = pack_carry(*fields)
    const = pack_consts(eta, maxloc(eta, window=1), fx, fy, fz)
    with pytest.raises(ValueError, match="not divisible"):
        stokes3d_iteration_strips(carry, const, (1.0, 1.0, 1.0), 0.7, 1.0, 1.0, B=5)


@pytest.mark.parametrize("ni,B", [((14, 10, 12), 8), ((22, 9, 7), 8), ((14, 10, 12), 4)])
def test_pallas3d_planes_matches_serial_iteration(ni, B):
    """Plane-revolving v2 kernel == the same serial composition."""
    from justrelax_tpu.ops.pallas_stokes3d import stokes3d_iteration_planes

    geometry = Geometry(ni, (1.0, 1.3, 0.8))
    pt = PTStokesCoeffs.make(geometry.li, geometry.di, CFL=0.9 / math.sqrt(3.1))
    fields, (eta, fx, fy, fz) = _random_state(ni, seed=11)
    eta_tau = maxloc(eta, window=1)

    want = _serial_iteration(fields, (eta, fx, fy, fz), geometry, pt)
    carry = pack_carry(*fields)
    const = pack_consts(eta, eta_tau, fx, fy, fz)
    inv_di = tuple(1.0 / d for d in geometry.di)
    out = stokes3d_iteration_planes(
        carry, const, inv_di,
        float(pt.r), float(pt.theta_dtau), float(pt.etadtau),
        B=B, interpret=True,
    )
    got = unpack_carry(out, *ni)
    names = ("Vx", "Vy", "Vz", "P", "txx", "tyy", "tzz", "tyz", "txz", "txy")
    for name, a, b in zip(names, want, got):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=2e-13,
            err_msg=f"pallas3d-planes mismatch in {name}",
        )


def test_pallas3d_planes_chained():
    from justrelax_tpu.ops.pallas_stokes3d import stokes3d_iteration_planes

    ni = (14, 10, 12)
    geometry = Geometry(ni, (1.0, 1.0, 1.0))
    pt = PTStokesCoeffs.make(geometry.li, geometry.di, CFL=0.9 / math.sqrt(3.1))
    fields, (eta, fx, fy, fz) = _random_state(ni, seed=5)
    eta_tau = maxloc(eta, window=1)
    inv_di = tuple(1.0 / d for d in geometry.di)

    want = fields
    for _ in range(4):
        want = _serial_iteration(want, (eta, fx, fy, fz), geometry, pt)
    carry = pack_carry(*fields)
    const = pack_consts(eta, eta_tau, fx, fy, fz)
    for _ in range(4):
        carry = stokes3d_iteration_planes(
            carry, const, inv_di,
            float(pt.r), float(pt.theta_dtau), float(pt.etadtau),
            B=8, interpret=True,
        )
    got = unpack_carry(carry, *ni)
    for a, b in zip(want, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=1e-12)
