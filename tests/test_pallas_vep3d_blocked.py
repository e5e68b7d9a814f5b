"""Blocked 3D VEP Pallas kernel == canvas chunk == serial composition.

The blocked kernel (ops/pallas_stokes3d_vep_blocked.py) streams x-slabs
through the SAME iteration body the XLA canvas family runs
(ops/stokes3d_vep_canvas.py::iteration_vep3d_canvas, shift="roll") with
scalar plastic parameters (phase-uniform guard) and in-VMEM re-derived
τ_o edge interpolants. Owned planes must equal the full-canvas result
bitwise; vs the serial staggered composition the agreement is roundoff
(the canvas path is already proven equal in tests/test_vep3d_canvas.py).
Interpret mode (CPU); the real-chip compile/measure record lives in
docs/performance.md.
"""

import math

import jax
import numpy as np

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import pytest  # noqa: E402

from justrelax_tpu.core.coeffs import PTStokesCoeffs  # noqa: E402
from justrelax_tpu.core.grid import Geometry  # noqa: E402
from justrelax_tpu.ops.bc import (  # noqa: E402
    Faces,
    VelocityBoundaryConditions,
    flow_bcs,
)
from justrelax_tpu.ops.pallas_stokes3d_vep_blocked import (  # noqa: E402
    stokes3d_vep_chunk_blocked,
    vep3d_blocked_supported,
)
from justrelax_tpu.ops.stokes3d_vep_canvas import (  # noqa: E402
    VEP3DCanvasCarry,
    embed_center,
    embed_edge,
    vep3d_canvas_consts,
    vep3d_chunk_canvas,
)
from justrelax_tpu.rheology.materials import Material, MaterialStack  # noqa: E402
from justrelax_tpu.rheology.phases import phase_ratios_from_field  # noqa: E402


def _setup(n=10, plastic=True, dtype=jnp.float64):
    ni = (n, n, n)
    geometry = Geometry(ni, (1.0, 1.0, 1.0))
    inv_di = tuple(1.0 / d for d in geometry.di)
    C = (0.2 if plastic else 1.0e9) / math.cos(math.radians(30.0))
    common = dict(rho0=0.0, Kb=4.0, is_plastic=1.0, C=C,
                  friction_angle=30.0, dilation_angle=0.0, eta_reg=1.25e-2)
    material = MaterialStack.make([
        Material(G=1.0, eta0=1.0, **common),
        Material(G=0.5, eta0=0.1, **common),
    ])
    assert vep3d_blocked_supported(material)
    X, Y, Zc = np.meshgrid(*[np.asarray(c) for c in geometry.xci],
                           indexing="ij")
    inside = (X - 0.5) ** 2 + (Y - 0.5) ** 2 + (Zc - 0.5) ** 2 <= 0.04
    pr = phase_ratios_from_field(jnp.asarray(inside.astype(int)), 2)
    pt = PTStokesCoeffs.make(geometry.li, geometry.di,
                             CFL=0.75 / math.sqrt(3.1))
    bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True,
                        front=True, back=True))
    xv = jnp.asarray(geometry.xvi[0], dtype)
    zv = jnp.asarray(geometry.xvi[2], dtype)
    Vx = jnp.broadcast_to(xv[:, None, None], (n + 1, n + 2, n + 2)).astype(dtype)
    Vy = jnp.zeros((n + 2, n + 1, n + 2), dtype)
    Vz = jnp.broadcast_to((-zv)[None, None, :], (n + 2, n + 2, n + 1)).astype(dtype)
    Vx, Vy, Vz = flow_bcs((Vx, Vy, Vz), bc)
    eta0 = jnp.where(jnp.asarray(inside), 0.1, 1.0).astype(dtype)
    Z = jnp.zeros(ni, dtype)
    tyz = jnp.zeros((n, n + 1, n + 1), dtype)
    txz = jnp.zeros((n + 1, n, n + 1), dtype)
    txy = jnp.zeros((n + 1, n + 1, n), dtype)
    txx_o = jnp.full(ni, 0.3 if plastic else 0.0, dtype)
    carry = VEP3DCanvasCarry(
        V=(jnp.pad(Vx, ((0, 1), (0, 0), (0, 0))),
           jnp.pad(Vy, ((0, 0), (0, 1), (0, 0))),
           jnp.pad(Vz, ((0, 0), (0, 0), (0, 1)))),
        P=embed_center(Z), theta=embed_center(Z),
        tau_c=tuple(embed_center(Z) for _ in range(6)),
        tau_e=tuple(embed_edge(t, k) for k, t in enumerate((tyz, txz, txy))),
        eta=embed_center(eta0),
        lam=embed_center(Z),
        lam_e=tuple(embed_edge(t, k) for k, t in enumerate((tyz, txz, txy))),
    )
    consts_kw = dict(
        material=material,
        tau_o_c6=(txx_o, -txx_o, Z, Z, Z, Z), tau_o_e3=(tyz, txz, txy),
        EII_pl=Z, P0=Z, Q=Z,
        phase_ratios_center=pr.center,
        phase_ratios_edges=(pr.edge_yz, pr.edge_xz, pr.edge_xy),
    )
    kw = dict(dt=jnp.asarray(0.125, dtype), r=pt.r,
              theta_dtau=pt.theta_dtau, etadtau=pt.etadtau,
              lambda_relaxation=0.2, viscosity_relaxation=1.0e-2)
    return material, carry, consts_kw, inv_di, kw


# Tolerances: the k-blocking itself is bitwise (same body, owned planes ==
# full canvas). The scalar-plastic collapse is exact in exact arithmetic but
# differs from the ratio blend by f64 associativity at mixed-ratio cells
# ((r0 + r1)·x vs 1·x) — observed ≤3e-11 over 5 iterations; assert ≤1e-9.
_ATOL = {False: 1e-14, True: 1e-9}


@pytest.mark.parametrize("plastic", [False, True])
@pytest.mark.parametrize("nit", [1, 5])
def test_blocked_matches_canvas_chunk(plastic, nit):
    material, carry, ckw, inv_di, kw = _setup(plastic=plastic)
    co_ref = vep3d_canvas_consts(**ckw)
    want = vep3d_chunk_canvas(carry, co_ref, material, inv_di, nit, **kw)

    co_blk = vep3d_canvas_consts(**ckw, hoist_tau_o=False,
                                 scalar_plastic=True, scalar_K=True)
    got = stokes3d_vep_chunk_blocked(
        carry, co_blk, inv_di, nit, interpret=True,
        plane_block=4, iters_per_pass=1, **kw,
    )
    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=0, atol=_ATOL[plastic])
    if plastic and nit == 5:
        assert float(jnp.max(want.lam)) > 0.0  # plastic branch exercised


def test_blocked_xy_matches_canvas_chunk():
    """2D-blocked (x AND y windows) == canvas chunk — exercises the y_off
    band offsets and the 3x3 predicated store grid."""
    material, carry, ckw, inv_di, kw = _setup(n=14, plastic=True)
    co_ref = vep3d_canvas_consts(**ckw)
    want = vep3d_chunk_canvas(carry, co_ref, material, inv_di, 3, **kw)
    co_blk = vep3d_canvas_consts(**ckw, hoist_tau_o=False,
                                 scalar_plastic=True, scalar_K=True)
    got = stokes3d_vep_chunk_blocked(
        carry, co_blk, inv_di, 3, interpret=True,
        plane_block=6, y_block=6, iters_per_pass=1, **kw,
    )
    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=0, atol=_ATOL[True])


def test_blocked_k2_matches_canvas_chunk():
    material, carry, ckw, inv_di, kw = _setup(n=14, plastic=True)
    co_ref = vep3d_canvas_consts(**ckw)
    want = vep3d_chunk_canvas(carry, co_ref, material, inv_di, 4, **kw)
    co_blk = vep3d_canvas_consts(**ckw, hoist_tau_o=False,
                                 scalar_plastic=True)
    got = stokes3d_vep_chunk_blocked(
        carry, co_blk, inv_di, 4, interpret=True,
        plane_block=6, iters_per_pass=2, **kw,
    )
    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=0, atol=_ATOL[True])


def test_blocked_scalar_params_ulp_vs_scalar_canvas():
    """With the SAME scalar-plastic consts the blocking agrees to 1 ulp —
    isolates the k-blocking from the (associativity-level) params collapse.
    (Observed: 2/1728 elements at exactly 1 ulp after 3 iterations —
    window-shape-dependent FMA/reassociation in the interpret-mode XLA CPU
    executor, not halo contamination, which would be O(1).)"""
    material, carry, ckw, inv_di, kw = _setup(plastic=True)
    co_blk = vep3d_canvas_consts(**ckw, hoist_tau_o=False,
                                 scalar_plastic=True)
    want = vep3d_chunk_canvas(carry, co_blk, material, inv_di, 3, **kw)
    got = stokes3d_vep_chunk_blocked(
        carry, co_blk, inv_di, 3, interpret=True,
        plane_block=4, iters_per_pass=1, **kw,
    )
    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-15, atol=1e-300)
