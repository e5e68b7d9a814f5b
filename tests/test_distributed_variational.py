"""Distributed 2D variational (sticky-air) Stokes == serial.

An 8-device mesh solve of the sticky-air free-surface problem (dense blob in
fluid under an air layer) must reproduce the serial variational solver
(solvers/stokes2d_variational.py) to roundoff — the ϕ-weighted masked
stencils and validity-mask nullspace handling exercised across block
boundaries. Covers the reference ``solve_VariationalStokes!``
(variational_stokes/Stokes2D.jl:24-333) run under ImplicitGlobalGrid/MPI.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from justrelax_tpu.core.coeffs import PTStokesCoeffs
from justrelax_tpu.core.grid import Geometry
from justrelax_tpu.core.state import StokesState
from justrelax_tpu.ops.bc import Faces, VelocityBoundaryConditions
from justrelax_tpu.ops.rock_ratio import update_rock_ratio, valid_masks
from justrelax_tpu.parallel.decomp import (
    Decomp2D,
    block_staggered,
    block_staggered_nd,
    unblock_staggered,
)
from justrelax_tpu.parallel.stokes2d_variational import solve_variational_sharded
from justrelax_tpu.rheology.materials import Material, MaterialStack
from justrelax_tpu.rheology.phases import phase_ratios_from_field
from justrelax_tpu.solvers.stokes2d_variational import solve_variational

EXTRAS = {
    "Vx": (1, 2), "Vy": (2, 1),
    "P": (0, 0), "Q": (0, 0),
    "txx": (0, 0), "tyy": (0, 0), "txy_c": (0, 0), "txy_v": (1, 1),
    "EII_pl": (0, 0), "eta": (0, 0), "eta_v": (1, 1),
    "phi_c": (0, 0), "phi_v": (1, 1),
    "vm_c": (0, 0), "vm_v": (1, 1), "vm_vx": (1, 0), "vm_vy": (0, 1),
    "lam": (0, 0), "lam_v": (1, 1), "tau_II": (0, 0),
}
for k in ("txx", "tyy", "txy_c", "txy_v"):
    EXTRAS[k + "_o"] = EXTRAS[k]


@pytest.mark.slow
def test_distributed_variational_matches_serial():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh_shape = (2, 4)
    mesh = jax.sharding.Mesh(
        np.array(devs[:8]).reshape(mesh_shape), axis_names=("x", "y")
    )
    ni = (16, 16)
    geom = Geometry(ni, (1.0, 1.0))
    X, Y = (np.asarray(A) for A in geom.cell_centers_mesh())
    phase = np.zeros(ni, dtype=int)
    phase[Y > 0.75] = 1  # air
    phase[(X - 0.45) ** 2 + (Y - 0.4) ** 2 <= 0.15**2] = 2  # dense blob
    pr = phase_ratios_from_field(jnp.asarray(phase), 3)
    phi = update_rock_ratio(pr, air_phase=1)
    vm = valid_masks(phi)

    mats = MaterialStack.make([
        Material(rho0=1.0, eta0=1.0, gravity=10.0),
        Material(rho0=0.0, eta0=1.0e-3, gravity=10.0),  # air
        Material(rho0=2.0, eta0=1.0, gravity=10.0),
    ])
    pt = PTStokesCoeffs.make(
        geom.li, geom.di, eps_rel=1.0e-30, eps_abs=1.0e-30,
        CFL=1.0 / math.sqrt(2.1),
    )
    bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True)
    )

    # --- serial reference: fixed 400 iters ---------------------------------
    s0 = StokesState.make(ni)
    s_ref, info = solve_variational(
        s0, pt, geom, bc, mats, pr.center, pr.vertex, phi, jnp.inf,
        iter_max=400, iter_min=100, nout=200,
    )
    assert int(info.iters) == 400

    # --- distributed -------------------------------------------------------
    dec = Decomp2D.make(ni, mesh_shape)

    def B(A, key):
        return jnp.asarray(block_staggered(np.asarray(A), dec, EXTRAS[key]))

    zc = np.zeros(ni)
    zv = np.zeros((ni[0] + 1, ni[1] + 1))
    blocks = {
        "Vx": B(np.zeros((ni[0] + 1, ni[1] + 2)), "Vx"),
        "Vy": B(np.zeros((ni[0] + 2, ni[1] + 1)), "Vy"),
        "P": B(zc, "P"), "Q": B(zc, "Q"),
        "EII_pl": B(zc, "EII_pl"),
        "eta": B(np.ones(ni), "eta"), "eta_v": B(np.ones_like(zv), "eta_v"),
        "phi_c": B(phi.center, "phi_c"), "phi_v": B(phi.vertex, "phi_v"),
        "vm_c": B(vm.c, "vm_c"), "vm_v": B(vm.v, "vm_v"),
        "vm_vx": B(vm.vx, "vm_vx"), "vm_vy": B(vm.vy, "vm_vy"),
        "inv_dx": 1.0 / geom.di[0], "inv_dy": 1.0 / geom.di[1],
    }
    for k in ("txx", "tyy", "txy_c"):
        blocks[k] = B(zc, k)
        blocks[k + "_o"] = B(zc, k)
    blocks["txy_v"] = B(zv, "txy_v")
    blocks["txy_v_o"] = B(zv, "txy_v")
    nl, p = dec.ni_local, (dec.px, dec.py)
    blocks["pr_c"] = jnp.asarray(block_staggered_nd(
        np.asarray(pr.center), nl + (3,), p + (1,), (0, 0, 0)
    ))
    blocks["pr_v"] = jnp.asarray(block_staggered_nd(
        np.asarray(pr.vertex), nl + (3,), p + (1,), (1, 1, 0)
    ))

    with mesh:
        res = solve_variational_sharded(
            mesh, dec, blocks, pt, bc, mats, jnp.inf,
            iter_max=400, iter_min=100, nout=200,
        )

    for name, ref in (
        ("Vx", s_ref.V.Vx), ("Vy", s_ref.V.Vy), ("P", s_ref.P),
        ("txx", s_ref.tau.xx), ("tyy", s_ref.tau.yy),
        ("txy_v", s_ref.tau.xy), ("txy_c", s_ref.tau.xy_c),
        ("tau_II", s_ref.tau.II), ("eta", s_ref.viscosity.eta),
        ("lam", s_ref.lam),
    ):
        dist = unblock_staggered(np.asarray(getattr(res, name)), dec, EXTRAS[name])
        np.testing.assert_allclose(
            dist, np.asarray(ref), atol=2e-13,
            err_msg=f"{name} mismatch distributed vs serial",
        )
