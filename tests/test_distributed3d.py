"""Distributed 3D Stokes == serial (the 3D MPI-parity analogue).

An 8-device (2, 2, 2) mesh solve of a heterogeneous buoyancy problem must
reproduce the single-device serial solver bit-for-bit (up to roundoff).
Covers reference Stokes3D.jl + ImplicitGlobalGrid halo updates in 3D.
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
from justrelax_tpu.parallel.decomp import (
    Decomp3D,
    block_staggered_nd,
    unblock_staggered_nd,
)
from justrelax_tpu.parallel.stokes3d import solve_ve_sharded_3d
from justrelax_tpu.solvers.stokes3d import solve_ve_3d

# per-field per-axis surplus over owned cells (see core/state.py shapes)
EXTRAS = {
    "Vx": (1, 2, 2), "Vy": (2, 1, 2), "Vz": (2, 2, 1),
    "P": (0, 0, 0), "P0": (0, 0, 0), "Q": (0, 0, 0),
    "txx": (0, 0, 0), "tyy": (0, 0, 0), "tzz": (0, 0, 0),
    "tyz": (0, 1, 1), "txz": (1, 0, 1), "txy": (1, 1, 0),
    "txx_o": (0, 0, 0), "tyy_o": (0, 0, 0), "tzz_o": (0, 0, 0),
    "tyz_o": (0, 1, 1), "txz_o": (1, 0, 1), "txy_o": (1, 1, 0),
    "eta": (0, 0, 0), "G": (0, 0, 0), "K": (0, 0, 0),
    "fx": (0, 0, 0), "fy": (0, 0, 0), "fz": (0, 0, 0),
}


@pytest.mark.slow
@pytest.mark.parametrize("bc_kind", ["free_slip", "no_slip"])
def test_distributed3d_matches_serial(bc_kind):
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = jax.sharding.Mesh(
        np.array(devs[:8]).reshape(2, 2, 2), axis_names=("x", "y", "z")
    )

    ni = (16, 8, 8)
    geometry = Geometry(ni, (1.0, 1.0, 1.0))
    rng = np.random.default_rng(3)
    eta = np.exp(0.5 * rng.normal(size=ni))
    rho = 1.0 + 0.2 * rng.normal(size=ni)
    G = np.full(ni, 1.0)
    K = np.full(ni, np.inf)
    dt = jnp.inf

    all_faces = Faces(left=True, right=True, top=True, bot=True,
                      front=True, back=True)
    flow_bc = VelocityBoundaryConditions(**{bc_kind: all_faces})
    pt = PTStokesCoeffs.make(
        geometry.li, geometry.di, CFL=1.0 / math.sqrt(3.0),
        eps_rel=1.0e-30, eps_abs=1.0e-30,
    )

    # --- serial reference ---------------------------------------------------
    s = StokesState.make(ni)
    s = s.replace(viscosity=s.viscosity.replace(eta=jnp.asarray(eta)))
    zeros = jnp.zeros(ni)
    s_ref, info = solve_ve_3d(
        s, pt, geometry, flow_bc, (zeros, zeros, jnp.asarray(rho)),
        jnp.asarray(G), jnp.asarray(K), dt, iter_max=400, nout=200,
    )

    # --- distributed --------------------------------------------------------
    dec = Decomp3D.make(ni, (2, 2, 2))
    nl, p = dec.ni_local, dec.mesh_shape
    fields = {
        "Vx": np.zeros((ni[0] + 1, ni[1] + 2, ni[2] + 2)),
        "Vy": np.zeros((ni[0] + 2, ni[1] + 1, ni[2] + 2)),
        "Vz": np.zeros((ni[0] + 2, ni[1] + 2, ni[2] + 1)),
        "P": np.zeros(ni), "P0": np.zeros(ni), "Q": np.zeros(ni),
        "txx": np.zeros(ni), "tyy": np.zeros(ni), "tzz": np.zeros(ni),
        "tyz": np.zeros((ni[0], ni[1] + 1, ni[2] + 1)),
        "txz": np.zeros((ni[0] + 1, ni[1], ni[2] + 1)),
        "txy": np.zeros((ni[0] + 1, ni[1] + 1, ni[2])),
        "txx_o": np.zeros(ni), "tyy_o": np.zeros(ni), "tzz_o": np.zeros(ni),
        "tyz_o": np.zeros((ni[0], ni[1] + 1, ni[2] + 1)),
        "txz_o": np.zeros((ni[0] + 1, ni[1], ni[2] + 1)),
        "txy_o": np.zeros((ni[0] + 1, ni[1] + 1, ni[2])),
        "eta": eta, "G": G, "K": K,
        "fx": np.zeros(ni), "fy": np.zeros(ni), "fz": rho,
    }
    blocks = {
        k: jnp.asarray(block_staggered_nd(v, nl, p, EXTRAS[k]))
        for k, v in fields.items()
    }
    blocks["inv_dx"] = 1.0 / geometry.di[0]
    blocks["inv_dy"] = 1.0 / geometry.di[1]
    blocks["inv_dz"] = 1.0 / geometry.di[2]

    with mesh:
        res = solve_ve_sharded_3d(
            mesh, dec, blocks, pt, flow_bc, dt, iter_max=400, nout=200
        )

    for name, serial in (
        ("Vx", s_ref.V.Vx), ("Vy", s_ref.V.Vy), ("Vz", s_ref.V.Vz),
        ("P", s_ref.P), ("txy", s_ref.tau.xy), ("txz", s_ref.tau.xz),
        ("tyz", s_ref.tau.yz), ("txx", s_ref.tau.xx),
    ):
        dist = unblock_staggered_nd(
            np.asarray(getattr(res, name)), nl, p, EXTRAS[name]
        )
        np.testing.assert_allclose(
            dist, np.asarray(serial), atol=2e-13,
            err_msg=f"{name} mismatch distributed vs serial",
        )
