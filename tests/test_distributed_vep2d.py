"""Distributed 2D VEP Stokes == serial (the flagship solver under domain
decomposition).

An 8-device mesh solve of the shearband-style two-phase Drucker-Prager
problem must reproduce the single-device serial solver (solvers/
stokes2d_vep.py) to roundoff across multiple loading steps — including after
yield, when the clamped center→vertex interpolation of the fused stress
kernel is exercised at block boundaries. Covers the reference multi-phase 2D
driver (Stokes2D.jl:577-883) run under ImplicitGlobalGrid/MPI
(test_shearband2D_MPI.jl is the reference analogue).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from justrelax_tpu.core.coeffs import PTStokesCoeffs
from justrelax_tpu.core.grid import Geometry
from justrelax_tpu.core.state import StokesState
from justrelax_tpu.ops.bc import Faces, VelocityBoundaryConditions, flow_bcs
from justrelax_tpu.parallel.decomp import Decomp2D, block_staggered, unblock_staggered
from justrelax_tpu.parallel.stokes2d_vep import solve_vep_sharded
from justrelax_tpu.rheology.materials import Material, MaterialStack
from justrelax_tpu.solvers.stokes2d_vep import solve_vep

EXTRAS = {
    "Vx": (1, 2), "Vy": (2, 1),
    "P": (0, 0), "Q": (0, 0),
    "txx": (0, 0), "tyy": (0, 0), "txy_c": (0, 0), "txy_v": (1, 1),
    "EII_pl": (0, 0), "eta": (0, 0), "eta_v": (1, 1),
    "lam": (0, 0), "lam_v": (1, 1), "tau_II": (0, 0), "eta_vep": (0, 0),
}
for k in ("txx", "tyy", "txy_c", "txy_v"):
    EXTRAS[k + "_o"] = EXTRAS[k]


def _setup(ni):
    geometry = Geometry(ni, (1.0, 1.0))
    tau_y, phi = 0.8, 30.0
    common = dict(rho0=0.0, Kb=4.0, eta0=1.0, is_plastic=1.0,
                  C=tau_y / math.cos(math.radians(phi)),
                  friction_angle=phi, eta_reg=8.0e-3)
    mat = MaterialStack.make([Material(G=1.0, **common),
                              Material(G=0.5, **common)])

    def circle(xs, ys):
        X, Y = np.meshgrid(np.asarray(xs), np.asarray(ys), indexing="ij")
        # off-center so the weak inclusion straddles block boundaries
        inside = (X - 0.45) ** 2 + (Y - 0.6) ** 2 <= 0.22**2
        ratios = np.zeros(X.shape + (2,))
        ratios[..., 0] = ~inside
        ratios[..., 1] = inside
        return jnp.asarray(ratios)

    pr_c = circle(geometry.xci[0], geometry.xci[1])
    pr_v = circle(geometry.xvi[0], geometry.xvi[1])
    pt = PTStokesCoeffs.make(
        geometry.li, geometry.di, eps_rel=1.0e-30, eps_abs=1.0e-30,
        CFL=0.75 / math.sqrt(2.1),
    )
    bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True)
    )
    xv = jnp.asarray(geometry.xvi[0])
    yv = jnp.asarray(geometry.xvi[1])
    Vx = jnp.broadcast_to(xv[:, None], (ni[0] + 1, ni[1] + 2))
    Vy = jnp.broadcast_to(-yv[None, :], (ni[0] + 2, ni[1] + 1))
    Vx, Vy = flow_bcs((Vx, Vy), bc)
    return geometry, mat, pr_c, pr_v, pt, bc, Vx, Vy


@pytest.mark.slow
@pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 2)])
def test_distributed_vep2d_matches_serial(mesh_shape):
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = jax.sharding.Mesh(
        np.array(devs[:8]).reshape(mesh_shape), axis_names=("x", "y")
    )
    ni = (16, 16)
    nt, dt = 3, 0.25
    geometry, mat, pr_c, pr_v, pt, bc, Vx0, Vy0 = _setup(ni)

    # --- serial reference: nt loading steps, fixed 300 iters each ----------
    stokes = StokesState.make(ni)
    stokes = stokes.replace(
        viscosity=stokes.viscosity.replace(
            eta=jnp.ones(ni), eta_v=jnp.ones((ni[0] + 1, ni[1] + 1))
        ),
        V=stokes.V.replace(Vx=Vx0, Vy=Vy0),
    )
    serial = []
    for _ in range(nt):
        stokes, info = solve_vep(
            stokes, pt, geometry, bc, mat, pr_c, pr_v, dt,
            iter_max=300, iter_min=100, nout=100,
        )
        serial.append(stokes)
    assert int(info.iters) == 300
    assert float(jnp.max(stokes.lam)) > 0.0  # plasticity engaged

    # --- distributed: same steps on the mesh -------------------------------
    dec = Decomp2D.make(ni, mesh_shape)

    def B(A, key):
        return jnp.asarray(block_staggered(np.asarray(A), dec, EXTRAS[key]))

    zc = np.zeros(ni)
    zv = np.zeros((ni[0] + 1, ni[1] + 1))
    blocks = {
        "Vx": B(Vx0, "Vx"), "Vy": B(Vy0, "Vy"),
        "P": B(zc, "P"), "Q": B(zc, "Q"),
        "EII_pl": B(zc, "EII_pl"),
        "eta": B(np.ones(ni), "eta"),
        "eta_v": B(np.ones_like(zv), "eta_v"),
        "inv_dx": 1.0 / geometry.di[0],
        "inv_dy": 1.0 / geometry.di[1],
    }
    for k in ("txx", "tyy", "txy_c"):
        blocks[k] = B(zc, k)
        blocks[k + "_o"] = B(zc, k)
    blocks["txy_v"] = B(zv, "txy_v")
    blocks["txy_v_o"] = B(zv, "txy_v")
    nl, p = dec.ni_local, (dec.px, dec.py)
    from justrelax_tpu.parallel.decomp import block_staggered_nd

    blocks["pr_c"] = jnp.asarray(block_staggered_nd(
        np.asarray(pr_c), nl + (2,), p + (1,), (0, 0, 0)
    ))
    blocks["pr_v"] = jnp.asarray(block_staggered_nd(
        np.asarray(pr_v), nl + (2,), p + (1,), (1, 1, 0)
    ))

    with mesh:
        for step in range(nt):
            res = solve_vep_sharded(
                mesh, dec, blocks, pt, bc, mat, dt,
                iter_max=300, iter_min=100, nout=100,
            )
            for k in ("Vx", "Vy", "P", "eta", "eta_v",
                      "txx", "tyy", "txy_c", "txy_v"):
                blocks[k] = getattr(res, k)
            for k in ("txx", "tyy", "txy_c", "txy_v"):
                blocks[k + "_o"] = getattr(res, k)
            blocks["EII_pl"] = B(serial[step].EII_pl, "EII_pl")

            s_ref = serial[step]
            for name, ref in (
                ("Vx", s_ref.V.Vx), ("Vy", s_ref.V.Vy), ("P", s_ref.P),
                ("txx", s_ref.tau.xx), ("tyy", s_ref.tau.yy),
                ("txy_v", s_ref.tau.xy), ("txy_c", s_ref.tau.xy_c),
                ("tau_II", s_ref.tau.II), ("lam", s_ref.lam),
                ("lam_v", s_ref.lam_v), ("eta", s_ref.viscosity.eta),
            ):
                dist = unblock_staggered(
                    np.asarray(getattr(res, name)), dec, EXTRAS[name]
                )
                np.testing.assert_allclose(
                    dist, np.asarray(ref), atol=2e-13,
                    err_msg=f"step {step}: {name} mismatch vs serial",
                )

    lam = unblock_staggered(np.asarray(res.lam), dec, (0, 0))
    assert lam.max() > 0.0
