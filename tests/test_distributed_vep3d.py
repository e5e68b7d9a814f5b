"""Distributed 3D VEP Stokes == serial (plastic return mapping under
domain decomposition).

An 8-device (2, 2, 2) mesh solve of the pure-shear Drucker-Prager problem
(the test_vep3d capping setup) must reproduce the single-device serial
solver to roundoff across multiple loading steps — including after yield,
when the clamped center↔edge interpolation of the fused stress kernel is
exercised at block boundaries. Covers the reference 3D GeoParams driver
(Stokes3D.jl:204-660) run under ImplicitGlobalGrid/MPI.
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
from justrelax_tpu.parallel.decomp import (
    Decomp3D,
    block_staggered_nd,
    unblock_staggered_nd,
)
from justrelax_tpu.parallel.stokes3d_vep import solve_vep_sharded_3d
from justrelax_tpu.rheology.materials import Material, MaterialStack
from justrelax_tpu.solvers.stokes3d_vep import solve_vep_3d

EXTRAS = {
    "Vx": (1, 2, 2), "Vy": (2, 1, 2), "Vz": (2, 2, 1),
    "P": (0, 0, 0), "Q": (0, 0, 0),
    "txx": (0, 0, 0), "tyy": (0, 0, 0), "tzz": (0, 0, 0),
    "tyz_c": (0, 0, 0), "txz_c": (0, 0, 0), "txy_c": (0, 0, 0),
    "tyz": (0, 1, 1), "txz": (1, 0, 1), "txy": (1, 1, 0),
    "EII_pl": (0, 0, 0), "eta": (0, 0, 0),
}
for k in list(EXTRAS):
    if k.startswith("t") and not k.startswith("txx_o"):
        EXTRAS[k + "_o"] = EXTRAS[k]


def _pure_shear_xz(geometry, eps_bg):
    xv = jnp.asarray(geometry.xvi[0])
    zv = jnp.asarray(geometry.xvi[2])
    ni = geometry.ni
    Vx = jnp.broadcast_to(
        (eps_bg * xv)[:, None, None], (ni[0] + 1, ni[1] + 2, ni[2] + 2)
    )
    Vy = jnp.zeros((ni[0] + 2, ni[1] + 1, ni[2] + 2))
    Vz = jnp.broadcast_to(
        (-eps_bg * zv)[None, None, :], (ni[0] + 2, ni[1] + 2, ni[2] + 1)
    )
    bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True,
                        front=True, back=True)
    )
    return flow_bcs((Vx, Vy, Vz), bc), bc


@pytest.mark.slow
def test_distributed_vep3d_matches_serial():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = jax.sharding.Mesh(
        np.array(devs[:8]).reshape(2, 2, 2), axis_names=("x", "y", "z")
    )

    ni = (8, 8, 8)
    nt, dt = 3, 0.25
    geometry = Geometry(ni, (1.0, 1.0, 1.0))
    tau_y, phi_deg = 0.8, 30.0
    common = dict(Kb=4.0, eta0=1.0, is_plastic=1.0,
                  C=tau_y / math.cos(math.radians(phi_deg)),
                  friction_angle=phi_deg, eta_reg=8.0e-3)
    mat = MaterialStack.make([
        Material(G=1.0, **common), Material(G=0.5, **common)
    ])
    # weak elastic sphere off-center so it straddles block boundaries
    from justrelax_tpu.rheology.phases import phase_ratios_from_field

    X, Y, Z = (np.asarray(A) for A in geometry.cell_centers_mesh())
    sph = ((X - 0.45) ** 2 + (Y - 0.55) ** 2 + (Z - 0.5) ** 2) < 0.22**2
    pr = phase_ratios_from_field(jnp.asarray(sph.astype(int)), 2)
    pt = PTStokesCoeffs.make(
        geometry.li, geometry.di, eps_rel=1.0e-30, eps_abs=1.0e-30,
        CFL=0.9 / math.sqrt(3.1),
    )
    (Vx0, Vy0, Vz0), bc = _pure_shear_xz(geometry, 1.0)

    # --- serial reference: nt loading steps, fixed 300 iters each ----------
    stokes = StokesState.make(ni)
    stokes = stokes.replace(
        viscosity=stokes.viscosity.replace(eta=jnp.ones(ni)),
        V=stokes.V.replace(Vx=Vx0, Vy=Vy0, Vz=Vz0),
    )
    serial = []
    for _ in range(nt):
        stokes, info = solve_vep_3d(
            stokes, pt, geometry, bc, mat, pr.center,
            (pr.edge_yz, pr.edge_xz, pr.edge_xy),
            dt, iter_max=300, iter_min=100, nout=100,
        )
        serial.append(stokes)
    assert int(info.iters) == 300
    # plasticity must actually engage by the last step for this to be a
    # meaningful VEP (not just VE) parity check
    assert float(jnp.max(stokes.lam)) > 0.0

    # --- distributed: same steps on a (2,2,2) mesh -------------------------
    dec = Decomp3D.make(ni, (2, 2, 2))
    nl, p = dec.ni_local, dec.mesh_shape

    def B(A, key):
        return jnp.asarray(block_staggered_nd(np.asarray(A), nl, p, EXTRAS[key]))

    zc = np.zeros(ni)
    blocks = {
        "Vx": B(Vx0, "Vx"), "Vy": B(Vy0, "Vy"), "Vz": B(Vz0, "Vz"),
        "P": B(zc, "P"), "Q": B(zc, "Q"),
        "EII_pl": B(zc, "EII_pl"), "eta": B(np.ones(ni), "eta"),
        "inv_dx": 1.0 / geometry.di[0],
        "inv_dy": 1.0 / geometry.di[1],
        "inv_dz": 1.0 / geometry.di[2],
    }
    for k in ("txx", "tyy", "tzz", "tyz_c", "txz_c", "txy_c"):
        blocks[k] = B(zc, k)
        blocks[k + "_o"] = B(zc, k)
    for k, sh in (("tyz", (ni[0], ni[1] + 1, ni[2] + 1)),
                  ("txz", (ni[0] + 1, ni[1], ni[2] + 1)),
                  ("txy", (ni[0] + 1, ni[1] + 1, ni[2]))):
        blocks[k] = B(np.zeros(sh), k)
        blocks[k + "_o"] = B(np.zeros(sh), k)
    # blocked phase-ratio stacks (trailing phase axis unsharded)
    for k, A, ex in (("pr_c", pr.center, (0, 0, 0)),
                     ("pr_yz", pr.edge_yz, (0, 1, 1)),
                     ("pr_xz", pr.edge_xz, (1, 0, 1)),
                     ("pr_xy", pr.edge_xy, (1, 1, 0))):
        blocks[k] = jnp.asarray(block_staggered_nd(
            np.asarray(A), nl + (A.shape[-1],), p + (1,), ex + (0,)
        ))

    with mesh:
        for step in range(nt):
            res = solve_vep_sharded_3d(
                mesh, dec, blocks, pt, bc, mat, dt,
                iter_max=300, iter_min=100, nout=100,
            )
            # next loading step: τ_o ← τ, P/V/η carried (the serial driver's
            # state threading), EII from the serial state (softening is off,
            # so it is inert — carried only for signature parity)
            for k in ("Vx", "Vy", "Vz", "P", "eta",
                      "txx", "tyy", "tzz", "tyz_c", "txz_c", "txy_c",
                      "tyz", "txz", "txy"):
                blocks[k] = getattr(res, k)
            for k in ("txx", "tyy", "tzz", "tyz_c", "txz_c", "txy_c",
                      "tyz", "txz", "txy"):
                blocks[k + "_o"] = getattr(res, k)
            blocks["EII_pl"] = B(serial[step].EII_pl, "EII_pl")

            s_ref = serial[step]
            for name, ref in (
                ("Vx", s_ref.V.Vx), ("Vy", s_ref.V.Vy), ("Vz", s_ref.V.Vz),
                ("P", s_ref.P),
                ("txx", s_ref.tau.xx), ("tzz", s_ref.tau.zz),
                ("txy", s_ref.tau.xy), ("txz", s_ref.tau.xz),
                ("tyz", s_ref.tau.yz),
                ("tau_II", s_ref.tau.II), ("lam", s_ref.lam),
            ):
                dist = unblock_staggered_nd(
                    np.asarray(getattr(res, name)), nl, p,
                    EXTRAS.get(name, (0, 0, 0)),
                )
                np.testing.assert_allclose(
                    dist, np.asarray(ref), atol=2e-13,
                    err_msg=f"step {step}: {name} mismatch vs serial",
                )

    # the distributed run also saw yield
    lam = unblock_staggered_nd(np.asarray(res.lam), nl, p, (0, 0, 0))
    assert lam.max() > 0.0


def test_distributed_moves_match_serial_moves():
    """Each halo-aware clamped move equals its serial twin on random global
    fields (pinpoints a broken move; the solver parity test above only flags
    the composition)."""
    from jax.sharding import PartitionSpec as P

    from justrelax_tpu.ops.stokes3d_vep import serial_moves
    from justrelax_tpu.parallel.stokes3d_vep import distributed_moves
    from justrelax_tpu.parallel import halo

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = jax.sharding.Mesh(
        np.array(devs[:8]).reshape(2, 2, 2), ("x", "y", "z")
    )
    ni = (8, 8, 8)
    dec = Decomp3D.make(ni, (2, 2, 2))
    nl, p = dec.ni_local, dec.mesh_shape
    rng = np.random.default_rng(11)
    C = rng.normal(size=ni) + 3.0  # positive for the harmonic move
    E = {  # one array per shear-edge family
        "yz": rng.normal(size=(ni[0], ni[1] + 1, ni[2] + 1)),
        "xz": rng.normal(size=(ni[0] + 1, ni[1], ni[2] + 1)),
        "xy": rng.normal(size=(ni[0] + 1, ni[1] + 1, ni[2])),
    }
    sm = serial_moves(ni)
    EX = {"yz": (0, 1, 1), "xz": (1, 0, 1), "xy": (1, 1, 0)}

    def B(A, ex):
        return jnp.asarray(block_staggered_nd(np.asarray(A), nl, p, ex))

    spec = P("x", "y", "z")

    def run_local(fn, out_n, *blocked):
        out_specs = (spec,) * out_n if out_n > 1 else spec
        f = jax.shard_map(fn, mesh=mesh, in_specs=(spec,) * len(blocked),
                          out_specs=out_specs, check_vma=False)
        with mesh:
            return f(*blocked)

    axes = {"yz": (1, 2), "xz": (0, 2), "xy": (0, 1)}
    for name, (a, b) in axes.items():
        def c2e(Cl, _a=a, _b=b):
            m = distributed_moves(tuple(halo.axis_edges(x) for x in ("x", "y", "z")))
            return (m.center_to_edge(Cl, _a, _b), m.harm_center_to_edge(Cl, _a, _b))

        got, goth = run_local(c2e, 2, B(C, (0, 0, 0)))
        want = np.asarray(sm.center_to_edge(jnp.asarray(C), a, b))
        wanth = np.asarray(sm.harm_center_to_edge(jnp.asarray(C), a, b))
        np.testing.assert_allclose(
            unblock_staggered_nd(np.asarray(got), nl, p, EX[name]), want,
            atol=1e-15, err_msg=f"center_to_edge {name}")
        np.testing.assert_allclose(
            unblock_staggered_nd(np.asarray(goth), nl, p, EX[name]), wanth,
            atol=1e-15, err_msg=f"harm_center_to_edge {name}")

    for src in axes:
        for dst in axes:
            if src == dst:
                continue

            def o2e(Al, _s=src, _d=dst):
                m = distributed_moves(tuple(halo.axis_edges(x) for x in ("x", "y", "z")))
                return m.other_to_edge(_s, _d, Al)

            got = run_local(o2e, 1, B(E[src], EX[src]))
            want = np.asarray(sm.other_to_edge(src, dst, jnp.asarray(E[src])))
            np.testing.assert_allclose(
                unblock_staggered_nd(np.asarray(got), nl, p, EX[dst]), want,
                atol=1e-15, err_msg=f"other_to_edge {src}->{dst}")
