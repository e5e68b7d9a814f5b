"""Comm/compute overlap demonstration (reference ``@hide_communication``,
src/stokes/Stokes2D.jl:768-785).

Two artifacts back the claim that the sharded solver's halo exchange hides
behind interior compute:

1. **Value-identity**: the ``overlap=True`` split-ghost-carry formulation
   equals the eager ``overlap=False`` path bitwise after one iteration (the
   carried ghosts hold exactly the exchanged values; only the dataflow
   differs) and to accumulated roundoff over a full solve.

2. **Schedule inspection on the real TPU compiler**: AOT-compiling the
   sharded solve for an 8-chip v5e:2x4 topology (no chips needed —
   `jax.experimental.topologies`), every halo ppermute lowers to an async
   ``collective-permute-start``/``-done`` pair, and XLA's latency-hiding
   scheduler places interior compute between start and done. Measured on
   256²/8 blocks: 36 async pairs, with up to ~67 scheduled compute ops
   inside the start→done window in the overlap formulation.
"""

import functools
import math
import re
from collections import Counter

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from justrelax_tpu.core.coeffs import PTStokesCoeffs
from justrelax_tpu.core.grid import Geometry
from justrelax_tpu.models import solcx
from justrelax_tpu.ops.bc import Faces, VelocityBoundaryConditions
from justrelax_tpu.parallel import stokes2d as ps
from justrelax_tpu.parallel.decomp import Decomp2D, block_staggered
from justrelax_tpu.parallel.mesh import make_grid_mesh


def _problem(nx, ny, dtype=np.float64, concrete=True):
    geometry = Geometry((nx, ny), (1.0, 1.0))
    pt = PTStokesCoeffs.make(
        geometry.li, geometry.di, CFL=1.0 / math.sqrt(2.1),
        eps_abs=0.0, eps_rel=0.0,
    )
    bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True)
    )
    decomp = Decomp2D.make((nx, ny), (2, 4))
    shapes = {
        "Vx": block_staggered(np.zeros((nx + 1, ny + 2), dtype), decomp, (1, 2)).shape,
        "Vy": block_staggered(np.zeros((nx + 2, ny + 1), dtype), decomp, (2, 1)).shape,
        "txy": block_staggered(np.zeros((nx + 1, ny + 1), dtype), decomp, (1, 1)).shape,
    }
    if concrete:
        eta = np.asarray(solcx.solcx_viscosity(geometry, 1.0e6), dtype)
        rho = np.asarray(solcx.solcx_density(geometry), dtype)
        z = np.zeros((nx, ny), dtype)
        blocks = {
            "Vx": np.zeros(shapes["Vx"], dtype),
            "Vy": np.zeros(shapes["Vy"], dtype),
            "P": z, "P0": z, "Q": z, "txx": z, "tyy": z,
            "txy": np.zeros(shapes["txy"], dtype),
            "txx_o": z, "tyy_o": z,
            "txy_o": np.zeros(shapes["txy"], dtype),
            "eta": eta, "G": np.full((nx, ny), np.inf, dtype),
            "K": np.full((nx, ny), np.inf, dtype),
            "rho_gx": z, "rho_gy": rho,
        }
        blocks = {k: jnp.asarray(v) for k, v in blocks.items()}
    else:
        z = jax.ShapeDtypeStruct((nx, ny), dtype)
        blocks = {
            "Vx": jax.ShapeDtypeStruct(shapes["Vx"], dtype),
            "Vy": jax.ShapeDtypeStruct(shapes["Vy"], dtype),
            "P": z, "P0": z, "Q": z, "txx": z, "tyy": z,
            "txy": jax.ShapeDtypeStruct(shapes["txy"], dtype),
            "txx_o": z, "tyy_o": z,
            "txy_o": jax.ShapeDtypeStruct(shapes["txy"], dtype),
            "eta": z, "G": z, "K": z, "rho_gx": z, "rho_gy": z,
        }
    blocks["inv_dx"] = 1.0 / geometry.di[0]
    blocks["inv_dy"] = 1.0 / geometry.di[1]
    return pt, bc, decomp, blocks


@pytest.mark.slow
def test_overlap_path_bit_identical():
    """Split-ghost-carry (overlap=True) == eager exchange (overlap=False).

    The semantic claim — the carried ghost slices hold exactly the values an
    eager exchange would install — is asserted BITWISE after one iteration
    (every field, including the ghost/duplicate layers of the gathered
    blocks). Over many iterations the two formulations are different HLO
    programs, and XLA CPU's fusion-dependent FMA contraction legally differs
    between them (measured: 1-ulp spread appearing from iteration 2), so
    long-run equivalence is asserted at accumulated-roundoff tolerance
    (~1e-15 vs the ~1e-4 solution scale) rather than bitwise.
    """
    mesh = make_grid_mesh((2, 4))
    pt, bc, decomp, blocks = _problem(32, 32)

    def run(nit, nout, overlap):
        return ps.solve_ve_sharded(
            mesh, decomp, dict(blocks), pt, bc, 0.1,
            iter_max=nit, nout=nout, overlap=overlap,
        )

    r1, r0 = run(1, 1, True), run(1, 1, False)
    for name in ("Vx", "Vy", "P", "txx", "tyy", "txy"):
        np.testing.assert_array_equal(
            np.asarray(getattr(r1, name)), np.asarray(getattr(r0, name)),
            err_msg=f"{name} ghost dataflow differs after one iteration",
        )

    r1, r0 = run(1000, 250, True), run(1000, 250, False)
    for name in ("Vx", "Vy", "P", "txx", "tyy", "txy"):
        np.testing.assert_allclose(
            np.asarray(getattr(r1, name)), np.asarray(getattr(r0, name)),
            rtol=0.0, atol=5e-15,
            err_msg=f"{name} differs between overlap paths",
        )


@pytest.mark.slow
def test_halo_collectives_hide_behind_interior_compute():
    """AOT-compile for a v5e:2x4 TPU topology and check the optimized
    schedule: halo ppermutes must lower to async collective-permute
    start/done pairs with interior compute placed inside the window."""
    try:
        from jax.experimental import topologies

        topo = topologies.get_topology_desc("v5e:2x4", "tpu")
        devs = np.array(topo.devices).reshape(2, 4)
    except Exception as e:  # no TPU AOT support in this environment
        pytest.skip(f"TPU topology AOT unavailable: {e}")

    from jax.sharding import Mesh

    mesh = Mesh(devs, ("x", "y"))
    pt, bc, decomp, blocks = _problem(256, 256, dtype=jnp.float32, concrete=False)
    f = jax.jit(functools.partial(
        ps.solve_ve_sharded, mesh, decomp,
        pt_stokes=pt, flow_bc=bc, dt=0.1, iter_max=500, nout=500, overlap=True,
    ))
    try:
        txt = f.lower(blocks).compile().as_text()
    except Exception as e:
        pytest.skip(f"TPU AOT compile unavailable: {e}")

    ops = Counter(re.findall(r"(collective-permute(?:-start|-done)?)\(", txt))
    assert ops["collective-permute-start"] > 0, "no async collectives emitted"
    assert ops["collective-permute-start"] == ops["collective-permute-done"]

    # interior compute scheduled between start and done
    lines = txt.splitlines()
    starts = {}
    gaps = []
    for i, ln in enumerate(lines):
        m = re.search(r"%(\S*collective-permute-start\S*) = ", ln)
        if m:
            starts[m.group(1).rstrip(")")] = i
        m2 = re.search(
            r"collective-permute-done\(.*%(\S*collective-permute-start[^),\s]*)", ln
        )
        if m2 and m2.group(1) in starts:
            seg = lines[starts[m2.group(1)] + 1:i]
            gaps.append(sum(1 for s in seg if "fusion" in s or " = f32" in s))
    assert gaps, "no start/done pairs matched"
    # the scheduler must hide at least some collectives behind real compute
    assert max(gaps) >= 10, f"no meaningful overlap window found: {gaps}"
    assert sum(g > 0 for g in gaps) >= len(gaps) // 2
