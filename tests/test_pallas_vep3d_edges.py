"""Hybrid 3D VEP iteration: Pallas edge passes + XLA everything-else ==
the plain canvas chunk.

The edges kernel (ops/pallas_vep3d_edges.py) runs the three edge
return-mapping passes of update_stresses_center_edges_3d (the same single
source) in radius-2 x-slab windows; the hybrid iteration
(iteration_vep3d_canvas(edges_pallas=True)) must match the fused XLA
canvas chunk up to the scalar-plastic collapse tolerance. Interpret mode
(CPU); the chip measurement record lives in docs/performance.md.
"""

import jax
import numpy as np

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import pytest  # noqa: E402

from justrelax_tpu.ops.stokes3d_vep_canvas import (  # noqa: E402
    vep3d_canvas_consts,
    vep3d_chunk_canvas,
)
from tests.test_pallas_vep3d_blocked import _ATOL, _setup  # noqa: E402


@pytest.mark.parametrize("plastic", [False, True])
@pytest.mark.parametrize("nit", [1, 5])
def test_hybrid_edges_matches_canvas_chunk(plastic, nit):
    material, carry, ckw, inv_di, kw = _setup(plastic=plastic)
    co_ref = vep3d_canvas_consts(**ckw)
    want = vep3d_chunk_canvas(carry, co_ref, material, inv_di, nit, **kw)

    co_blk = vep3d_canvas_consts(**ckw, hoist_tau_o=False,
                                 scalar_plastic=True, scalar_K=True)
    got = vep3d_chunk_canvas(
        carry, co_blk, material, inv_di, nit,
        edges_pallas=True, edges_interpret=True, **kw,
    )
    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=0, atol=_ATOL[plastic])
    if plastic and nit == 5:
        assert float(jnp.max(want.lam)) > 0.0  # plastic branch exercised


@pytest.mark.parametrize("plastic", [False, True])
@pytest.mark.parametrize("nit", [1, 5])
def test_split_edges_matches_canvas_chunk(plastic, nit):
    """Per-family split kernels (3 pallas_calls, hoisted tau_o consts) ==
    the plain canvas chunk (same scalar-plastic collapse tolerance)."""
    material, carry, ckw, inv_di, kw = _setup(plastic=plastic)
    co_ref = vep3d_canvas_consts(**ckw)
    want = vep3d_chunk_canvas(carry, co_ref, material, inv_di, nit, **kw)

    co_spl = vep3d_canvas_consts(**ckw, scalar_plastic=True, scalar_K=True)
    got = vep3d_chunk_canvas(
        carry, co_spl, material, inv_di, nit,
        edges_pallas="split", edges_interpret=True, **kw,
    )
    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=0, atol=_ATOL[plastic])
    if plastic and nit == 5:
        assert float(jnp.max(want.lam)) > 0.0  # plastic branch exercised
