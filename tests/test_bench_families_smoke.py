"""Smoke test: every bench family in utils/bench_kernels.py::FAMILIES must
*instantiate* and *trace* at a tiny grid (ADVICE r04: the registered
``pallas_vep3d_blocked`` family shipped with stale kwargs and raised
TypeError on first step — unrunnable as committed, and nothing caught it).

`jax.eval_shape` traces the step (catching signature drift, shape
mismatches, and Pallas BlockSpec inconsistencies at trace time) without
lowering to TPU, so this runs on the CPU suite.
"""

import jax
import jax.numpy as jnp
import pytest

from justrelax_tpu.utils import bench_kernels as bk

# Per-family tiny-but-valid sizes. Blocked kernels need enough planes for
# >= 2 blocks with halo H = 3k per side (choose_blocking constraints), so
# their minimum n is larger.
SMOKE_KWARGS = {
    "ve2d": dict(nx=32, ny=32),
    "vep2d": dict(n=32),
    "vep2d_1024": dict(),
    "thermal2d": dict(nx=32, ny=32),
    "thermal3d": dict(n=16),
    "ve3d": dict(n=16),
    "ve3d_canvas": dict(n=16),
    "vep3d": dict(n=16),
    "vep3d_canvas": dict(n=16),
    "pallas_ve2d": dict(n=62),
    "pallas_ve2d_blocked": dict(n=128),
    "pallas_ve3d_blocked": dict(n=30),
    "pallas_vep2d": dict(n=62),
    "pallas_vep2d_blocked": dict(n=128),
    "pallas_thermal2d": dict(n=62),
    "pallas_vep3d_blocked": dict(n=30),
    "pallas_vep3d_edges": dict(n=16),
    # fixed-size past-VMEM families: trace at the real (254^3) shape —
    # eval_shape is cheap, only the factory's CPU array build costs time
    "ve3d_254": dict(),
    "ve3d_canvas_254": dict(),
    "pallas_ve3d_blocked_254": dict(),
}


def test_every_family_registered_has_smoke_kwargs():
    assert set(SMOKE_KWARGS) == set(bk.FAMILIES)


@pytest.mark.parametrize("name", sorted(bk.FAMILIES))
def test_family_instantiates_and_traces(name):
    step, carry, consts, bytes_per_iter, n_cells = bk.FAMILIES[name](
        **SMOKE_KWARGS[name]
    )
    assert bytes_per_iter > 0 and n_cells > 0
    out = jax.eval_shape(step, jnp.asarray(2, jnp.int32), carry, consts)
    # tracing succeeded; the output must be a non-empty pytree of concrete
    # shapes (some families return a richer pytree than their timed carry,
    # so structure preservation is not asserted universally)
    leaves = jax.tree.leaves(out)
    assert leaves
    for o in leaves:
        assert hasattr(o, "shape") and hasattr(o, "dtype")
