"""Bench harness sanity (utils/bench_kernels.py): the XLA family factories
build and step on tiny grids, and the actual-stream accounting used for the
measured roofline fraction (bench.py ``stream_frac_peak``) counts what the
fori path really moves per iteration — loop-carried arrays twice, explicit
consts and closure constants once."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from justrelax_tpu.utils import bench_kernels as bk


@pytest.mark.parametrize("fam,kw", [("ve2d", {"nx": 32, "ny": 32}),
                                    ("vep2d", {"n": 24}),
                                    ("thermal2d", {"nx": 30, "ny": 30}),
                                    ("ve3d", {"n": 12})])
def test_family_builds_and_steps(fam, kw):
    step, carry, consts, bpi, n_cells = bk.FAMILIES[fam](**kw)
    out = jax.jit(step)(jnp.asarray(2, jnp.int32), carry, consts)
    for leaf in jax.tree.leaves(out):
        assert bool(jnp.all(jnp.isfinite(leaf)))
    assert bpi > 0 and n_cells > 0


def test_stream_bytes_accounting():
    """The stream estimate equals 2×carry + consts + closure arrays and
    scales with the grid; for vep2d it exceeds the carry-only lower bound
    (phase-ratio/moduli closures are re-read per iteration) and stays
    within ~2× of the Räss necessary-traffic figure."""
    def leaf_bytes(t):
        return sum(int(np.prod(x.shape)) * x.dtype.itemsize
                   for x in jax.tree.leaves(t) if hasattr(x, "shape"))

    for fam, kw in (("vep2d", {"n": 24}), ("ve2d", {"nx": 32, "ny": 32})):
        step, carry, consts, bpi_unit, _ = bk.FAMILIES[fam](**kw)
        sb = bk.stream_bytes_per_iter(fam, kw)
        lower = 2 * leaf_bytes(carry)
        assert sb >= lower
        assert sb <= 4 * bpi_unit  # same order as the necessary traffic

    s24 = bk.stream_bytes_per_iter("vep2d", {"n": 24})
    s48 = bk.stream_bytes_per_iter("vep2d", {"n": 48})
    assert 3.0 < s48 / s24 < 5.0  # ~quadratic in n
