"""Direct unit tests for the halo-exchange primitives (parallel/halo.py).

Every distributed solver depends on ``halo.exchange_ghosts`` /
``halo.extend``; these tests exercise them in isolation over the
blocked-local layouts of decomp.py (the analogue of the reference's
ImplicitGlobalGrid ``update_halo!`` semantics, src/grid/Grid.jl +
ImplicitGlobalGrid), across:

- odd and even per-tile overlap (extra = 1 shared faces/vertices,
  extra = 2 ghosted velocity transverse rows, extra = 3 stress-test),
- both mesh axes ("x" leading dim, "y" trailing dim),
- non-power-of-two device counts (3-device mesh on the 8-device host),
- physical-boundary behavior (first/last device keeps its BC-set layer;
  ``extend`` clamps the outermost layer).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from justrelax_tpu.parallel import halo
from justrelax_tpu.parallel.decomp import Decomp2D, block_staggered


def _mesh(px, py):
    devs = np.array(jax.devices("cpu")[: px * py]).reshape(px, py)
    return Mesh(devs, ("x", "y"))


def _global(shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=shape)


def _exchange_oracle(tiles, n_owned, extra):
    """Reference implementation of the exchange rule on a list of local
    tiles (leading axis is the exchange axis): for interior neighbors,
      out[r][0]  = in[r-1][n_owned]      (same global layer, left copy)
      out[r][-1] = in[r+1][extra-1]      (same global layer, right copy)
    physical-boundary tiles keep their outermost (BC-owned) layer."""
    p = len(tiles)
    out = [t.copy() for t in tiles]
    for r in range(p):
        if r > 0:
            out[r][0] = tiles[r - 1][n_owned]
        if r < p - 1:
            out[r][-1] = tiles[r + 1][extra - 1]
    return out


@pytest.mark.parametrize("px,py", [(4, 2), (2, 4), (3, 1)])
@pytest.mark.parametrize("extra", [1, 2, 3])
@pytest.mark.parametrize("axis", [0, 1])
def test_exchange_ghosts_layouts(px, py, extra, axis):
    """exchange_ghosts matches the rule-based oracle on arbitrary data, for
    odd/even overlap, both axes, and a 3-device mesh; for extra >= 2 the
    source layers are interior, so corrupted ghosts are restored to the
    clean global values."""
    nxl, nyl = 5, 4
    dec = Decomp2D(px=px, py=py, nxl=nxl, nyl=nyl)
    ex = extra if axis == 0 else 0
    ey = extra if axis == 1 else 0
    G = _global((px * nxl + ex, py * nyl + ey))
    B = block_staggered(G, dec, (ex, ey))  # clean blocked container

    # corrupt the outermost layer of EVERY tile along `axis`
    sx, sy = nxl + ex, nyl + ey
    Bc = B.copy()
    for rx in range(px):
        for ry in range(py):
            tile = Bc[rx * sx : (rx + 1) * sx, ry * sy : (ry + 1) * sy]
            if axis == 0:
                tile[0, :] = -1e30
                tile[-1, :] = -1e30
            else:
                tile[:, 0] = -1e30
                tile[:, -1] = -1e30

    mesh = _mesh(px, py)
    n_owned = nxl if axis == 0 else nyl
    p = px if axis == 0 else py

    fn = shard_map(
        lambda A: halo.exchange_ghosts(A, axis, n_owned),
        mesh=mesh, in_specs=P("x", "y"), out_specs=P("x", "y"),
    )
    out = np.asarray(jax.jit(fn)(jnp.asarray(Bc)))

    def tiles_along_axis(C, rx, ry):
        t = C[rx * sx : (rx + 1) * sx, ry * sy : (ry + 1) * sy]
        return t if axis == 0 else t.T

    # rule-based oracle over each 1D line of tiles
    other = py if axis == 0 else px
    for q in range(other):
        if axis == 0:
            line_in = [tiles_along_axis(Bc, r, q) for r in range(p)]
            line_out = [tiles_along_axis(out, r, q) for r in range(p)]
            line_clean = [tiles_along_axis(B, r, q) for r in range(p)]
        else:
            line_in = [tiles_along_axis(Bc, q, r) for r in range(p)]
            line_out = [tiles_along_axis(out, q, r) for r in range(p)]
            line_clean = [tiles_along_axis(B, q, r) for r in range(p)]
        want = _exchange_oracle(line_in, n_owned, extra)
        for r in range(p):
            np.testing.assert_array_equal(line_out[r], want[r])
            if extra >= 2:
                # source layers are interior -> ghosts fully restored;
                # only physical-boundary outermost layers stay corrupted
                ref = line_clean[r].copy()
                if r == 0:
                    ref[0] = -1e30
                if r == p - 1:
                    ref[-1] = -1e30
                np.testing.assert_array_equal(line_out[r], ref)


@pytest.mark.parametrize("px,py", [(4, 2), (3, 1)])
@pytest.mark.parametrize("h", [1, 2])
def test_extend_matches_global_clamped(px, py, h):
    """extend() of a center-array tile equals the clamped-global window."""
    nxl, nyl = 4, 6
    dec = Decomp2D(px=px, py=py, nxl=nxl, nyl=nyl)
    G = _global(dec.ni_global, seed=1)
    B = block_staggered(G, dec, (0, 0))
    mesh = _mesh(px, py)

    for axis in (0, 1):
        fn = shard_map(
            lambda A: halo.extend(A, axis, h),
            mesh=mesh, in_specs=P("x", "y"), out_specs=P("x", "y"),
        )
        out = np.asarray(jax.jit(fn)(jnp.asarray(B)))
        # clamped-global oracle: pad G with edge replication, then each tile's
        # extension is the global window [r*nl - h + pad, ...]
        Gp = np.pad(G, [(h, h) if a == axis else (0, 0) for a in (0, 1)], mode="edge")
        sx = nxl + (2 * h if axis == 0 else 0)
        sy = nyl + (2 * h if axis == 1 else 0)
        for rx in range(px):
            for ry in range(py):
                got = out[rx * sx : (rx + 1) * sx, ry * sy : (ry + 1) * sy]
                x0 = rx * nxl
                y0 = ry * nyl
                want = Gp[x0 : x0 + sx, y0 : y0 + sy]
                np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_exchange_ghosts_rejects_no_overlap():
    mesh = _mesh(2, 1)
    fn = shard_map(
        lambda A: halo.exchange_ghosts(A, 0, 4),
        mesh=mesh, in_specs=P("x", "y"), out_specs=P("x", "y"),
    )
    with pytest.raises(ValueError, match="no ghost layers"):
        jax.jit(fn)(jnp.zeros((8, 3)))  # 4 per tile == n_owned, extra=0
