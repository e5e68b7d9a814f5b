"""Staggered allocation shapes (reference test/test_types.jl)."""

import jax.numpy as jnp
import pytest

from justrelax_tpu.core.state import StokesState, ThermalState
from justrelax_tpu.core.grid import Geometry


def test_stokes_shapes_2d():
    nx, ny = 8, 6
    s = StokesState.make((nx, ny))
    assert s.P.shape == (nx, ny)
    assert s.V.Vx.shape == (nx + 1, ny + 2)
    assert s.V.Vy.shape == (nx + 2, ny + 1)
    assert s.tau.xx.shape == (nx, ny)
    assert s.tau.xy.shape == (nx + 1, ny + 1)
    assert s.tau.xy_c.shape == (nx, ny)
    assert s.tau.xx_v.shape == (nx + 1, ny + 1)
    assert s.tau.zz is None
    assert s.R.Rx.shape == (nx - 1, ny)
    assert s.R.Ry.shape == (nx, ny - 1)
    assert s.R.RP.shape == (nx, ny)
    assert s.viscosity.eta.shape == (nx, ny)
    assert s.viscosity.eta_v.shape == (nx + 1, ny + 1)
    assert s.omega.xy.shape == (nx + 1, ny + 1)
    assert s.lam_v.shape == (nx + 1, ny + 1)


def test_stokes_shapes_3d():
    nx, ny, nz = 6, 5, 4
    s = StokesState.make((nx, ny, nz))
    assert s.V.Vx.shape == (nx + 1, ny + 2, nz + 2)
    assert s.V.Vy.shape == (nx + 2, ny + 1, nz + 2)
    assert s.V.Vz.shape == (nx + 2, ny + 2, nz + 1)
    assert s.tau.xy.shape == (nx + 1, ny + 1, nz)
    assert s.tau.yz.shape == (nx, ny + 1, nz + 1)
    assert s.tau.xz.shape == (nx + 1, ny, nz + 1)
    assert s.R.Rx.shape == (nx - 1, ny, nz)
    assert s.R.Rz.shape == (nx, ny, nz - 1)


def test_thermal_shapes_2d():
    nx, ny = 8, 6
    t = ThermalState.make((nx, ny))
    assert t.T.shape == (nx + 2, ny + 2)
    assert t.qTx.shape == (nx + 1, ny)
    assert t.qTy.shape == (nx, ny + 1)
    assert t.qTz is None
    assert t.ResT.shape == (nx, ny)
    assert t.H.shape == (nx, ny)


def test_thermal_shapes_3d():
    nx, ny, nz = 6, 5, 4
    t = ThermalState.make((nx, ny, nz))
    assert t.T.shape == (nx + 2, ny + 2, nz + 2)
    assert t.qTx.shape == (nx + 1, ny, nz)
    assert t.qTy.shape == (nx, ny + 1, nz)
    assert t.qTz.shape == (nx, ny, nz + 1)


def test_geometry_2d():
    g = Geometry((4, 8), (1.0, 2.0), origin=(0.0, -2.0))
    assert g.di == (0.25, 0.25)
    assert g.xci[0].shape == (4,)
    assert g.xvi[0].shape == (5,)
    assert g.xci[0][0] == pytest.approx(0.125)
    assert g.xvi[1][0] == pytest.approx(-2.0)
    assert g.xvi[1][-1] == pytest.approx(0.0)
    assert g.max_li == 2.0
    # velocity grids: ghosted transverse axis
    (xvx, yvx), (xvy, yvy) = g.xi_vel
    assert len(xvx) == 5 and len(yvx) == 10
    assert len(xvy) == 6 and len(yvy) == 9
    assert yvx[0] == pytest.approx(g.xci[1][0] - 0.25)


def test_geometry_hashable():
    g1 = Geometry((4, 4), (1.0, 1.0))
    g2 = Geometry((4, 4), (1.0, 1.0))
    assert g1 == g2 and hash(g1) == hash(g2)


def test_state_is_pytree():
    import jax

    s = StokesState.make((4, 4))
    leaves = jax.tree_util.tree_leaves(s)
    assert all(isinstance(l, jnp.ndarray) for l in leaves)
    s2 = jax.tree_util.tree_map(lambda x: x + 1, s)
    assert float(s2.P[0, 0]) == 1.0
