"""Distributed thermal diffusion == serial on the same global grid."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from justrelax_tpu.core.coeffs import PTThermalCoeffs
from justrelax_tpu.core.grid import Geometry
from justrelax_tpu.core.state import ThermalState
from justrelax_tpu.ops.bc import Faces, TemperatureBoundaryConditions, thermal_bcs
from justrelax_tpu.parallel.decomp import Decomp2D, block_staggered, unblock_staggered
from justrelax_tpu.parallel.mesh import make_grid_mesh
from justrelax_tpu.parallel.thermal import heatdiffusion_PT_sharded
from justrelax_tpu.solvers.thermal import heatdiffusion_PT


@pytest.mark.slow
def test_sharded_thermal_matches_serial():
    nx = ny = 32
    ni = (nx, ny)
    geom = Geometry(ni, (1.0, 1.0))
    rng = np.random.default_rng(0)
    T0 = np.zeros((nx + 2, ny + 2))
    X, Y = geom.cell_centers_mesh()
    T0[1:-1, 1:-1] = 1.0 + np.exp(-((X - 0.4) ** 2 + (Y - 0.6) ** 2) / 0.02)
    bc = TemperatureBoundaryConditions(
        no_flux=Faces(left=True, right=True),
        constant_value=Faces(top=1.0, bot=2.0),
    )
    Tj = thermal_bcs(jnp.asarray(T0), bc)
    K = jnp.ones(ni)
    rc = jnp.ones(ni)
    H = jnp.zeros(ni)
    dt = 0.05
    pt = PTThermalCoeffs.make(K, rc, dt, geom.di, geom.li)

    # serial
    th = ThermalState.make(ni).replace(T=Tj, Told=Tj)
    th, info = heatdiffusion_PT(th, pt, bc, dt, geom, K=K, rho_Cp=rc,
                                iter_max=4000, nout=500)

    # sharded (2x4 mesh)
    mesh = make_grid_mesh((2, 4))
    decomp = Decomp2D.make(ni, (2, 4))
    T_blocks = jnp.asarray(block_staggered(np.asarray(Tj), decomp, (2, 2)))
    Tb, err, iters = heatdiffusion_PT_sharded(
        mesh, decomp, T_blocks, K, rc, H, pt, bc, dt, geom.di,
        iter_max=4000, nout=500,
    )
    T_g = unblock_staggered(np.asarray(Tb), decomp, (2, 2))
    np.testing.assert_allclose(T_g, np.asarray(th.T), atol=1e-13)
    assert float(err) == pytest.approx(float(info.err), rel=1e-6)
    assert int(iters) == int(info.iters)
