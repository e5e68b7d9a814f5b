"""3D distributed PT thermal diffusion == serial (2×2×2 mesh)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from justrelax_tpu.core.coeffs import PTThermalCoeffs
from justrelax_tpu.core.grid import Geometry
from justrelax_tpu.core.state import ThermalState
from justrelax_tpu.ops.bc import Faces, TemperatureBoundaryConditions, thermal_bcs
from justrelax_tpu.parallel.decomp import Decomp3D, block_staggered_nd
from justrelax_tpu.parallel.thermal import heatdiffusion_PT_sharded_3d
from justrelax_tpu.solvers.thermal import heatdiffusion_PT


@pytest.mark.slow
def test_distributed_thermal3d_matches_serial():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = jax.sharding.Mesh(
        np.array(devs[:8]).reshape(2, 2, 2), axis_names=("x", "y", "z")
    )

    ni = (8, 8, 8)
    geometry = Geometry(ni, (1.0, 1.0, 1.0))
    dec = Decomp3D.make(ni, (2, 2, 2))
    rng = np.random.default_rng(0)

    K = np.exp(0.3 * rng.normal(size=ni))
    rho_Cp = np.ones(ni)
    H = 0.1 * rng.normal(size=ni)
    T0 = 100.0 + 10.0 * rng.normal(size=ni)
    dt = 0.05

    bc = TemperatureBoundaryConditions(
        constant_value=Faces(top=100.0, bot=120.0),
        no_flux=Faces(left=True, right=True, front=True, back=True),
    )
    Tg = np.zeros((10, 10, 10))
    Tg[1:-1, 1:-1, 1:-1] = T0
    Tj = thermal_bcs(jnp.asarray(Tg), bc)

    pt = PTThermalCoeffs.make(
        jnp.asarray(K), jnp.asarray(rho_Cp), dt, geometry.di, geometry.li,
        eps=1.0e-10, CFL=0.9 / math.sqrt(3.0),
    )

    # serial
    thermal = ThermalState.make(ni)
    thermal = thermal.replace(T=Tj, Told=Tj, H=jnp.asarray(H))
    t_s, info = heatdiffusion_PT(
        thermal, pt, bc, dt, geometry, K=jnp.asarray(K),
        rho_Cp=jnp.asarray(rho_Cp), iter_max=20_000, nout=200,
    )

    # distributed
    nl, p = dec.ni_local, dec.mesh_shape
    T_blocks = jnp.asarray(
        block_staggered_nd(np.asarray(Tj), nl, p, (2, 2, 2))
    )
    with mesh:
        T_d, err, iters = heatdiffusion_PT_sharded_3d(
            mesh, dec, T_blocks, jnp.asarray(K), jnp.asarray(rho_Cp),
            jnp.asarray(H), pt, bc, dt, geometry.di,
            iter_max=20_000, nout=200,
        )
    from justrelax_tpu.parallel.decomp import unblock_staggered_nd

    T_global = unblock_staggered_nd(np.asarray(T_d), nl, p, (2, 2, 2))
    assert float(err) < 1.0e-9
    np.testing.assert_allclose(
        T_global, np.asarray(t_s.T), atol=5e-11,
        err_msg="distributed 3D thermal != serial",
    )
