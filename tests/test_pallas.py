"""Pallas VMEM-resident chunk kernel == XLA solver path (interpret mode)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from justrelax_tpu.core.coeffs import PTStokesCoeffs
from justrelax_tpu.core.grid import Geometry
from justrelax_tpu.core.state import StokesState
from justrelax_tpu.models import solcx
from justrelax_tpu.ops.bc import Faces, VelocityBoundaryConditions
from justrelax_tpu.ops.pallas_stokes import stokes_chunk_vmem
from justrelax_tpu.ops.stencil import maxloc
from justrelax_tpu.solvers.stokes2d import solve_ve


@pytest.mark.slow
def test_pallas_chunk_matches_solver():
    n = 32
    geom = Geometry((n, n), (1.0, 1.0))
    eta = jnp.asarray(solcx.solcx_viscosity(geom, 1e6))
    rho = jnp.asarray(solcx.solcx_density(geom))
    pt = PTStokesCoeffs.make(
        geom.li, geom.di, CFL=1 / math.sqrt(2.1), eps_abs=0.0, eps_rel=0.0
    )
    bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True)
    )
    z = jnp.zeros((n, n))
    out = stokes_chunk_vmem(
        jnp.zeros((n + 1, n + 2)), jnp.zeros((n + 2, n + 1)), z, z, z,
        jnp.zeros((n + 1, n + 1)), eta, maxloc(eta, 1), z, rho,
        float(n), float(n), pt.r, pt.theta_dtau, pt.etadtau,
        nout=500, interpret=True,
    )
    stokes = StokesState.make((n, n)).replace()
    stokes = stokes.replace(viscosity=stokes.viscosity.replace(eta=eta))
    G = jnp.full((n, n), jnp.inf)
    K = jnp.full((n, n), jnp.inf)
    sj, _ = solve_ve(stokes, pt, geom, bc, (z, rho), G, K, 0.1,
                     iter_max=500, nout=500)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(sj.V.Vx), atol=1e-14)
    np.testing.assert_allclose(np.asarray(out[2]), np.asarray(sj.P), atol=1e-13)
    np.testing.assert_allclose(np.asarray(out[5]), np.asarray(sj.tau.xy), atol=1e-13)
