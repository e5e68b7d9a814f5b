"""VMEM-resident Pallas thermal chunk (ops/pallas_thermal.py):
interpret-mode equivalence with the XLA iteration and solver dispatch."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from justrelax_tpu.core.coeffs import PTThermalCoeffs
from justrelax_tpu.core.grid import Geometry
from justrelax_tpu.core.state import ThermalState
from justrelax_tpu.ops import thermal as kernels
from justrelax_tpu.ops.bc import Faces, TemperatureBoundaryConditions, thermal_bcs
from justrelax_tpu.ops.pallas_thermal import thermal_chunk_vmem
from justrelax_tpu.solvers.thermal import heatdiffusion_PT


def _setup(n):
    ni = (n, n)
    geom = Geometry(ni, (1.0, 1.0))
    rng = np.random.default_rng(0)
    K = jnp.asarray(np.exp(0.2 * rng.normal(size=ni)))
    rc = jnp.asarray(1.0 + 0.1 * rng.random(ni))
    bc = TemperatureBoundaryConditions(
        no_flux=Faces(left=True, right=True),
        constant_value=Faces(top=0.0, bot=1.0),
    )
    Tg = jnp.zeros((n + 2, n + 2)).at[:, 1:-1].set(
        jnp.asarray(np.linspace(1, 0, n)[None, :] * np.ones((n + 2, 1))))
    Tg = thermal_bcs(Tg, bc)
    return ni, geom, K, rc, bc, Tg


def test_thermal_chunk_matches_xla():
    n = 32
    ni, geom, K, rc, bc, Tg = _setup(n)
    dt = 0.3
    pt = PTThermalCoeffs.make(K, rc, dt, geom.di, geom.li)
    inv_d = 1.0 / geom.di[0]
    H = jnp.zeros(ni)
    adia = jnp.asarray(0.01 * np.random.default_rng(1).random(ni))
    qx = jnp.zeros((n + 1, n))
    qy = jnp.zeros((n, n + 1))
    NIT = 137
    T = Tg
    q, q2 = (qx, qy), (qx, qy)
    for _ in range(NIT):
        q, q2 = kernels.compute_flux(
            q, q2, T, (inv_d, inv_d), pt.theta_r_dtau, bc.constant_flux, K=K)
        T = kernels.update_T(
            T, Tg, q, H, H, 1.0 / dt, (inv_d, inv_d), pt.dtau_rho,
            rho_Cp=rc, adiabatic=adia)
        T = thermal_bcs(T, bc)
    T2, qx2, qy2 = thermal_chunk_vmem(
        Tg, qx, qy, Tg, K, rc, H + H, pt.dtau_rho, pt.theta_r_dtau,
        1.0 / dt, inv_d, inv_d, bc, adiabatic=adia, nout=NIT, interpret=True)
    assert float(jnp.abs(T2 - T).max()) < 1e-13
    assert float(jnp.abs(qx2 - q[0]).max()) < 1e-13
    assert float(jnp.abs(qy2 - q[1]).max()) < 1e-13


@pytest.mark.slow
def test_heatdiffusion_use_pallas_dispatch():
    """heatdiffusion_PT(use_pallas=True) reproduces the XLA solve."""
    n = 32
    ni, geom, K, rc, bc, Tg = _setup(n)
    th = ThermalState.make(ni)
    th = th.replace(T=Tg, Told=Tg)
    pt = PTThermalCoeffs.make(K, rc, 0.3, geom.di, geom.li)
    kw = dict(K=K, rho_Cp=rc, iter_max=4000, nout=200)
    t_ref, i_ref = heatdiffusion_PT(th, pt, bc, 0.3, geom, **kw)
    t_pal, i_pal = heatdiffusion_PT(th, pt, bc, 0.3, geom,
                                    use_pallas=True, **kw)
    assert int(i_pal.iters) == int(i_ref.iters)
    np.testing.assert_allclose(
        np.asarray(t_pal.T), np.asarray(t_ref.T), atol=1e-13)


def test_thermal_chunk_dispatch_guards():
    n = 16
    ni, geom, K, rc, bc, Tg = _setup(n)
    th = ThermalState.make(ni).replace(T=Tg, Told=Tg)
    pt = PTThermalCoeffs.make(K, rc, 0.3, geom.di, geom.li)
    bad_bc = TemperatureBoundaryConditions(
        periodic=Faces(left=True, right=True),
        constant_value=Faces(top=0.0, bot=1.0),
    )
    with pytest.raises(ValueError):
        heatdiffusion_PT(th, pt, bad_bc, 0.3, geom, K=K, rho_Cp=rc,
                         use_pallas=True, iter_max=100, nout=50)
