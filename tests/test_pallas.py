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


@pytest.mark.slow
def test_solve_ve_use_pallas_matches_xla():
    """solve_ve(use_pallas=True) full solve == XLA path (interpret mode)."""
    n = 32
    geom = Geometry((n, n), (1.0, 1.0))
    eta = jnp.asarray(solcx.solcx_viscosity(geom, 1e6))
    rho = jnp.asarray(solcx.solcx_density(geom))
    pt = PTStokesCoeffs.make(geom.li, geom.di, CFL=1 / math.sqrt(2.1))
    bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True)
    )
    z = jnp.zeros((n, n))
    stokes = StokesState.make((n, n))
    stokes = stokes.replace(viscosity=stokes.viscosity.replace(eta=eta))
    G = jnp.full((n, n), jnp.inf)
    K = jnp.full((n, n), jnp.inf)
    args = (stokes, pt, geom, bc, (z, rho), G, K, 0.1)
    s_x, i_x = solve_ve(*args, iter_max=4000, nout=500)
    s_p, i_p = solve_ve(*args, iter_max=4000, nout=500, use_pallas=True)
    assert float(i_p.err) < 1e-8 or float(i_p.err) <= float(i_x.err) * 1.01
    np.testing.assert_allclose(
        np.asarray(s_p.V.Vx), np.asarray(s_x.V.Vx), atol=1e-12
    )
    np.testing.assert_allclose(np.asarray(s_p.P), np.asarray(s_x.P), atol=1e-11)


def test_solve_ve_use_pallas_validation():
    n = 16
    geom = Geometry((n, n), (1.0, 1.0))
    pt = PTStokesCoeffs.make(geom.li, geom.di)
    z = jnp.zeros((n, n))
    stokes = StokesState.make((n, n))
    G = jnp.full((n, n), jnp.inf)
    bc_ns = VelocityBoundaryConditions(
        no_slip=Faces(left=True, right=True, top=True, bot=True)
    )
    with pytest.raises(ValueError, match="free-slip"):
        solve_ve(stokes, pt, geom, bc_ns, (z, z), G, G, 0.1, use_pallas=True)
    # grids past VMEM residency fall through to the blocked kernel — only a
    # grid no blocked configuration fits is rejected
    from justrelax_tpu.ops.pallas_stokes import choose_blocking

    assert choose_blocking(1024, 1024, 8) is not None
    assert choose_blocking(1024, 20000, 8) is None
    big = StokesState.make((64, 20000))
    geom_big = Geometry((64, 20000), (1.0, 1.0))
    bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True)
    )
    zb = jnp.zeros((64, 20000))
    with pytest.raises(ValueError, match="VMEM"):
        solve_ve(big, pt, geom_big, bc, (zb, zb), jnp.full((64, 20000), jnp.inf),
                 jnp.full((64, 20000), jnp.inf), 0.1, use_pallas=True)


def test_chunk_kernel_visco_elastic_compressible_matches_xla():
    """The VE/compressible coefficient path of the chunk kernel == the XLA
    fori path on the same chunk: finite G and K, nonzero tau_o memory, P0,
    Q, both gravity components, variable viscosity (interpret mode, f64)."""
    import math

    from justrelax_tpu.solvers.stokes2d import solve_ve

    n = 24
    ni = (n, n)
    geom = Geometry(ni, (1.0, 1.0))
    pt = PTStokesCoeffs.make(geom.li, geom.di, CFL=1.0 / math.sqrt(2.1),
                             eps_abs=0.0, eps_rel=0.0)
    rng = np.random.default_rng(2)
    eta = jnp.asarray(np.exp(rng.uniform(0, 2, ni)))
    stokes = StokesState.make(ni)
    stokes = stokes.replace(
        viscosity=stokes.viscosity.replace(eta=eta),
        P0=jnp.asarray(rng.standard_normal(ni)) * 0.1,
        Q=jnp.asarray(rng.standard_normal(ni)) * 0.05,
        tau_o=stokes.tau_o.replace(
            xx=jnp.asarray(rng.standard_normal(ni)) * 0.1,
            yy=jnp.asarray(rng.standard_normal(ni)) * 0.1,
            xy=jnp.asarray(rng.standard_normal((n + 1, n + 1))) * 0.1,
        ),
    )
    rho_g = (jnp.asarray(rng.standard_normal(ni)) * 0.3,
             1.0 + jnp.asarray(rng.standard_normal(ni)) * 0.2)
    G = jnp.full(ni, 4.0)
    K = jnp.full(ni, 9.0)
    bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True)
    )
    kwargs = dict(iter_max=400, nout=200)
    ref, info_ref = solve_ve(stokes, pt, geom, bc, rho_g, G, K, 0.5, **kwargs)
    out, info_out = solve_ve(stokes, pt, geom, bc, rho_g, G, K, 0.5,
                             use_pallas=True, **kwargs)
    assert int(info_ref.iters) == int(info_out.iters) == 400
    for name in ("P", "txx", "tyy"):
        a = getattr(ref.tau, name[1:]) if name.startswith("t") else ref.P
        b = getattr(out.tau, name[1:]) if name.startswith("t") else out.P
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0,
                                   atol=2e-12, err_msg=name)
    np.testing.assert_allclose(np.asarray(ref.V.Vx), np.asarray(out.V.Vx),
                               rtol=0, atol=2e-12)
    np.testing.assert_allclose(np.asarray(ref.V.Vy), np.asarray(out.V.Vy),
                               rtol=0, atol=2e-12)
    np.testing.assert_allclose(np.asarray(ref.tau.xy), np.asarray(out.tau.xy),
                               rtol=0, atol=2e-12)
    np.testing.assert_allclose(float(info_ref.err), float(info_out.err),
                               rtol=1e-9)


def test_blocked_chunk_matches_resident():
    """Grid-blocked temporally-blocked streaming kernel == VMEM-resident
    chunk kernel (interpret mode, f64): full VE/compressible physics,
    multi-block row decomposition, non-multiple-of-k nout, both DMA
    pipelines. Tolerance is 1-ulp-per-iteration: the blocked kernel
    precomputes the damped-update reciprocals host-side, so XLA's
    fusion-dependent FMA contraction may differ from the resident kernel's
    in-kernel hoisting (measured ≤4e-21 absolute on ~1e-5 values)."""
    import numpy as np

    from justrelax_tpu.ops.pallas_stokes import (
        choose_blocking,
        stokes_chunk_blocked,
    )
    from justrelax_tpu.ops.stencil import maxloc

    rng = np.random.default_rng(0)
    nx, ny = 72, 40
    geom = Geometry((nx, ny), (1.0, 1.0))
    pt = PTStokesCoeffs.make(geom.li, geom.di, CFL=1 / math.sqrt(2.1))
    eta = jnp.asarray(np.exp(rng.uniform(0, 2, (nx, ny))))
    rho_gx = jnp.asarray(rng.standard_normal((nx, ny))) * 0.3
    rho_gy = jnp.asarray(1.0 + rng.standard_normal((nx, ny)) * 0.2)
    G = jnp.full((nx, ny), 4.0)
    K = jnp.full((nx, ny), 9.0)
    P0 = jnp.asarray(rng.standard_normal((nx, ny))) * 0.1
    Q = jnp.asarray(rng.standard_normal((nx, ny))) * 0.05
    tau_o = (
        jnp.asarray(rng.standard_normal((nx, ny))) * 0.1,
        jnp.asarray(rng.standard_normal((nx, ny))) * 0.1,
        jnp.asarray(rng.standard_normal((nx + 1, ny + 1))) * 0.1,
    )
    z = jnp.zeros((nx, ny))
    args = (
        jnp.zeros((nx + 1, ny + 2)), jnp.zeros((nx + 2, ny + 1)),
        z, z, z, jnp.zeros((nx + 1, ny + 1)),
        eta, maxloc(eta, 1), rho_gx, rho_gy,
        float(nx), float(ny), float(pt.r), float(pt.theta_dtau),
        float(pt.etadtau),
    )
    kw = dict(G=G, K=K, P0=P0, Q=Q, tau_o=tau_o, dt=0.5, interpret=True)
    # 3 row-blocks of R=32 with k=2 iterations per pass (halo 4)
    assert choose_blocking(nx, ny, 8, row_block=32, iters_per_pass=2) == (
        32, 2, 3, 96, 40
    )
    for nout in (7, 16):
        ref = stokes_chunk_vmem(*args, nout=nout, **kw)
        for pipeline in (False, True):
            out = stokes_chunk_blocked(
                *args, nout=nout, row_block=32, iters_per_pass=2,
                pipeline=pipeline, **kw,
            )
            for name, a, b in zip(("Vx", "Vy", "P", "txx", "tyy", "txy"), ref, out):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-12, atol=1e-17,
                    err_msg=f"{name} (nout={nout}, pipeline={pipeline})",
                )


@pytest.mark.slow
def test_solve_ve_use_pallas_blocked_matches_xla():
    """solve_ve(use_pallas="blocked") — the grid-blocked streaming kernel
    driven through the full solver loop — matches the XLA path (interpret
    mode; FMA-contraction tolerance as in the chunk test)."""
    nx, ny = 72, 40
    geom = Geometry((nx, ny), (1.0, 1.0))
    rng = np.random.default_rng(1)
    eta = jnp.asarray(np.exp(rng.uniform(0, 2, (nx, ny))))
    rho = jnp.asarray(1.0 + 0.2 * rng.standard_normal((nx, ny)))
    pt = PTStokesCoeffs.make(geom.li, geom.di, CFL=1 / math.sqrt(2.1))
    bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True)
    )
    z = jnp.zeros((nx, ny))
    stokes = StokesState.make((nx, ny))
    stokes = stokes.replace(viscosity=stokes.viscosity.replace(eta=eta))
    G = jnp.full((nx, ny), 3.0)
    K = jnp.full((nx, ny), 7.0)
    args = (stokes, pt, geom, bc, (z, rho), G, K, 0.5)
    kwargs = dict(iter_max=400, nout=200)
    ref, info_ref = solve_ve(*args, **kwargs)
    out, info_out = solve_ve(*args, use_pallas="blocked", **kwargs)
    assert int(info_ref.iters) == int(info_out.iters)
    np.testing.assert_allclose(
        np.asarray(ref.V.Vx), np.asarray(out.V.Vx), rtol=1e-11, atol=1e-16
    )
    np.testing.assert_allclose(
        np.asarray(ref.P), np.asarray(out.P), rtol=1e-11, atol=1e-15
    )
    np.testing.assert_allclose(
        np.asarray(ref.tau.xy), np.asarray(out.tau.xy), rtol=1e-11, atol=1e-15
    )
