"""Shear-heating configuration solved with DYREL
(Shearheating2D_DYREL.jl analogue: nonlinear dislocation creep +
temperature-dependent viscosity through the dynamic-relaxation solver,
cross-checked against the APT solution of the identical problem)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from justrelax_tpu.core.coeffs import PTStokesCoeffs
from justrelax_tpu.core.grid import Geometry
from justrelax_tpu.core.state import StokesState
from justrelax_tpu.ops.bc import Faces, VelocityBoundaryConditions, flow_bcs
from justrelax_tpu.ops.heating import compute_shear_heating
from justrelax_tpu.rheology.materials import Material, MaterialStack
from justrelax_tpu.rheology.phases import phase_ratios_from_field
from justrelax_tpu.rheology.viscosity import phase_viscosity
from justrelax_tpu.solvers.dyrel import solve_dyrel
from justrelax_tpu.solvers.stokes2d_vep import solve_vep


@pytest.mark.slow
def test_shearheating_config_dyrel_matches_apt():
    nx = ny = 32
    lx, ly = 70.0e3, 40.0e3
    ni = (nx, ny)
    geometry = Geometry(ni, (lx, ly), origin=(0.0, -ly))
    xvi = geometry.xvi
    common = dict(rho0=2700.0, Cp=1050.0, k=2.5, gravity=9.81)
    material = MaterialStack.make([
        Material(disl_A=3.2e-20, disl_n=3.0, disl_E=276.0e3, **common),
        Material(disl_A=3.16e-26, disl_n=3.3, disl_E=186.0e3, **common),
    ])
    X, Y = geometry.cell_centers_mesh()
    depth = -Y
    incl = (X - lx / 2) ** 2 + (depth - 25.0e3) ** 2 <= 3.0e3**2
    pr = phase_ratios_from_field(jnp.asarray(incl.astype(int)), 2)

    stokes = StokesState.make(ni)
    dt_f = stokes.P.dtype
    T0 = 273.0 + 400.0
    T_c = jnp.full(ni, T0, dt_f)
    eps_bg = 5.0e-14
    eta0 = phase_viscosity(
        material, jnp.full(ni, eps_bg, dt_f), T_c, pr.center, mode="eps")
    eta0_v = phase_viscosity(
        material, jnp.full((nx + 1, ny + 1), eps_bg, dt_f),
        jnp.full((nx + 1, ny + 1), T0, dt_f), pr.vertex, mode="eps")
    xv = jnp.asarray(xvi[0], dt_f)
    yv = jnp.asarray(xvi[1], dt_f)
    Vx = jnp.broadcast_to((-(xv - lx / 2) * eps_bg)[:, None], (nx + 1, ny + 2))
    Vy = jnp.broadcast_to(((ly - jnp.abs(yv)) * eps_bg)[None, :], (nx + 2, ny + 1))
    bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True))
    Vx, Vy = flow_bcs((Vx, Vy), bc)
    stokes = stokes.replace(
        V=stokes.V.replace(Vx=Vx, Vy=Vy),
        viscosity=stokes.viscosity.replace(eta=eta0, eta_v=eta0_v),
    )

    # APT reference solve
    pt = PTStokesCoeffs.make(
        geometry.li, geometry.di, eps_rel=1.0e-9, eps_abs=1.0e-5,
        CFL=0.9 / math.sqrt(2.1))
    s_apt, info_apt = solve_vep(
        stokes, pt, geometry, bc, material, pr.center, pr.vertex, jnp.inf,
        T=T_c, iter_max=100_000, nout=500, viscosity_cutoff=(1.0e18, 1.0e24))

    # DYREL solve with nonlinear viscosity refresh
    s_dyr, info_dyr = solve_dyrel(
        stokes, geometry, bc, material, pr.center, pr.vertex, jnp.inf,
        T=T_c, linear_viscosity=False, viscosity_relaxation=1.0e-2,
        viscosity_cutoff=(1.0e18, 1.0e24), eps=1.0e-7, nout=100,
        iter_max=20_000, total_iter_max=100_000,
    )

    tII_a = np.asarray(s_apt.tau.II)
    tII_d = np.asarray(s_dyr.tau.II)
    assert np.isfinite(tII_d).all()
    # stress amplified inside the weak inclusion's pressure shadows;
    # the two solvers agree on the nonlinear solution to ~2.6% (measured,
    # independent of convergence level down to err 2e-10: the residual
    # mismatch comes from the solvers' different viscosity-continuation
    # evaluation points on an n=3 power law, not iteration error)
    scale = tII_a.max()
    assert np.abs(tII_d - tII_a).max() < 5.0e-2 * scale
    np.testing.assert_allclose(tII_d.max(), tII_a.max(), rtol=4e-2)

    # dissipation non-negative on the DYREL solution (test_shearheating2D.jl)
    H = compute_shear_heating(
        s_dyr.tau.xx, s_dyr.tau.yy, s_dyr.tau.xy_c,
        s_dyr.tau_o.xx, s_dyr.tau_o.yy, s_dyr.tau_o.xy_c,
        s_dyr.eps.xx, s_dyr.eps.yy, s_dyr.eps.xy,
        material, jnp.inf, phase_ratios=pr.center,
    )
    assert float(jnp.min(H)) >= -1.0e-20
