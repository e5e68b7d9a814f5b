"""Legacy explicit diffusion module (reference DiffusionExplicit.jl).

Oracles (the reference never tests this unexported module, so the oracles
here are analytic): 2D/3D Gaussian diffusion amplitude decay, translation of
a blob under upwind advection, cross-validation of the explicit stepper
against the golden-validated PT solver, the 1D PT solve reaching the steady
linear Dirichlet profile, and nonuniform-grid consistency.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from justrelax_tpu.core.coeffs import PTThermalCoeffs
from justrelax_tpu.core.grid import Geometry, NonuniformGeometry
from justrelax_tpu.core.state import ThermalState
from justrelax_tpu.ops.bc import Faces, TemperatureBoundaryConditions, thermal_bcs
from justrelax_tpu.solvers.thermal import heatdiffusion_PT
from justrelax_tpu.solvers.thermal_explicit import (
    ThermalParameters,
    explicit_diffusion_step,
    solve_explicit,
    solve_pt_1d,
    stable_dt_explicit,
)


def _gaussian_setup(ni=(64, 64), L=1.0, sigma=0.08, kappa0=1.0):
    geometry = Geometry(ni, (L,) * len(ni))
    thermal = ThermalState.make(ni)
    # ghost-inclusive cell centers: x_i = −L/2 + (i − 0.5)·dx, i = 0..n+1
    mesh = jnp.meshgrid(
        *[(jnp.arange(n + 2) - 0.5) * (L / n) - 0.5 * L for n in ni],
        indexing="ij",
    )
    r2 = sum(x**2 for x in mesh)
    T0 = jnp.exp(-r2 / sigma**2)
    thermal = thermal.replace(T=T0, Told=T0)
    params = ThermalParameters.make(
        jnp.full(ni, kappa0), jnp.ones(ni)
    )
    bcs = TemperatureBoundaryConditions(
        no_flux=Faces(left=True, right=True, top=True, bot=True)
    )
    return thermal, params, geometry, bcs, sigma, kappa0


def test_explicit_gaussian_amplitude_2d():
    """2D heat kernel: peak amplitude decays as σ²/(σ²+4κt)."""
    thermal, params, geometry, bcs, sigma, kappa0 = _gaussian_setup()
    dt = 0.5 * stable_dt_explicit(params, geometry.di)
    nt = 200
    out = jax.jit(
        lambda th: solve_explicit(th, params, geometry, bcs, dt, nt)
    )(thermal)
    t = nt * dt
    want = sigma**2 / (sigma**2 + 4.0 * kappa0 * t)
    got = float(out.T.max())
    assert abs(got - want) / want < 2.0e-2
    # conservation with no-flux walls
    assert abs(float(out.T[1:-1, 1:-1].sum() - thermal.T[1:-1, 1:-1].sum())) < 1e-10 * float(
        thermal.T[1:-1, 1:-1].sum()
    )


def test_explicit_matches_pt_solver():
    """Explicit × many small steps vs PT-implicit at the same t_total: the
    difference is pure time discretization — it must shrink ~linearly as the
    implicit step is halved (both schemes are first-order; the spatial
    operator is shared)."""
    thermal, params, geometry, bcs, *_ = _gaussian_setup(ni=(48, 48))
    K = jnp.ones((48, 48))
    rhoCp = jnp.ones((48, 48))
    dt_e = 0.4 * stable_dt_explicit(params, geometry.di)
    n_sub = 20
    t_step = n_sub * dt_e

    th_e = thermal
    th_e = jax.jit(
        lambda th: solve_explicit(th, params, geometry, bcs, dt_e, 3 * n_sub)
    )(th_e)

    def pt_run(dt_imp, n_steps):
        pt = PTThermalCoeffs.make(K, rhoCp, dt_imp, geometry.di, geometry.li, CFL=0.95)
        th = thermal
        for _ in range(n_steps):
            th, info = heatdiffusion_PT(
                th, pt, bcs, dt_imp, geometry, K=K, rho_Cp=rhoCp,
                iter_max=20_000, nout=100,
            )
            assert float(info.err) < 1e-8
        return th

    diff1 = float(jnp.abs(th_e.T - pt_run(t_step, 3).T).max())
    diff2 = float(jnp.abs(th_e.T - pt_run(0.5 * t_step, 6).T).max())
    assert diff1 < 0.1  # same physics at coarse dt
    assert diff2 < 0.65 * diff1  # first-order convergence toward explicit


def test_upwind_advection_translates_blob():
    """κ=0, uniform V: the blob's center of mass moves with V·t."""
    ni = (64, 64)
    thermal, params, geometry, bcs, sigma, _ = _gaussian_setup(ni=ni)
    params = ThermalParameters.make(jnp.zeros(ni), jnp.ones(ni))
    vx0 = 0.25
    Vx = jnp.full((ni[0] + 1, ni[1] + 2), vx0)
    Vy = jnp.zeros((ni[0] + 2, ni[1] + 1))
    dx = geometry.di[0]
    dt = 0.3 * dx / vx0  # CFL < 1
    nt = 40
    out = jax.jit(
        lambda th: solve_explicit(th, params, geometry, bcs, dt, nt, V=(Vx, Vy))
    )(thermal)
    x = np.asarray(geometry.xci[0])
    Ti = np.asarray(out.T[1:-1, 1:-1])
    T0 = np.asarray(thermal.T[1:-1, 1:-1])
    com0 = (x[:, None] * T0).sum() / T0.sum()
    com1 = (x[:, None] * Ti).sum() / Ti.sum()
    assert abs((com1 - com0) - vx0 * nt * dt) < 1.5 * dx
    # upwind is diffusive but monotone: no new extrema
    assert Ti.max() <= T0.max() + 1e-12 and Ti.min() >= T0.min() - 1e-12


def test_explicit_3d_shapes_and_decay():
    ni = (16, 16, 16)
    geometry = Geometry(ni, (1.0, 1.0, 1.0))
    thermal = ThermalState.make(ni)
    mesh = jnp.meshgrid(
        *[jnp.linspace(-0.5, 0.5, n + 2) for n in ni], indexing="ij"
    )
    T0 = jnp.exp(-sum(x**2 for x in mesh) / 0.05)
    thermal = thermal.replace(T=T0, Told=T0)
    params = ThermalParameters.make(jnp.ones(ni), jnp.ones(ni))
    bcs = TemperatureBoundaryConditions(
        no_flux=Faces(left=True, right=True, top=True, bot=True, front=True, back=True)
    )
    dt = 0.5 * stable_dt_explicit(params, geometry.di)
    out = explicit_diffusion_step(thermal, params, geometry, bcs, dt)
    assert out.T.shape == tuple(n + 2 for n in ni)
    assert out.qTz.shape == (16, 16, 17)
    assert float(out.T.max()) < float(thermal.T.max())
    assert np.isfinite(np.asarray(out.T)).all()


def test_explicit_nonuniform_uniform_vectors_bitmatch():
    """Vector-spacing grid with uniform spacings == scalar-spacing path."""
    ni = (24, 20)
    L = (1.2, 1.0)
    geom_u = Geometry(ni, L)
    xv = np.linspace(0.0, L[0], ni[0] + 1)
    yv = np.linspace(0.0, L[1], ni[1] + 1)
    geom_n = NonuniformGeometry((xv, yv))
    thermal = ThermalState.make(ni)
    rng = np.random.default_rng(3)
    T0 = jnp.asarray(rng.random((ni[0] + 2, ni[1] + 2)))
    thermal = thermal.replace(T=T0, Told=T0)
    params = ThermalParameters.make(jnp.ones(ni) * 2.0, jnp.ones(ni))
    bcs = TemperatureBoundaryConditions(
        no_flux=Faces(left=True, right=True, top=True, bot=True)
    )
    dt = 0.5 * stable_dt_explicit(params, geom_u.di)
    out_u = explicit_diffusion_step(thermal, params, geom_u, bcs, dt)
    out_n = explicit_diffusion_step(thermal, params, geom_n, bcs, dt)
    np.testing.assert_allclose(
        np.asarray(out_u.T), np.asarray(out_n.T), rtol=0, atol=1e-13
    )


def test_pt_1d_linear_steady_state():
    """Huge implicit dt → steady conduction: linear profile between the
    Dirichlet values (reference ThermalDiffusion1D module)."""
    nx = 64
    dx = 1.0 / nx
    T = jnp.zeros((nx + 2,))
    K = jnp.ones((nx,))
    rhoCp = jnp.ones((nx,))
    bcs = TemperatureBoundaryConditions(
        constant_value=Faces(left=1.0, right=0.0)
    )
    res = solve_pt_1d(T, K, rhoCp, dx, dt=1.0e8, bcs=bcs, eps=1e-10)
    assert float(res.err) < 1e-10
    x = (np.arange(nx) + 0.5) * dx
    want = 1.0 - x
    np.testing.assert_allclose(np.asarray(res.T[1:-1]), want, atol=1e-6)


def test_pt_1d_transient_erf():
    """One implicit step of moderate dt from a step profile ≈ erf solution."""
    nx = 128
    dx = 1.0 / nx
    x = (np.arange(nx) + 0.5) * dx
    T0 = np.where(x < 0.5, 1.0, 0.0)
    T = jnp.asarray(np.pad(T0, 1, mode="edge"))
    K = jnp.ones((nx,))
    rhoCp = jnp.ones((nx,))
    bcs = TemperatureBoundaryConditions(no_flux=Faces(left=True, right=True))
    # several small implicit steps to bound the O(dt) error; diffusion length
    # 2√t must cover several cells for the discrete step ≈ erf comparison
    t, dt = 0.0, 5.0e-4
    for _ in range(20):
        res = solve_pt_1d(T, K, rhoCp, dx, dt=dt, bcs=bcs, eps=1e-10)
        T = res.T
        t += dt
    from math import erf

    want = np.array([0.5 * (1.0 - erf((xi - 0.5) / (2.0 * math.sqrt(t)))) for xi in x])
    np.testing.assert_allclose(np.asarray(T[1:-1]), want, atol=5e-3)
