"""Variational (sticky-air) Stokes solver tests.

Oracles: (a) all-rock RockRatio reproduces the standard VEP solver; (b) a
sticky-air free-surface setup (dense blob in fluid under air) converges below
the reference Volcano2D criterion 1e-4 (test_Volcano2D.jl:400) with zero
velocity in the air nullspace."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from justrelax_tpu.core.coeffs import PTStokesCoeffs
from justrelax_tpu.core.grid import Geometry
from justrelax_tpu.core.state import StokesState
from justrelax_tpu.ops.bc import Faces, VelocityBoundaryConditions
from justrelax_tpu.ops.rock_ratio import RockRatio, update_rock_ratio, valid_masks
from justrelax_tpu.rheology.materials import Material, MaterialStack
from justrelax_tpu.rheology.phases import PhaseRatios, phase_ratios_from_field
from justrelax_tpu.solvers.stokes2d_variational import solve_variational
from justrelax_tpu.solvers.stokes2d_vep import solve_vep


def test_rock_ratio_masks():
    phase = jnp.asarray(np.repeat([0, 0, 1, 1], 4).reshape(4, 4).T)  # air=1 on top
    pr = phase_ratios_from_field(phase, 2)
    phi = update_rock_ratio(pr, air_phase=1)
    assert phi.center.shape == (4, 4)
    np.testing.assert_allclose(np.asarray(phi.center[:, 0]), 1.0)  # bottom rock
    np.testing.assert_allclose(np.asarray(phi.center[:, -1]), 0.0)  # top air
    vm = valid_masks(phi)
    assert bool(vm.c[0, 0]) and not bool(vm.c[0, -1])


@pytest.mark.slow
def test_all_rock_matches_standard_vep():
    """φ ≡ 1 ⇒ variational solver == standard VEP solver."""
    n = 16
    ni = (n, n)
    geom = Geometry(ni, (1.0, 1.0))
    mat = MaterialStack.make([Material(rho0=1.0, eta0=1.0, gravity=1.0)])
    prc = jnp.ones(ni + (1,))
    prv = jnp.ones((n + 1, n + 1, 1))
    phi = RockRatio(
        center=jnp.ones(ni), vertex=jnp.ones((n + 1, n + 1)),
        Vx=jnp.ones((n + 1, n)), Vy=jnp.ones((n, n + 1)),
    )
    pt = PTStokesCoeffs.make(geom.li, geom.di, CFL=1.0 / math.sqrt(2.1))
    bc = VelocityBoundaryConditions(free_slip=Faces(left=True, right=True, top=True, bot=True))
    # density perturbation to drive flow
    X, Y = geom.cell_centers_mesh()
    rho_pert = jnp.asarray(0.1 * np.sin(np.pi * X) * np.sin(np.pi * Y))
    mat2 = MaterialStack.make([Material(rho0=1.0, alpha=1.0, T0=0.0, eta0=1.0, gravity=1.0)])
    T = -rho_pert  # ρ = ρ0(1 − α(T−T0)) → adds +ρ0·rho_pert

    s0 = StokesState.make(ni)
    sA, iA = solve_vep(s0, pt, geom, bc, mat2, prc, prv, jnp.inf, T=T,
                       iter_max=4000, nout=200)
    sB, iB = solve_variational(s0, pt, geom, bc, mat2, prc, prv, phi, jnp.inf, T=T,
                               iter_max=4000, nout=200)
    np.testing.assert_allclose(np.asarray(sB.V.Vx), np.asarray(sA.V.Vx), atol=1e-12)
    np.testing.assert_allclose(np.asarray(sB.P), np.asarray(sA.P), atol=1e-12)


@pytest.mark.slow
def test_sticky_air_free_surface():
    """Dense blob sinking under a sticky-air layer: converges < 1e-4 and the
    air nullspace stays at rest."""
    n = 32
    ni = (n, n)
    geom = Geometry(ni, (1.0, 1.0))
    X, Y = geom.cell_centers_mesh()
    # phases: 0 = fluid, 1 = air (top 25%), 2 = dense blob
    phase = np.zeros(ni, dtype=int)
    phase[Y > 0.75] = 1
    blob = (X - 0.5) ** 2 + (Y - 0.4) ** 2 <= 0.1**2
    phase[blob] = 2
    pr = phase_ratios_from_field(jnp.asarray(phase), 3)
    phi = update_rock_ratio(pr, air_phase=1)

    mats = MaterialStack.make([
        Material(rho0=1.0, eta0=1.0, gravity=10.0),
        Material(rho0=0.0, eta0=1.0e-3, gravity=10.0),  # air
        Material(rho0=2.0, eta0=1.0, gravity=10.0),
    ])
    pt = PTStokesCoeffs.make(geom.li, geom.di, eps_rel=1e-6, CFL=1.0 / math.sqrt(2.1))
    bc = VelocityBoundaryConditions(free_slip=Faces(left=True, right=True, top=True, bot=True))
    s0 = StokesState.make(ni)
    s, info = solve_variational(
        s0, pt, geom, bc, mats, pr.center, pr.vertex, phi, jnp.inf,
        iter_max=30_000, nout=500,
    )
    assert float(info.err) < 1.0e-4
    vm = valid_masks(phi)
    # velocities at invalid faces are zero; interior rock flows downward
    Vy_in = np.asarray(s.V.Vy[1:-1, 1:-1])
    assert np.abs(Vy_in[~np.asarray(vm.vy)[:, 1:-1]]).max() == 0.0
    blob_vy = Vy_in[np.asarray(phase[:, :-1] == 2)]
    assert blob_vy.mean() < 0  # blob sinks
