"""3D variational Stokes: masked solver vs unmasked oracle + sticky air.

Covers reference variational_stokes/Stokes3D.jl + mask.jl 3D forms.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from justrelax_tpu.core.coeffs import PTStokesCoeffs
from justrelax_tpu.core.grid import Geometry
from justrelax_tpu.core.state import StokesState
from justrelax_tpu.ops.bc import Faces, VelocityBoundaryConditions
from justrelax_tpu.ops.rock_ratio import update_rock_ratio_3d, valid_masks_3d
from justrelax_tpu.rheology.phases import PhaseRatios3D, phase_ratios_from_field
from justrelax_tpu.solvers.stokes3d import solve_ve_3d
from justrelax_tpu.solvers.stokes3d_variational import solve_variational_3d


def _setup(ni, phases, nphase, air=None):
    geometry = Geometry(ni, (1.0, 1.0, 1.0))
    pr = phase_ratios_from_field(jnp.asarray(phases), nphase)
    assert isinstance(pr, PhaseRatios3D)
    return geometry, pr


def test_phase_ratios_3d_shapes_and_sums():
    nx, ny, nz = 6, 5, 4
    rng = np.random.default_rng(0)
    phases = rng.integers(0, 3, size=(nx, ny, nz))
    pr = phase_ratios_from_field(jnp.asarray(phases), 3)
    assert pr.center.shape == (nx, ny, nz, 3)
    assert pr.vertex.shape == (nx + 1, ny + 1, nz + 1, 3)
    assert pr.face_x.shape == (nx + 1, ny, nz, 3)
    assert pr.face_y.shape == (nx, ny + 1, nz, 3)
    assert pr.face_z.shape == (nx, ny, nz + 1, 3)
    assert pr.edge_xy.shape == (nx + 1, ny + 1, nz, 3)
    assert pr.edge_xz.shape == (nx + 1, ny, nz + 1, 3)
    assert pr.edge_yz.shape == (nx, ny + 1, nz + 1, 3)
    for f in pr:
        np.testing.assert_allclose(np.asarray(jnp.sum(f, axis=-1)), 1.0, atol=1e-12)


def test_rock_ratio_3d_and_masks():
    nx = ny = nz = 6
    phases = np.zeros((nx, ny, nz), dtype=int)
    phases[:, :, 4:] = 1  # air on top (z)
    pr = phase_ratios_from_field(jnp.asarray(phases), 2)
    phi = update_rock_ratio_3d(pr, air_phase=1)
    vm = valid_masks_3d(phi)
    # deep rock fully valid; pure-air centers invalid
    assert bool(vm.c[:, :, 0].all())
    assert not bool(vm.c[:, :, -1].any())
    # Vz faces inside air are invalid, deep ones valid
    assert bool(vm.vz[:, :, 0].all()) and not bool(vm.vz[:, :, -1].any())


def test_variational3d_phi_one_matches_unmasked():
    """With φ ≡ 1 the masked solver must reproduce solve_ve_3d exactly."""
    ni = (8, 8, 8)
    geometry = Geometry(ni, (1.0, 1.0, 1.0))
    rng = np.random.default_rng(1)
    eta = jnp.asarray(np.exp(rng.normal(size=ni) * 0.3))
    rho = jnp.asarray(1.0 + 0.1 * rng.normal(size=ni))
    zeros = jnp.zeros(ni)
    G = jnp.full(ni, jnp.inf)
    K = jnp.asarray(jnp.inf)
    flow_bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True,
                        front=True, back=True)
    )
    pt = PTStokesCoeffs.make(
        geometry.li, geometry.di, CFL=1.0 / math.sqrt(3.0), eps_rel=1.0e-30,
        eps_abs=1.0e-30,
    )
    phases = np.zeros(ni, dtype=int)
    pr = phase_ratios_from_field(jnp.asarray(phases), 2)
    phi = update_rock_ratio_3d(pr, air_phase=1)

    s0 = StokesState.make(ni)
    s0 = s0.replace(viscosity=s0.viscosity.replace(eta=eta))
    args = ((zeros, zeros, rho), G, K, jnp.inf)
    s_ref, _ = solve_ve_3d(s0, pt, geometry, flow_bc, *args,
                           iter_max=200, nout=100)
    s_var, _ = solve_variational_3d(s0, pt, geometry, flow_bc, args[0], G, K,
                                    phi, jnp.inf, iter_max=200, nout=100)
    np.testing.assert_allclose(
        np.asarray(s_var.V.Vz), np.asarray(s_ref.V.Vz), atol=1e-13
    )
    np.testing.assert_allclose(
        np.asarray(s_var.P), np.asarray(s_ref.P), atol=1e-13
    )


@pytest.mark.slow
def test_variational3d_sticky_air():
    """Dense sphere sinking under sticky air: converges, air at rest."""
    ni = (12, 12, 16)
    geometry = Geometry(ni, (1.0, 1.0, 4.0 / 3.0))
    X = geometry.cell_centers_mesh()
    x, y, z = (np.asarray(a) for a in X)
    air = z > 1.0
    sphere = (x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2 < 0.2**2
    phases = np.where(air, 2, np.where(sphere, 1, 0))
    pr = phase_ratios_from_field(jnp.asarray(phases), 3)
    phi = update_rock_ratio_3d(pr, air_phase=2)

    eta = jnp.asarray(np.where(sphere, 10.0, 1.0))
    rho = jnp.asarray(np.where(air, 0.0, np.where(sphere, 2.0, 1.0)))
    zeros = jnp.zeros(ni)
    G = jnp.full(ni, jnp.inf)
    flow_bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True,
                        front=True, back=True)
    )
    pt = PTStokesCoeffs.make(
        geometry.li, geometry.di, CFL=1.0 / math.sqrt(3.0), eps_rel=1.0e-6
    )
    s = StokesState.make(ni)
    s = s.replace(viscosity=s.viscosity.replace(eta=eta))
    s, info = solve_variational_3d(
        s, pt, geometry, flow_bc, (zeros, zeros, rho), G, jnp.asarray(jnp.inf),
        phi, jnp.inf, iter_max=20_000, nout=500,
    )
    assert int(info.iters) < 20_000
    Vz = np.asarray(s.V.Vz)
    # sphere sinks (negative Vz below/at the sphere), air column at rest
    assert Vz[6, 6, 6] < -1.0e-4
    vm = valid_masks_3d(phi)
    assert np.abs(Vz[1:-1, 1:-1, 1:-1][~np.asarray(vm.vz[:, :, 1:-1])]).max() == 0.0
