"""Ghost-node BC application (reference test_boundary_conditions2D.jl)."""

import jax.numpy as jnp
import numpy as np

from justrelax_tpu.ops.bc import (
    Faces,
    TemperatureBoundaryConditions,
    VelocityBoundaryConditions,
    flow_bcs,
    thermal_bcs,
)


def test_thermal_dirichlet_ghost():
    T = jnp.asarray(np.random.default_rng(0).uniform(1, 2, (6, 6)))
    bc = TemperatureBoundaryConditions(constant_value=Faces(top=300.0, bot=3500.0))
    T2 = thermal_bcs(T, bc)
    np.testing.assert_allclose(np.asarray(T2[:, 0]), 2 * 3500.0 - np.asarray(T2[:, 1]))
    np.testing.assert_allclose(np.asarray(T2[:, -1]), 2 * 300.0 - np.asarray(T2[:, -2]))
    # untouched interior
    np.testing.assert_allclose(np.asarray(T2[:, 1:-1]), np.asarray(T[:, 1:-1]))


def test_thermal_no_flux_mirror():
    T = jnp.asarray(np.random.default_rng(1).uniform(1, 2, (6, 6)))
    bc = TemperatureBoundaryConditions(no_flux=Faces(left=True, right=True))
    T2 = thermal_bcs(T, bc)
    np.testing.assert_allclose(np.asarray(T2[0, :]), np.asarray(T2[1, :]))
    np.testing.assert_allclose(np.asarray(T2[-1, :]), np.asarray(T2[-2, :]))


def test_thermal_periodic():
    T = jnp.asarray(np.random.default_rng(2).uniform(1, 2, (6, 6)))
    bc = TemperatureBoundaryConditions(periodic=Faces(left=True, right=True))
    T2 = thermal_bcs(T, bc)
    np.testing.assert_allclose(np.asarray(T2[0, :]), np.asarray(T[-2, :]))
    np.testing.assert_allclose(np.asarray(T2[-1, :]), np.asarray(T[1, :]))


def test_free_slip_velocity():
    rng = np.random.default_rng(3)
    nx, ny = 6, 5
    Vx = jnp.asarray(rng.standard_normal((nx + 1, ny + 2)))
    Vy = jnp.asarray(rng.standard_normal((nx + 2, ny + 1)))
    bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True)
    )
    Vx2, Vy2 = flow_bcs((Vx, Vy), bc)
    # tangential ghost mirrors
    np.testing.assert_allclose(np.asarray(Vx2[:, 0]), np.asarray(Vx2[:, 1]))
    np.testing.assert_allclose(np.asarray(Vx2[:, -1]), np.asarray(Vx2[:, -2]))
    np.testing.assert_allclose(np.asarray(Vy2[0, :]), np.asarray(Vy2[1, :]))
    np.testing.assert_allclose(np.asarray(Vy2[-1, :]), np.asarray(Vy2[-2, :]))


def test_no_slip_velocity():
    rng = np.random.default_rng(4)
    nx, ny = 6, 5
    Vx = jnp.asarray(rng.standard_normal((nx + 1, ny + 2)))
    Vy = jnp.asarray(rng.standard_normal((nx + 2, ny + 1)))
    bc = VelocityBoundaryConditions(
        no_slip=Faces(left=True, right=True, top=True, bot=True)
    )
    Vx2, Vy2 = flow_bcs((Vx, Vy), bc)
    np.testing.assert_allclose(np.asarray(Vx2[0, :]), 0.0)
    np.testing.assert_allclose(np.asarray(Vx2[-1, :]), 0.0)
    np.testing.assert_allclose(np.asarray(Vy2[:, 0]), 0.0)
    np.testing.assert_allclose(np.asarray(Vy2[:, -1]), 0.0)
    np.testing.assert_allclose(np.asarray(Vy2[0, :]), -np.asarray(Vy2[1, :]))
    np.testing.assert_allclose(np.asarray(Vx2[:, -1]), -np.asarray(Vx2[:, -2]))


def test_free_slip_3d():
    rng = np.random.default_rng(5)
    nx, ny, nz = 4, 5, 6
    Vx = jnp.asarray(rng.standard_normal((nx + 1, ny + 2, nz + 2)))
    Vy = jnp.asarray(rng.standard_normal((nx + 2, ny + 1, nz + 2)))
    Vz = jnp.asarray(rng.standard_normal((nx + 2, ny + 2, nz + 1)))
    bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True, front=True, back=True)
    )
    Vx2, Vy2, Vz2 = flow_bcs((Vx, Vy, Vz), bc)
    np.testing.assert_allclose(np.asarray(Vy2[0]), np.asarray(Vy2[1]))
    np.testing.assert_allclose(np.asarray(Vx2[:, 0, :]), np.asarray(Vx2[:, 1, :]))
    np.testing.assert_allclose(np.asarray(Vx2[:, :, 0]), np.asarray(Vx2[:, :, 1]))
    np.testing.assert_allclose(np.asarray(Vz2[-1]), np.asarray(Vz2[-2]))
