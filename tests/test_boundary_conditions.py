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


def test_thermal_dirichlet_all_faces():
    """Ghost = 2·v − interior on every face (reference
    test_boundary_conditions2D.jl:20-35, with distinct per-face values)."""
    T0 = jnp.asarray(np.arange(1.0, 6 * 7 + 1).reshape(6, 7))
    bc = TemperatureBoundaryConditions(
        constant_value=Faces(left=1.0, right=2.0, top=3.0, bot=4.0)
    )
    T = thermal_bcs(T0, bc)
    T, T0n = np.asarray(T), np.asarray(T0)
    np.testing.assert_array_equal(T[0, 1:-1], 2 * 1.0 - T0n[1, 1:-1])
    np.testing.assert_array_equal(T[-1, 1:-1], 2 * 2.0 - T0n[-2, 1:-1])
    np.testing.assert_array_equal(T[1:-1, -1], 2 * 3.0 - T0n[1:-1, -2])
    np.testing.assert_array_equal(T[1:-1, 0], 2 * 4.0 - T0n[1:-1, 1])


def test_thermal_periodic_all_faces():
    """Ghost = opposite interior (reference :36-49)."""
    T0 = jnp.asarray(np.arange(1.0, 6 * 7 + 1).reshape(6, 7))
    bc = TemperatureBoundaryConditions(
        periodic=Faces(left=True, right=True, top=True, bot=True)
    )
    T = thermal_bcs(T0, bc)
    T, T0n = np.asarray(T), np.asarray(T0)
    np.testing.assert_array_equal(T[0, 1:-1], T0n[-2, 1:-1])
    np.testing.assert_array_equal(T[-1, 1:-1], T0n[1, 1:-1])
    np.testing.assert_array_equal(T[1:-1, 0], T0n[1:-1, -2])
    np.testing.assert_array_equal(T[1:-1, -1], T0n[1:-1, 1])


def test_no_slip_3d():
    """3D no-slip: zero normal + negative tangential mirror on all faces
    (reference test_boundary_conditions3D.jl no-slip block)."""
    rng = np.random.default_rng(0)
    n = 4
    Vx = jnp.asarray(rng.random((n + 1, n + 2, n + 2)))
    Vy = jnp.asarray(rng.random((n + 2, n + 1, n + 2)))
    Vz = jnp.asarray(rng.random((n + 2, n + 2, n + 1)))
    bc = VelocityBoundaryConditions(
        no_slip=Faces(left=True, right=True, front=True, back=True,
                      top=True, bot=True)
    )
    Vx, Vy, Vz = flow_bcs((Vx, Vy, Vz), bc)
    Vx, Vy, Vz = np.asarray(Vx), np.asarray(Vy), np.asarray(Vz)
    # zero normal components on their faces
    assert (Vx[0] == 0).all() and (Vx[-1] == 0).all()
    assert (Vy[:, 0] == 0).all() and (Vy[:, -1] == 0).all()
    assert (Vz[..., 0] == 0).all() and (Vz[..., -1] == 0).all()
    # negative tangential mirrors
    np.testing.assert_array_equal(Vy[0], -Vy[1])
    np.testing.assert_array_equal(Vz[0], -Vz[1])
    np.testing.assert_array_equal(Vx[:, 0], -Vx[:, 1])
    np.testing.assert_array_equal(Vz[:, -1], -Vz[:, -2])
    np.testing.assert_array_equal(Vx[..., 0], -Vx[..., 1])
    np.testing.assert_array_equal(Vy[..., -1], -Vy[..., -2])


def test_mixed_free_no_slip_faces():
    """Mixed per-face BCs: free-slip sides, no-slip top/bot (channel flow
    idiom; reference mixed-face variants)."""
    rng = np.random.default_rng(1)
    n = 5
    Vx = jnp.asarray(rng.random((n + 1, n + 2)))
    Vy = jnp.asarray(rng.random((n + 2, n + 1)))
    bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True),
        no_slip=Faces(top=True, bot=True),
    )
    Vx2, Vy2 = flow_bcs((Vx, Vy), bc)
    Vx2, Vy2 = np.asarray(Vx2), np.asarray(Vy2)
    # free-slip sides mirror tangential Vy
    np.testing.assert_array_equal(Vy2[0, :], Vy2[1, :])
    np.testing.assert_array_equal(Vy2[-1, :], Vy2[-2, :])
    # no-slip top/bot: zero normal Vy, negative-mirror tangential Vx
    assert (Vy2[:, 0] == 0).all() and (Vy2[:, -1] == 0).all()
    np.testing.assert_array_equal(Vx2[:, -1], -Vx2[:, -2])


def test_displacement_bcs_match_velocity_form():
    """DisplacementBoundaryConditions apply the same ghost rules
    (reference displacement BC twin, boundaryconditions/types.jl)."""
    from justrelax_tpu.ops.bc import DisplacementBoundaryConditions

    rng = np.random.default_rng(2)
    n = 5
    Ux = jnp.asarray(rng.random((n + 1, n + 2)))
    Uy = jnp.asarray(rng.random((n + 2, n + 1)))
    bc_u = DisplacementBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True)
    )
    bc_v = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True)
    )
    got = flow_bcs((Ux, Uy), bc_u)
    want = flow_bcs((Ux, Uy), bc_v)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
