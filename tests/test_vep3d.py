"""3D fused VEP stress kernel + solver (reference
update_stresses_center_vertex_ps! 3D, StressKernels.jl:667-984, and the 3D
GeoParams driver Stokes3D.jl:204-660).

Oracles: homogeneous visco-elastic buildup under pure shear follows the
Maxwell curve (the 3D analogue of test_elastic_buildup); with Drucker-Prager
plasticity the stress is capped at the yield envelope and plastic strain
localizes around the weak inclusion.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from justrelax_tpu.core.coeffs import PTStokesCoeffs
from justrelax_tpu.core.grid import Geometry
from justrelax_tpu.core.state import StokesState
from justrelax_tpu.ops.bc import Faces, VelocityBoundaryConditions, flow_bcs
from justrelax_tpu.rheology.materials import Material, MaterialStack
from justrelax_tpu.solvers.stokes3d_vep import solve_vep_3d


def _pure_shear_xz(stokes, geometry, eps_bg):
    n = geometry.ni[0]
    xv = jnp.asarray(geometry.xvi[0])
    zv = jnp.asarray(geometry.xvi[2])
    Vx = jnp.broadcast_to(
        (eps_bg * xv)[:, None, None],
        (geometry.ni[0] + 1, geometry.ni[1] + 2, geometry.ni[2] + 2),
    )
    Vy = jnp.zeros((geometry.ni[0] + 2, geometry.ni[1] + 1, geometry.ni[2] + 2))
    Vz = jnp.broadcast_to(
        (-eps_bg * zv)[None, None, :],
        (geometry.ni[0] + 2, geometry.ni[1] + 2, geometry.ni[2] + 1),
    )
    bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True,
                        front=True, back=True)
    )
    Vx, Vy, Vz = flow_bcs((Vx, Vy, Vz), bc)
    return stokes.replace(V=stokes.V.replace(Vx=Vx, Vy=Vy, Vz=Vz)), bc


def _solve_steps(material, n=8, nt=6, eps_bg=1.0, dt=0.25):
    ni = (n, n, n)
    geometry = Geometry(ni, (1.0, 1.0, 1.0))
    stokes = StokesState.make(ni)
    stokes = stokes.replace(
        viscosity=stokes.viscosity.replace(eta=jnp.ones(ni))
    )
    stokes, bc = _pure_shear_xz(stokes, geometry, eps_bg)
    pt = PTStokesCoeffs.make(
        geometry.li, geometry.di, eps_rel=1.0e-8, eps_abs=1.0e-8,
        CFL=0.9 / math.sqrt(3.1),
    )
    hist = []
    info = None
    for k in range(nt):
        stokes, info = solve_vep_3d(
            stokes, pt, geometry, bc, material, None, (None, None, None),
            dt, iter_max=20_000, iter_min=100, nout=100,
        )
        hist.append(float(jnp.max(stokes.tau.xx)))
    return stokes, info, hist


@pytest.mark.slow
def test_vep3d_maxwell_buildup():
    """Homogeneous VE (no plasticity): τxx follows the backward-Euler
    Maxwell recursion τ ← (2ηε̇ + τ_o·η/(G dt))/(1 + η/(G dt)) exactly, and
    the continuous curve 2ε̇η(1−exp(−Gt/η)) to O(dt)."""
    mat = MaterialStack.make([Material(G=1.0, Kb=4.0, eta0=1.0)])
    stokes, info, hist = _solve_steps(mat, nt=6, dt=0.25)
    assert float(info.err) < 1.0e-7
    # sharp discrete oracle
    disc, tau = [], 0.0
    for _ in range(6):
        tau = (2.0 * 1.0 * 1.0 + tau * 4.0) / 5.0  # η/(G dt) = 4
        disc.append(tau)
    np.testing.assert_allclose(hist, disc, rtol=1.0e-6)
    # continuous curve within the O(dt) discretization error
    t = 0.25 * np.arange(1, 7)
    sol = 2.0 * (1.0 - np.exp(-t))
    np.testing.assert_allclose(hist, sol, rtol=0.12)


@pytest.mark.slow
def test_vep3d_plastic_capping():
    """DP plasticity caps τII at the yield envelope everywhere."""
    tau_y = 0.8
    phi = 30.0
    C = tau_y / math.cos(math.radians(phi))
    mat = MaterialStack.make([
        Material(G=1.0, Kb=4.0, eta0=1.0, is_plastic=1.0, C=C,
                 friction_angle=phi, eta_reg=8.0e-3)
    ])
    stokes, info, hist = _solve_steps(mat, nt=8, dt=0.25)
    assert float(info.err) < 1.0e-6
    tII = np.asarray(stokes.tau.II)
    P = np.asarray(stokes.P)
    F = tII - tau_y - P * math.sin(math.radians(phi))
    # at/below yield (regularization allows a small overshoot)
    assert F.max() < 0.05
    # plasticity active: multipliers and plastic strain nonzero
    assert float(jnp.max(stokes.lam)) > 0.0
    assert float(jnp.max(stokes.EII_pl)) > 0.0
    # the VE curve would keep rising past yield; the capped history flattens
    assert hist[-1] < 2.0 * 1.0 * (1.0 - math.exp(-8 * 0.25)) - 0.05


@pytest.mark.slow
def test_vep3d_weak_inclusion_localizes():
    """Two-phase: weak elastic sphere localizes plastic strain around it
    (3D shear band onset)."""
    n = 12
    ni = (n, n, n)
    geometry = Geometry(ni, (1.0, 1.0, 1.0))
    common = dict(Kb=4.0, eta0=1.0, is_plastic=1.0,
                  C=1.6 / math.cos(math.radians(30.0)), friction_angle=30.0,
                  eta_reg=8.0e-3)
    mat = MaterialStack.make([
        Material(G=1.0, **common), Material(G=0.5, **common)
    ])
    X, Y, Z = geometry.cell_centers_mesh()
    sph = (
        (np.asarray(X) - 0.5) ** 2 + (np.asarray(Y) - 0.5) ** 2
        + (np.asarray(Z) - 0.5) ** 2
    ) < 0.1**2
    from justrelax_tpu.rheology.phases import phase_ratios_from_field

    pr = phase_ratios_from_field(jnp.asarray(sph.astype(int)), 2)
    stokes = StokesState.make(ni)
    stokes = stokes.replace(viscosity=stokes.viscosity.replace(eta=jnp.ones(ni)))
    stokes, bc = _pure_shear_xz(stokes, geometry, 1.0)
    pt = PTStokesCoeffs.make(
        geometry.li, geometry.di, eps_rel=1.0e-6, eps_abs=1.0e-6,
        CFL=0.75 / math.sqrt(3.1),
    )
    info = None
    for _ in range(8):
        stokes, info = solve_vep_3d(
            stokes, pt, geometry, bc, mat, pr.center,
            (pr.edge_yz, pr.edge_xz, pr.edge_xy),
            0.25, iter_max=30_000, iter_min=100, nout=200,
        )
    assert float(info.err) < 1.0e-5
    EII = np.asarray(stokes.EII_pl)
    c = n // 2
    # plastic strain above background near the inclusion
    assert EII[c, c, c - 2] > np.median(EII) or EII[c, c, c] > np.median(EII)
    assert EII.max() > 0.0


@pytest.mark.slow
def test_vep3d_masked_phi_one_matches_unmasked():
    """With φ ≡ 1 the masked (variational) VEP path must reproduce the
    unmasked solver to roundoff."""
    from justrelax_tpu.ops.rock_ratio import update_rock_ratio_3d
    from justrelax_tpu.rheology.phases import phase_ratios_from_field

    mat = MaterialStack.make([
        Material(G=1.0, Kb=4.0, eta0=1.0, is_plastic=1.0,
                 C=0.8 / math.cos(math.radians(30.0)), friction_angle=30.0,
                 eta_reg=8.0e-3),
        Material(eta0=1.0),  # dummy "air" phase, ratio 0 everywhere
    ])
    n = 8
    ni = (n, n, n)
    geometry = Geometry(ni, (1.0, 1.0, 1.0))
    phases = np.zeros(ni, dtype=int)
    pr = phase_ratios_from_field(jnp.asarray(phases), 2)
    phi = update_rock_ratio_3d(pr, air_phase=1)

    def solve(use_phi):
        stokes = StokesState.make(ni)
        stokes = stokes.replace(
            viscosity=stokes.viscosity.replace(eta=jnp.ones(ni))
        )
        stokes, bc = _pure_shear_xz(stokes, geometry, 1.0)
        pt = PTStokesCoeffs.make(
            geometry.li, geometry.di, eps_rel=1.0e-8, eps_abs=1.0e-8,
            CFL=0.9 / math.sqrt(3.1),
        )
        return solve_vep_3d(
            stokes, pt, geometry, bc, mat, pr.center,
            (pr.edge_yz, pr.edge_xz, pr.edge_xy), 0.25,
            iter_max=2_000, iter_min=100, nout=100,
            phi=phi if use_phi else None,
        )

    s_ref, _ = solve(False)
    s_var, _ = solve(True)
    np.testing.assert_allclose(
        np.asarray(s_var.V.Vx), np.asarray(s_ref.V.Vx), atol=1e-13
    )
    np.testing.assert_allclose(
        np.asarray(s_var.tau.II), np.asarray(s_ref.tau.II), atol=1e-13
    )


@pytest.mark.slow
def test_vep3d_masked_sticky_air_plastic():
    """Sticky air over a plastic crust under pure shear: converges, air at
    rest, crust yields (the 3D variational-VEP combination)."""
    from justrelax_tpu.ops.rock_ratio import update_rock_ratio_3d, valid_masks_3d
    from justrelax_tpu.rheology.phases import phase_ratios_from_field

    n = 10
    ni = (n, n, n)
    geometry = Geometry(ni, (1.0, 1.0, 1.0))
    Z = np.asarray(geometry.cell_centers_mesh()[2])
    air = Z > 0.7
    phases = np.where(air, 1, 0)
    pr = phase_ratios_from_field(jnp.asarray(phases), 2)
    phi = update_rock_ratio_3d(pr, air_phase=1)
    mat = MaterialStack.make([
        Material(G=1.0, Kb=4.0, eta0=1.0, is_plastic=1.0,
                 C=0.3 / math.cos(math.radians(30.0)), friction_angle=30.0,
                 eta_reg=8.0e-3),
        Material(eta0=1.0e-3),  # air
    ])
    stokes = StokesState.make(ni)
    eta = jnp.asarray(np.where(air, 1.0e-3, 1.0))
    stokes = stokes.replace(viscosity=stokes.viscosity.replace(eta=eta))
    stokes, bc = _pure_shear_xz(stokes, geometry, 1.0)
    pt = PTStokesCoeffs.make(
        geometry.li, geometry.di, eps_rel=1.0e-7, eps_abs=1.0e-7,
        CFL=0.75 / math.sqrt(3.1),
    )
    info = None
    for _ in range(6):
        stokes, info = solve_vep_3d(
            stokes, pt, geometry, bc, mat, pr.center,
            (pr.edge_yz, pr.edge_xz, pr.edge_xy), 0.25,
            iter_max=30_000, iter_min=100, nout=200, phi=phi,
        )
    assert float(info.err) < 1.0e-5
    # plasticity active in the crust
    assert float(jnp.max(stokes.lam)) > 0.0
    # invalid (air) faces exactly zero
    vm = valid_masks_3d(phi)
    Vz = np.asarray(stokes.V.Vz)
    assert np.abs(Vz[1:-1, 1:-1, 1:-1][~np.asarray(vm.vz[:, :, 1:-1])]).max() == 0.0
