"""Sticky-air subduction through DYREL (models/subduction2d_dyrel.py ≙
miniapps/DYREL2D/StickyAirSubduction/Subduction2D_DYREL.jl).

The reference app is validated visually; here the oracle is three-fold:

1. an INDEPENDENT discrete momentum/incompressibility residual — the plain
   staggered viscous operator (τ = 2η ε̇ with the solver's own η fields)
   evaluated on the returned solution must vanish relative to its term
   scale (|∂τ/∂x| ~ 1e4 Pa/m here). This is solver-agnostic: it would catch
   a DYREL bug regardless of what the solver's internal norm claims.
2. an APT cross-check at loose tolerance. NOTE the two solvers are NOT
   expected to agree tightly on this config: with a 4-decade viscosity jump
   (air 1e19 / slab 1e23) the discrete solution is famously sensitive to
   the interface viscosity-averaging convention (the Schmeling et al. 2008
   sticky-air benchmark result), and the fused APT center+vertex kernel and
   DYREL use different vertex interpolations. Measured gap at 50×20: 20%
   in vmax at DYREL eps=1e-6 (APT converged to err 1e-11 — see the r04
   build notes; DYREL vmax still creeps toward APT as eps tightens:
   1.84e-8 @ 1e-5 → 2.01e-8 @ 1e-6 vs APT 2.52e-8). The check pins
   sign/structure, not the discretization.
3. physics + frozen goldens: slab tip descends monotonically, sticky air
   stays slow, vmax matches the frozen r04 value.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from justrelax_tpu.models import subduction2d_dyrel as m

KM = 1.0e3


def _mom_residual(geometry, s, eta, eta_v, rho_gy):
    """RMS of the plain staggered viscous momentum residual + max |div V|."""
    inv_dx, inv_dy = 1.0 / geometry.di[0], 1.0 / geometry.di[1]
    Vx, Vy = s.V.Vx, s.V.Vy
    dVxdx = (Vx[1:, 1:-1] - Vx[:-1, 1:-1]) * inv_dx
    dVydy = (Vy[1:-1, 1:] - Vy[1:-1, :-1]) * inv_dy
    divV = dVxdx + dVydy
    exx = dVxdx - divV / 3.0
    eyy = dVydy - divV / 3.0
    exy = 0.5 * ((Vx[:, 1:] - Vx[:, :-1]) * inv_dy
                 + (Vy[1:, :] - Vy[:-1, :]) * inv_dx)
    txx, tyy, txy = 2 * eta * exx, 2 * eta * eyy, 2 * eta_v * exy
    P = s.P
    Rx = ((txx[1:, :] - txx[:-1, :]) * inv_dx
          + (txy[1:-1, 1:] - txy[1:-1, :-1]) * inv_dy
          - (P[1:, :] - P[:-1, :]) * inv_dx)
    Ry = ((tyy[:, 1:] - tyy[:, :-1]) * inv_dy
          + (txy[1:, 1:-1] - txy[:-1, 1:-1]) * inv_dx
          - (P[:, 1:] - P[:, :-1]) * inv_dy
          - 0.5 * (rho_gy[:, 1:] + rho_gy[:, :-1]))
    rms = lambda A: float(jnp.linalg.norm(A) / math.sqrt(A.size))  # noqa: E731
    return rms(Rx), rms(Ry), float(jnp.abs(divV).max())


@pytest.mark.slow
def test_sticky_air_subduction_dyrel():
    from justrelax_tpu.ops.interpolation import velocity2vertex

    nx, ny, nt = 50, 20, 2
    stokes, particles, p_phase, pr_c, info, tip_hist, aux = m.run(
        nx=nx, ny=ny, nt=nt)
    assert float(info.err) < 1.0e-5

    # --- independent residual oracle on the final solve -------------------
    from justrelax_tpu.core.grid import Geometry

    geometry = Geometry((nx, ny), (3000.0 * KM, 750.0 * KM),
                        origin=(0.0, -700.0 * KM))
    # evaluate with the SOLVE-TIME inputs the model records in aux (the
    # returned pr_c is post-advection and would perturb ρg at interfaces)
    rx, ry, divmax = _mom_residual(geometry, stokes, aux["eta"],
                                   aux["eta_v"], aux["rho_gy"])
    # term scale |∂τ/∂x| ≈ 2·η·ε̇/dx ≈ 1e4 Pa/m; at eps=1e-5 the DYREL
    # solve leaves ~1e-4-relative residual (measured r04: rx 2e-5, ry 2e-1)
    assert rx < 10.0 and ry < 40.0, (rx, ry)
    assert divmax < 1.0e-12

    # --- physics ----------------------------------------------------------
    # slab tip starts near -200 km (sampling puts it ~-193) and descends
    assert tip_hist[0] < -180.0 * KM
    assert all(b < a for a, b in zip(tip_hist, tip_hist[1:]))

    # sticky air is nearly stress-free: the air VELOCITY legitimately exceeds
    # the slab's (the ~inviscid thin layer recirculates fast to accommodate
    # surface motion — measured 3.7× at this grid), so the defining property
    # is stress, not speed: τII in the air interior ≪ τII in the rock
    # (measured r04: ratio 0.014)
    tII = np.asarray(stokes.tau.II)
    yc = np.asarray(geometry.xci[1])
    t_air = float(tII[:, yc > 5.0 * KM].max())
    t_rock = float(tII[:, yc < -5.0 * KM].max())
    assert t_air < 0.05 * t_rock, (t_air, t_rock)

    # frozen golden (r04, 50×20, seed 0, eps 1e-5): rock vmax ≈ 1.37e-8 m/s
    # ≈ 43 cm/yr — Schmeling-class sinking speed for Δρ=100, η=1e21
    Vxv, Vyv = velocity2vertex(stokes.V.Vx, stokes.V.Vy)
    yv = np.asarray(geometry.xvi[1])
    v_rock = float(jnp.sqrt(Vxv**2 + Vyv**2)[:, yv < 0.0].max())
    assert 1.0e-8 < v_rock < 2.0e-8, v_rock


@pytest.mark.slow
def test_sticky_air_subduction_dyrel_reference_scale():
    """The reference CONFIGURATION: 125×50 for 10 coupled steps
    (Subduction2D_DYREL.jl:73 — nx, ny = 125, 50; nt = 10). ~8 min CPU/f64.

    Physics regime note (r05 calibration): at this resolution the measured
    peak rock speed is ~4.1e-9 m/s (≈13 cm/yr) and Σdt over 10 steps is
    ~500 kyr, so the slab tip's physical descent over the whole app run is
    ~1-4 km — BELOW one cell (dy = 15 km) and below the ±3 km jitter of
    the deepest-particle diagnostic (Schmeling-class sinking takes tens of
    Myr; the reference validates this app visually over the same 10
    steps). The oracles therefore pin the force balance, the SINKING
    VELOCITY structure at the tip, the sticky-air stress contrast, and
    frozen goldens — not cell-scale descent, which the run cannot
    physically produce."""
    nx, ny, nt = 125, 50, 10
    stokes, particles, p_phase, pr_c, info, tip_hist, aux = m.run(
        nx=nx, ny=ny, nt=nt)
    assert float(info.err) < 1.0e-4

    from justrelax_tpu.core.grid import Geometry

    geometry = Geometry((nx, ny), (3000.0 * KM, 750.0 * KM),
                        origin=(0.0, -700.0 * KM))
    rx, ry, divmax = _mom_residual(geometry, stokes, aux["eta"],
                                   aux["eta_v"], aux["rho_gy"])
    scale = float(np.abs(np.asarray(aux["rho_gy"])).mean())  # ~2.9e4 Pa/m
    # calibrated r05 (1-step): rx 1.6e-4, ry 2.8e-3 → ~1e-7 of scale
    assert rx < 1.0e-5 * scale and ry < 1.0e-4 * scale, (rx, ry, scale)
    assert divmax < 1.0e-12

    # tip-region velocity: after step 1 the tip sinks (calibrated
    # -1.4e-9 m/s); over the 10-step run the free surface develops the
    # bounded "drunken sailor" oscillation this config is KNOWN for
    # (free_surface stabilization is OFF in the reference app too —
    # Subduction2D_DYREL.jl:121 `free_surface = false`, dt = 0.8·CFL at
    # :183 — so alternating-sign interface velocities are the faithful
    # behavior, cf. Kaus et al. 2010; tip_hist alternates with ~km
    # amplitude). The oracle is therefore BOUNDED oscillation, not
    # final-state sign: the tip velocity stays O(sinking speed) and the
    # tip depth never leaves the ±10 km band around its initial -200 km.
    yc = np.asarray(geometry.xci[1])
    r_slab = np.asarray(pr_c[..., m.SLAB])
    Vy = np.asarray(stokes.V.Vy)
    Vy_c = 0.5 * (Vy[1:-1, 1:] + Vy[1:-1, :-1])
    tipmask = (r_slab > 0.5) & (yc[None, :] < -150.0 * KM)
    assert tipmask.sum() >= 8
    assert abs(float(Vy_c[tipmask].mean())) < 1.0e-8

    # sticky air: stress contrast (calibrated ratio 0.008-0.016)
    tII = np.asarray(stokes.tau.II)
    t_air = float(tII[:, yc > 5.0 * KM].max())
    t_rock = float(tII[:, yc < -5.0 * KM].max())
    assert t_air < 0.05 * t_rock, (t_air, t_rock)

    # frozen goldens (r05, f64, seed 0): peak rock speed and the bounded
    # slab-mass depth drift (|Δycm| ≈ 1 km over the run)
    from justrelax_tpu.ops.interpolation import velocity2vertex
    Vxv, Vyv = velocity2vertex(stokes.V.Vx, stokes.V.Vy)
    yv = np.asarray(geometry.xvi[1])
    v_rock = float(jnp.sqrt(Vxv**2 + Vyv**2)[:, yv < 0.0].max())
    np.testing.assert_allclose(v_rock, 4.146366626154032e-09, rtol=5e-2)
    ycm = aux["ycm_hist"]
    assert abs(ycm[-1] - ycm[0]) < 2.0 * KM, ycm
    assert all(-210.0 * KM < t < -190.0 * KM for t in tip_hist), tip_hist


@pytest.mark.slow
def test_sticky_air_subduction_dyrel_vs_apt():
    """Loose APT cross-check of the first Stokes solve (see module doc for
    why tight field agreement is NOT expected on this config)."""
    from justrelax_tpu.core.coeffs import PTStokesCoeffs
    from justrelax_tpu.core.grid import Geometry
    from justrelax_tpu.core.state import StokesState
    from justrelax_tpu.ops.bc import Faces, VelocityBoundaryConditions
    from justrelax_tpu.ops.interpolation import velocity2vertex
    from justrelax_tpu.particles.particles import (
        init_particles, phase_ratios_from_particles)
    from justrelax_tpu.rheology.materials import _as_stack, phase_average
    from justrelax_tpu.rheology.viscosity import phase_viscosity
    from justrelax_tpu.solvers.stokes2d_vep import solve_vep

    nx, ny = 50, 20
    ni = (nx, ny)
    geometry = Geometry(ni, (3000.0 * KM, 750.0 * KM),
                        origin=(0.0, -700.0 * KM))
    material = m.materials()
    particles = init_particles(geometry, nxcell=12, max_xcell=24,
                               min_xcell=6, seed=0)
    p_phase = m.init_phase(particles.px, particles.py)
    pr_c, pr_v = phase_ratios_from_particles(particles, p_phase, 3, geometry)

    st = StokesState.make(ni)
    f = st.P.dtype
    eta = phase_viscosity(material, jnp.ones(ni, f), None, pr_c, "tau")
    eta_v = phase_viscosity(
        material, jnp.ones((nx + 1, ny + 1), f), None, pr_v, "tau")
    rho = phase_average(_as_stack(material).params.rho0, pr_c)
    g = phase_average(_as_stack(material).params.gravity, pr_c)
    rho_gy = (rho * g).astype(f)
    P_litho = jnp.cumsum((rho_gy * geometry.di[1])[:, ::-1], axis=1)[:, ::-1]
    st = st.replace(P=P_litho.astype(f), viscosity=st.viscosity.replace(
        eta=eta.astype(f), eta_v=eta_v.astype(f)))
    bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True))
    pt = PTStokesCoeffs.make(geometry.li, geometry.di,
                             eps_rel=1.0e-10, eps_abs=1.0e-8,
                             CFL=0.9 / math.sqrt(2.1))
    s_apt, info_apt = solve_vep(st, pt, geometry, bc, material, pr_c, pr_v,
                                jnp.inf, iter_max=100_000, nout=2000)
    Vxa, Vya = velocity2vertex(s_apt.V.Vx, s_apt.V.Vy)
    vmax_apt = float(jnp.sqrt(Vxa**2 + Vya**2).max())

    # eps=1e-6: the returned state is the certified one (reference break-
    # after-check semantics). Convergence-limit analysis (r05): DYREL vmax
    # is IDENTICAL at eps 1e-6 / 3e-7 / 1e-7 (2.0061160e-8) — the 20.4%
    # gap vs APT (2.52e-8) is the pure discretization-convention fixed
    # point, not convergence slack, so the cross-check is tightened to
    # bracket that measured limit and the DYREL fixed point itself is
    # frozen tightly.
    stokes = m.run(nx=nx, ny=ny, nt=1, eps=1.0e-6)[0]
    Vxd, Vyd = velocity2vertex(stokes.V.Vx, stokes.V.Vy)
    vmax_dy = float(jnp.sqrt(Vxd**2 + Vyd**2).max())

    np.testing.assert_allclose(vmax_dy, 2.0061160220917646e-08, rtol=1e-3)
    np.testing.assert_allclose(vmax_dy, vmax_apt, rtol=0.22)
    # the flow structure agrees: normalized Vy fields strongly correlated
    a = np.asarray(Vya).ravel()
    d = np.asarray(Vyd).ravel()
    corr = float(np.dot(a, d) / (np.linalg.norm(a) * np.linalg.norm(d)))
    assert corr > 0.9, corr
