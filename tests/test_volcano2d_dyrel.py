"""Caldera2D_DYREL analogue: the full coupled volcano loop (particles,
melt, thermal, injection) driven by solve_dyrel
(reference miniapps/benchmarks/stokes2D/Volcano2D/Caldera2D_DYREL.jl).

Goldens are self-frozen from the f64 CPU run (deterministic: fixed particle
seed). The cross-check against the variational volcano2d solve is
deliberately coarse: DYREL runs UNMASKED (air is a weak flowing phase,
exactly as the reference's DYREL variant — RockRatio-DYREL is unexported WIP
upstream), so pointwise fields differ from the rock-ratio-masked solve; what
must agree is the physical signal (chamber buoyancy drives a central
upwelling of comparable magnitude).
"""

import numpy as np
import pytest

from justrelax_tpu.models import volcano2d_dyrel

YR = 3600.0 * 24.0 * 365.25


@pytest.mark.slow
def test_volcano2d_dyrel_coupled():
    stokes, thermal, particles, phi_m, info, aux = volcano2d_dyrel.run(
        nx=16, ny=8, nt=2
    )
    # DYREL converged (reference ϵ = 1e-4)
    assert float(info.err) < 1.0e-4

    # independent force-balance oracle on the returned (τ, P) with the
    # solve-time buoyancy: Ry = ∂τyy/∂y + ∂τxy/∂x − ∂(P+ΔPψ)/∂y − ρg̅ must
    # vanish relative to the buoyancy term (~ρg ≈ 2.6e4 Pa/m). Solver-
    # agnostic — it needs no viscosity and would catch a wrong converged
    # state no matter what the solver's internal norm claims. The grid MUST
    # be the model's own (30×25 km, volcano2d.py:139-141): a wrong dy here
    # mimics a half-ρg "solver bug" (r04 postmortem).
    from justrelax_tpu.core.grid import Geometry
    from justrelax_tpu.models.volcano2d import KM

    geometry = Geometry((16, 8), (30.0 * KM, 25.0 * KM),
                        origin=(0.0, -20.0 * KM))
    inv_dx, inv_dy = 1.0 / geometry.di[0], 1.0 / geometry.di[1]
    tyy, txy, P = (np.asarray(stokes.tau.yy), np.asarray(stokes.tau.xy),
                   np.asarray(stokes.P))
    rho_gy = np.asarray(aux["rho_gy"])
    Ry = ((tyy[:, 1:] - tyy[:, :-1]) * inv_dy
          + (txy[1:, 1:-1] - txy[:-1, 1:-1]) * inv_dx
          - (P[:, 1:] - P[:, :-1]) * inv_dy
          - 0.5 * (rho_gy[:, 1:] + rho_gy[:, :-1]))
    scale = float(np.abs(rho_gy).mean())
    rms = float(np.linalg.norm(Ry) / np.sqrt(Ry.size))
    # DYREL exits on the reference's relative criterion (errV/errV0 ≤ 1e-4,
    # errV0 ≈ 4e3 here) → absolute residual ≤ ~0.5 Pa/m ≈ 2e-5·ρg̅;
    # assert an order looser
    assert rms < 2.0e-4 * scale, (rms, scale)

    Vy = np.asarray(stokes.V.Vy)
    cmyr = 100.0 * YR
    # frozen goldens (f64, seed=0; lithostatic P init per
    # Caldera2D_DYREL.jl:231). Refrozen round 5: the setup-time marker-chain
    # topography correction (Caldera2D_DYREL.jl:194, active in the
    # reference's DYREL variant) now deactivates interpolation-smeared
    # particles at the initial surface before ratios are built, sharpening
    # the air/rock interface the buoyancy sees (previously 114.30/-65.72).
    assert float(Vy.max()) * cmyr == pytest.approx(93.196, rel=2e-2)
    assert float(Vy.min()) * cmyr == pytest.approx(-94.879, rel=2e-2)
    # thermal state stays physical through the coupled steps
    T = np.asarray(thermal.T)
    assert T.min() > 250.0 and T.max() <= 1623.0 + 1e-6
    # the eruptible core carries melt
    assert 0.0 < float(np.asarray(phi_m).max()) <= 1.0
    # all stresses finite (Kaboom-guard analogue)
    assert np.isfinite(np.asarray(stokes.tau.II)).all()


@pytest.mark.slow
def test_volcano2d_dyrel_cross_check_variational():
    """DYREL (unmasked, viscous air lid — the reference DYREL formulation)
    vs variational (rock-ratio masked free surface) on the same caldera.

    The two formulations solve different boundary-value problems at the
    surface, and at test scale their velocity magnitudes legitimately differ
    by orders (the masked free surface admits fast surface/chamber flow the
    1e17 Pa·s air lid suppresses; the reference never cross-validates them
    either). The shared oracle is the buoyancy signal: both converge and
    both drive a central upwelling above the chamber."""
    from justrelax_tpu.models import volcano2d

    sd, _, _, _, idd, _ = volcano2d_dyrel.run(nx=16, ny=8, nt=2)
    sv, *_, iv = volcano2d.run(nx=16, ny=8, nt=2)
    assert float(idd.err) < 1.0e-4
    assert float(iv.err) < 1.0e-4
    Vyd, Vyv = np.asarray(sd.V.Vy), np.asarray(sv.V.Vy)
    assert float(Vyd[6:12, 4:6].mean()) > 0.0
    assert float(Vyv[6:12, 4:6].mean()) > 0.0
