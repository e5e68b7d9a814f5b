"""Burstedde 3D Stokes benchmark (reference test_stokes_burstedde.jl:26-36,
plus an analytic-solution accuracy check the reference lacks)."""

import numpy as np
import pytest

from justrelax_tpu.models import burstedde


@pytest.mark.slow
def test_burstedde_convergence_and_accuracy():
    n = 16
    geom, stokes, info = burstedde.run(nx=n, ny=n, nz=n, iter_max=60_000, nout=1_000)
    # reference criterion: final absolute residual < 1e-8 at 16³
    assert float(info.err) < 1.0e-8
    # velocity matches the analytic Burstedde solution to discretization error
    Vx = np.asarray(stokes.V.Vx)
    X, Y = np.meshgrid(geom.xvi[0], geom.xci[1], indexing="ij")
    vxa = X + X**2 + X * Y + X**3 * Y
    rel_err = np.abs(Vx[:, 1:-1, n // 2] - vxa).max() / np.abs(vxa).max()
    assert rel_err < 2.0e-2


@pytest.mark.slow
def test_burstedde_second_order():
    errs = []
    for n in (8, 16):
        geom, stokes, _ = burstedde.run(nx=n, ny=n, nz=n, iter_max=30_000, nout=1_000)
        Vx = np.asarray(stokes.V.Vx)
        X, Y = np.meshgrid(geom.xvi[0], geom.xci[1], indexing="ij")
        vxa = X + X**2 + X * Y + X**3 * Y
        errs.append(np.abs(Vx[:, 1:-1, n // 2] - vxa).max() / np.abs(vxa).max())
    assert errs[1] < errs[0] / 2.5  # ≥ ~1.3 order observed; 2nd order nominal
