"""SolCx Stokes benchmark (reference test_stokes_solcx.jl + analytic check)."""

import numpy as np
import pytest

from justrelax_tpu.models import solcx


@pytest.mark.slow
def test_solcx_convergence():
    """Reference oracle: final abs residual < 1e-8 at 32², Δη=1e6."""
    _, _, info, _ = solcx.run(nx=32, ny=32, d_eta=1.0e6)
    assert float(info.err) < 1.0e-8


@pytest.mark.slow
def test_solcx_isoviscous_analytic():
    """Δη=1: solution is ψ = sin(πx)sin(πy)/(4π³), max|V| = 1/(4π²)."""
    _, stokes, info, _ = solcx.run(nx=32, ny=32, d_eta=1.0)
    assert float(info.err) < 1.0e-8
    vmax = max(np.abs(np.asarray(stokes.V.Vx)).max(), np.abs(np.asarray(stokes.V.Vy)).max())
    assert vmax == pytest.approx(1.0 / (4 * np.pi**2), rel=2.0e-3)
