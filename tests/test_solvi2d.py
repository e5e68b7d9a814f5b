"""SolVi 2D (Schmid & Podladchikov 2003; reference
miniapps/benchmarks/stokes2D/solvi): the interior of a circular inclusion
under far-field pure shear is UNIFORM with strain rate 2η_m/(η_m+η_i)·ε̇
and zero pressure perturbation.

Sharp-interface staggered discretizations resolve the amplitude at 1st
order (Deubelbeiss & Kaus 2008) — hence the few-% tolerance with the
inclusion well separated from the boundary (rc/L = 0.05, rc/dx ≈ 5).
"""

import numpy as np
import pytest

from justrelax_tpu.models.solvi2d import interior_amplitude, run


def _core(inside):
    import scipy.ndimage as ndi

    return ndi.binary_erosion(inside, iterations=2)


@pytest.mark.slow
@pytest.mark.parametrize("d_eta", [1.0e-3, 1.0e3])
def test_solvi2d_interior_state(d_eta):
    geom, st, info, inside = run(n=96, d_eta=d_eta, rc=0.2, L=4.0)
    assert float(info.err) < 1.0e-8
    core = _core(inside)
    txx = np.asarray(st.tau.xx)
    P = np.asarray(st.P)

    # interior MEAN stress matches the analytic uniform amplitude
    # τ_in = 4 η_i η_m/(η_m+η_i) ε̇ (cell-to-cell variation at rc/dx ≈ 5 is
    # the sharp-interface discretization error and shrinks with resolution)
    mean = txx[core].mean()
    a = interior_amplitude(1.0, d_eta, 1.0)
    assert abs(mean - a) / abs(a) < 0.04
    assert abs(txx[core].std() / mean) < 0.25
    # interior pressure perturbation ~ 0 (relative to the stress scale of
    # the PROBLEM, 2 η_m ε̇ = 2)
    assert abs(P[core].mean()) < 0.02 * 2.0
