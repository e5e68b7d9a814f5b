"""Taylor-Green 3D manufactured Stokes benchmark (reference
miniapps/benchmarks/stokes3D/taylor_green): analytic velocity AND pressure,
2nd-order convergent.

Derivation check of the manufactured solution: u is divergence-free
(4π−2π−2π)·sin·sin·sin = 0, and η·Δu − ∇p = f with Δu = −12π²u,
p = −6π·sin(2πx)sin(2πy)sin(2πz), f = (−36π²·cos sin sin, 0, 0).
"""

import numpy as np
import pytest

from justrelax_tpu.models.taylor_green import analytic_fields, run


def _errors(n):
    geom, st, info = run(n=n)
    assert float(info.err) < 1.0e-10
    Vxa, Vya, Vza, Pa = analytic_fields(geom)
    Vx = np.asarray(st.V.Vx)[:, 1:-1, 1:-1]
    Vz = np.asarray(st.V.Vz)[1:-1, 1:-1, :]
    ev = max(
        np.abs(Vx - Vxa).max() / np.abs(Vxa).max(),
        np.abs(Vz - Vza).max() / np.abs(Vza).max(),
    )
    P = np.asarray(st.P)
    P = P - P.mean() + Pa.mean()  # pressure defined up to a constant
    ep = np.abs(P - Pa).max() / np.abs(Pa).max()
    return ev, ep


@pytest.mark.slow
def test_taylor_green_accuracy_and_convergence():
    ev12, ep12 = _errors(12)
    ev24, ep24 = _errors(24)
    assert ev12 < 0.02 and ep12 < 0.04
    # 2nd order: ~4x drop under 2x refinement
    assert ev24 < 0.35 * ev12
    assert ep24 < 0.35 * ep12
    assert ev24 < 4.0e-3 and ep24 < 8.0e-3
