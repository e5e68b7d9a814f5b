"""Visco-elastic stress build-up vs analytic Maxwell curve
(reference test_stokes_elastic_buildup.jl)."""

import numpy as np
import pytest

from justrelax_tpu.models import elastic_buildup


@pytest.mark.slow
def test_elastic_buildup_analytic():
    _, av, sol, _, _ = elastic_buildup.run(nx=32, ny=32, endtime_kyr=10.0)
    err = np.mean([abs(abs(a) - s) / s for a, s in zip(av, sol)])
    assert err <= 5.0e-3
