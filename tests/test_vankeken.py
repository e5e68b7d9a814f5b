"""Van Keken Rayleigh-Taylor benchmark (reference test_VanKeken.jl:204-206).

The reference runs 500 coupled steps; 100 here keeps suite time bounded while
exercising the same oracle (residual < 1e-4; Urms < 1e-2 at every step, with
the instability measurably growing)."""

import pytest

from justrelax_tpu.models import vankeken


@pytest.mark.slow
def test_vankeken():
    Urms, info, stokes, particles, phase = vankeken.run(nx=32, ny=32, nt=100)
    assert float(info.err) < 1.0e-4
    assert all(u < 1.0e-2 for u in Urms)
    # Rayleigh-Taylor growth: velocity increases over the run
    assert Urms[-1] > Urms[0]
    # particle bookkeeping stays healthy
    assert int(particles.count().min()) >= particles.min_xcell
