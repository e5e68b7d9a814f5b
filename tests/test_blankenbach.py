"""Blankenbach convection golden diagnostics (reference test_Blankenbach.jl:283-288)."""

import pytest

from justrelax_tpu.models import blankenbach


@pytest.mark.slow
def test_blankenbach_goldens():
    Urms, Nu, info, stokes, thermal = blankenbach.run(nx=32, ny=32, nit=10)
    assert Urms[-1] == pytest.approx(0.40987052065118357, rel=1.0e-1)
    assert Nu[-1] == pytest.approx(1.0026242251320245, rel=1.0e-2)
    assert float(info.err) < 1.0e-4
