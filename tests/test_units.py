"""Nondimensionalization (GeoParams GEO_units equivalent, SURVEY §2.4)."""

import numpy as np
import pytest

from justrelax_tpu.utils.units import (
    dimensionalize,
    geo_units,
    nondimensionalize,
)


def test_derived_scales():
    u = geo_units(length=10.0e3, temperature=1000.0, viscosity=1.0e20,
                  stress=10.0e6)
    # t = η/σ
    np.testing.assert_allclose(u.time, 1.0e20 / 1.0e7)
    # velocity = L/t
    np.testing.assert_allclose(u.scale("velocity"), 10.0e3 / u.time)
    # density = σ t² / L²  (check dimensional identity σ = ρ L²/t²)
    rho_c = u.scale("density")
    np.testing.assert_allclose(rho_c * u.length**2 / u.time**2, 1.0e7)
    # viscosity round-trips through M L T: η = σ·t
    np.testing.assert_allclose(u.scale("viscosity"), 1.0e20)
    np.testing.assert_allclose(u.scale("stress"), 1.0e7)
    # diffusivity = L²/t; conductivity = ρ·Cp·κ consistency
    np.testing.assert_allclose(u.scale("diffusivity"), u.length**2 / u.time)
    np.testing.assert_allclose(
        u.scale("conductivity"),
        u.scale("density") * u.scale("heat_capacity") * u.scale("diffusivity"),
        rtol=1e-12,
    )


def test_roundtrip_and_solver_friendliness():
    u = geo_units()
    # a realistic problem nondimensionalizes to O(1)
    eta_nd = nondimensionalize(1.0e21, "viscosity", u)
    assert 1.0 <= eta_nd <= 100.0
    v_nd = nondimensionalize(3.17e-10, "velocity", u)  # ~1 cm/yr
    assert 1.0e-3 < v_nd < 1.0e3
    # exact round trip, scalar and array
    for q, val in [("stress", 2.5e8), ("temperature", 1350.0)]:
        nd = nondimensionalize(val, q, u)
        np.testing.assert_allclose(dimensionalize(nd, q, u), val, rtol=1e-14)
    arr = np.linspace(1.0, 5.0, 7) * 9.81
    np.testing.assert_allclose(
        dimensionalize(nondimensionalize(arr, "gravity", u), "gravity", u), arr
    )
    with pytest.raises(KeyError, match="unknown quantity"):
        nondimensionalize(1.0, "flux_capacitance", u)
