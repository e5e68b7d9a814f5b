"""Displacement (strain-increment) formulation + dilation (DPCap-path) tests.

Covers reference src/types/displacement.jl, the strain_increment driver
branch (Stokes2D.jl:659-712 / ShearBand2D_strain_increment.jl), and the
volumetric-plasticity assertions of test_shearband2D_DPCap.jl:186-202.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from justrelax_tpu.core.state import StokesState
from justrelax_tpu.ops.bc import (
    DisplacementBoundaryConditions,
    Faces,
    VelocityBoundaryConditions,
)
from justrelax_tpu.ops.displacement import (
    displacement2velocity,
    velocity2displacement,
)


def test_conversion_roundtrip():
    s = StokesState.make((6, 5))
    V = s.V.replace(
        Vx=jnp.arange(7 * 7, dtype=float).reshape(7, 7),
        Vy=jnp.ones((8, 6)),
    )
    s = s.replace(V=V)
    dt = 0.25
    s = velocity2displacement(s, dt)
    np.testing.assert_allclose(np.asarray(s.U.Ux), np.asarray(V.Vx) * dt)
    s2 = s.replace(V=s.V.replace(Vx=jnp.zeros((7, 7)), Vy=jnp.zeros((8, 6))))
    bc = DisplacementBoundaryConditions(free_slip=Faces(left=True))
    s3 = displacement2velocity(s2, dt, bc)
    np.testing.assert_allclose(np.asarray(s3.V.Vx), np.asarray(V.Vx))
    # velocity-BC problems are left untouched
    s4 = displacement2velocity(
        s2, dt, VelocityBoundaryConditions(free_slip=Faces(left=True))
    )
    assert float(jnp.abs(s4.V.Vx).max()) == 0.0


@pytest.mark.slow
def test_strain_increment_equivalent_to_velocity_driven():
    """With fixed dt, the displacement-driven shear band must match the
    velocity-driven one (reference ShearBand2D_strain_increment.jl is the
    same physics as ShearBand2D.jl)."""
    from justrelax_tpu.models.shearband import run

    s_v, info_v, hist_v, _, tauII_v = run(n=24, nt=3)
    s_u, info_u, hist_u, _, tauII_u = run(n=24, nt=3, displacement_driven=True)
    np.testing.assert_allclose(hist_u, hist_v, rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(tauII_u), np.asarray(tauII_v), atol=1e-12
    )
    # displacement field tracks V·dt
    dt = 1.0 / 4.0
    np.testing.assert_allclose(
        np.asarray(s_u.U.Ux), np.asarray(s_u.V.Vx) * dt, atol=1e-15
    )


@pytest.mark.slow
def test_dilation_volumetric_plasticity():
    """ψ > 0 activates ε_vol_pl ≥ 0 and EVol_pl > 0
    (test_shearband2D_DPCap.jl assertions, cone+dilation path)."""
    from justrelax_tpu.models.shearband import run

    s, info, hist, _, tauII = run(n=24, nt=6, dilation_angle=3.0)
    assert float(info.err) < 1.0e-4
    assert np.isfinite(float(jnp.max(tauII)))
    assert float(jnp.max(tauII)) < 2.0
    evol = np.asarray(s.eps_vol_pl)
    EVol = np.asarray(s.EVol_pl)
    assert evol.min() >= 0.0  # dilation: ε_vol_pl = −λ·dQdP ≥ 0
    assert evol.max() > 0.0
    assert np.abs(EVol).max() > 0.0
    assert float(jnp.max(s.EII_pl)) > 0.0
