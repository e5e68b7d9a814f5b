"""Distributed DYREL == serial (reference: DYREL under MPI,
src/DYREL/solver.jl:199-206 halo exchanges + MPI-reduced norms).

The GSPMD path (parallel/dyrel.py) runs the identical solver program on
sharded inputs; XLA inserts the halo collective-permutes and all-reduces.
Asserts (a) numerical parity with the serial solve at near-machine
precision, (b) the outputs are genuinely distributed over all 8 devices.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from justrelax_tpu.core.grid import Geometry
from justrelax_tpu.core.state import StokesState
from justrelax_tpu.models.shearband_dyrel import _circle_phase_ratios
from justrelax_tpu.ops.bc import Faces, VelocityBoundaryConditions, flow_bcs
from justrelax_tpu.parallel.dyrel import solve_dyrel_sharded
from justrelax_tpu.parallel.mesh import make_grid_mesh
from justrelax_tpu.rheology.materials import Material, MaterialStack
from justrelax_tpu.solvers.dyrel import solve_dyrel


def _setup(n=32):
    ni = (n, n)
    geometry = Geometry(ni, (1.0, 1.0))
    xci, xvi = geometry.xci, geometry.xvi
    tau_y, phi = 1.6, 30.0
    eta0, G0 = 1.0, 1.0
    dt = eta0 / G0 / 4.0
    C = tau_y / math.cos(math.radians(phi))
    common = dict(
        rho0=0.0, Kb=5.0, eta0=eta0, is_plastic=1.0, C=C,
        friction_angle=phi, dilation_angle=0.0, eta_reg=1.0e-2,
    )
    material = MaterialStack.make(
        [Material(G=G0, **common), Material(G=G0 / 2.0, **common)]
    )
    pr_c = jnp.asarray(_circle_phase_ratios(xci[0], xci[1], (0.5, 0.5), 0.1))
    pr_v = jnp.asarray(_circle_phase_ratios(xvi[0], xvi[1], (0.5, 0.5), 0.1))
    stokes = StokesState.make(ni)
    eps_bg = 1.0
    xv = jnp.asarray(xvi[0])
    yv = jnp.asarray(xvi[1])
    Vx = jnp.broadcast_to((eps_bg * xv)[:, None], (n + 1, n + 2))
    Vy = jnp.broadcast_to((-eps_bg * yv)[None, :], (n + 2, n + 1))
    Vx = Vx.at[1:-1, 1:-1].set(0.0)
    Vy = Vy.at[1:-1, 1:-1].set(0.0)
    bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True)
    )
    Vx, Vy = flow_bcs((Vx, Vy), bc)
    stokes = stokes.replace(V=stokes.V.replace(Vx=Vx, Vy=Vy))
    return stokes, geometry, bc, material, pr_c, pr_v, dt


@pytest.mark.slow
def test_dyrel_sharded_equals_serial():
    stokes, geometry, bc, material, pr_c, pr_v, dt = _setup()
    kwargs = dict(eps=1.0e-6, nout=50, rel_drop=0.5)

    s_ser, info_ser = solve_dyrel(
        stokes, geometry, bc, material, pr_c, pr_v, dt, **kwargs
    )

    mesh = make_grid_mesh(ndim=2)  # (4, 2) over the 8 CPU devices
    s_par, info_par = solve_dyrel_sharded(
        mesh, stokes, geometry, bc, material, pr_c, pr_v, dt, **kwargs
    )

    # genuinely distributed: solved fields live sharded across all 8 devices
    assert len(s_par.P.sharding.device_set) == 8
    assert not s_par.P.sharding.is_fully_replicated

    assert int(info_par.iters) == int(info_ser.iters)
    np.testing.assert_allclose(float(info_par.err), float(info_ser.err), rtol=1e-10)
    for name, a, b in [
        ("P", s_ser.P, s_par.P),
        ("Vx", s_ser.V.Vx, s_par.V.Vx),
        ("Vy", s_ser.V.Vy, s_par.V.Vy),
        ("txx", s_ser.tau.xx, s_par.tau.xx),
        ("txy_v", s_ser.tau.xy, s_par.tau.xy),
        ("tII", s_ser.tau.II, s_par.tau.II),
        ("eta_vep", s_ser.viscosity.eta_vep, s_par.viscosity.eta_vep),
        ("EII_pl", s_ser.EII_pl, s_par.EII_pl),
    ]:
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=1e-12,
            err_msg=f"distributed DYREL mismatch in {name}",
        )
