"""Multi-process distributed solve == serial (the reference ``mpiexec -n 2``
tier, test/runtests.jl:48-89 + test_shearband2D_MPI.jl).

Spawns 2 real JAX processes (jax.distributed + Gloo CPU collectives), each
with 4 virtual CPU devices, runs the sharded VE SolCx solve over the
2-host x 4-device DCN-aware mesh, gathers to process 0, and compares against
the serial single-process solver."""

import math
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from justrelax_tpu.core.coeffs import PTStokesCoeffs
from justrelax_tpu.core.grid import Geometry
from justrelax_tpu.core.state import StokesState
from justrelax_tpu.models import solcx
from justrelax_tpu.ops.bc import Faces, VelocityBoundaryConditions
from justrelax_tpu.parallel.decomp import Decomp2D, unblock_staggered
from justrelax_tpu.solvers.stokes2d import solve_ve

WORKER = Path(__file__).parent / "multihost_worker.py"


@pytest.mark.slow
def test_two_process_solve_matches_serial(tmp_path):
    out = tmp_path / "mh.npz"
    import os
    import socket

    # pick a free coordinator port (a fixed port flakes when the suite runs
    # alongside other processes or a previous run's socket is in TIME_WAIT)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = {
        k: v for k, v in os.environ.items()
        if not k.startswith(("JAX_", "XLA_"))
    }
    repo_root = str(Path(__file__).parents[1])
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), str(out), str(port)],
            env=env, cwd=repo_root,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in (0, 1)
    ]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=600)
        logs.append(stdout.decode())
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)
    assert out.exists(), "\n".join(logs)

    got = np.load(out)
    assert int(got["iters"]) == 1000

    # serial reference (this process: CPU x64 via conftest)
    nx = ny = 32
    geometry = Geometry((nx, ny), (1.0, 1.0))
    eta = solcx.solcx_viscosity(geometry, 1.0e6)
    rho = solcx.solcx_density(geometry)
    pt = PTStokesCoeffs.make(
        geometry.li, geometry.di, CFL=1.0 / math.sqrt(2.1),
        eps_abs=0.0, eps_rel=0.0,
    )
    bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True)
    )
    stokes = StokesState.make((nx, ny))
    stokes = stokes.replace(viscosity=stokes.viscosity.replace(eta=jnp.asarray(eta)))
    serial, info = solve_ve(
        stokes, pt, geometry, bc,
        (jnp.zeros((nx, ny)), jnp.asarray(rho)),
        jnp.full((nx, ny), jnp.inf), jnp.full((nx, ny), jnp.inf),
        0.1, iter_max=1000, nout=250,
    )
    assert int(info.iters) == 1000

    decomp = Decomp2D.make((nx, ny), (2, 4))
    for name, ref, extra, tol in (
        ("P", serial.P, (0, 0), 1e-12),
        ("Vx", serial.V.Vx, (1, 2), 1e-14),
        ("Vy", serial.V.Vy, (2, 1), 1e-14),
        ("txy", serial.tau.xy, (1, 1), 1e-12),
    ):
        dist = unblock_staggered(got[name], decomp, extra)
        np.testing.assert_allclose(
            dist, np.asarray(ref), rtol=0, atol=tol,
            err_msg=f"{name} mismatch 2-process vs serial",
        )
