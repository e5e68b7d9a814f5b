"""Shear-band benchmark on a REFINED (nonuniform) grid — the reference's
refined-grid application variant
(miniapps/benchmarks/stokes2D/shear_band/ShearBand2D_refined.jl).

The reference builds the x-vertex vector by equidistributing a window
monitor M clustered around the inclusion (window_monitor(2, 10, 1e-1, 0.5)
→ solve_grid, ShearBand2D_refined.jl:209-213) and keeps y uniform, then
runs the SAME coupled VEP shear-band time loop on `Geometry(xvi...)` —
exactly :mod:`justrelax_tpu.core.grid.NonuniformGeometry`. This model
mirrors that: monitor-equidistributed x vertices (~3× finer at the
inclusion), uniform y, and the shear-band configuration/time loop of
:mod:`justrelax_tpu.models.shearband`.

Oracle: before yield the VE stress buildup 2·ε̇·η·(1−e^{−Gt/η}) is
spatially uniform, hence EXACTLY grid-independent — the analytic curve
holds on the stretched grid to the same tolerance as the uniform one; after
yield the τII extrema must land near the uniform-grid goldens (the refined
run resolves the band better, so a looser atol than test_shearband2D's
1e-3 is correct, matching the reference which validates this variant
visually).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from justrelax_tpu.core.coeffs import PTStokesCoeffs
from justrelax_tpu.core.grid import NonuniformGeometry
from justrelax_tpu.core.state import StokesState
from justrelax_tpu.models.shearband import _circle_phase_ratios
from justrelax_tpu.ops.bc import Faces, VelocityBoundaryConditions, flow_bcs
from justrelax_tpu.ops.stokes import tensor_invariant_staggered_2d
from justrelax_tpu.rheology.materials import Material, MaterialStack
from justrelax_tpu.solvers.stokes2d_vep import solve_vep


def refined_axis(n, lo=0.0, hi=1.0, center=0.5, amplitude=9.0, width=0.1):
    """Vertex coordinates equidistributing the window monitor
    M(x) = 1 + amplitude·exp(−((x−center)/width)²) — the reference's
    window_monitor/solve_grid pair (ShearBand2D_refined.jl:209): cells
    cluster where M is large (≈(1+amplitude)× finer at the center)."""
    xs = np.linspace(lo, hi, 8 * n + 1)
    M = 1.0 + amplitude * np.exp(-(((xs - center) / width) ** 2))
    cdf = np.concatenate(
        [[0.0], np.cumsum(0.5 * (M[1:] + M[:-1]) * np.diff(xs))])
    cdf /= cdf[-1]
    xv = np.interp(np.linspace(0.0, 1.0, n + 1), cdf, xs)
    xv[0], xv[-1] = lo, hi
    return xv


def run(n=32, nt=10, eps_bg=1.0, dtype=None):
    ni = (n, n)
    xv_ref = refined_axis(n)                       # refined x
    xv_uni = np.linspace(0.0, 1.0, n + 1)          # uniform y (reference :210)
    geometry = NonuniformGeometry((xv_ref, xv_uni))
    xci, xvi = geometry.xci, geometry.xvi

    tau_y = 1.6
    phi = 30.0
    eta0, G0 = 1.0, 1.0
    Gi = G0 / (6.0 - 4.0)
    eta_reg = 8.0e-3
    dt = eta0 / G0 / 4.0
    C = tau_y / math.cos(math.radians(phi))

    common = dict(
        rho0=0.0, Kb=4.0, eta0=eta0, is_plastic=1.0, C=C,
        friction_angle=phi, dilation_angle=0.0, eta_reg=eta_reg,
    )
    material = MaterialStack.make(
        [Material(G=G0, **common), Material(G=Gi, **common)]
    )

    radius = 0.1
    pr_center = jnp.asarray(
        _circle_phase_ratios(xci[0], xci[1], (0.5, 0.5), radius))
    pr_vertex = jnp.asarray(
        _circle_phase_ratios(xvi[0], xvi[1], (0.5, 0.5), radius))

    stokes = StokesState.make(ni, dtype=dtype)
    dt_f = stokes.P.dtype
    pt_stokes = PTStokesCoeffs.make(
        geometry.li, geometry.di, eps_rel=1.0e-6, CFL=0.75 / math.sqrt(2.1)
    )

    # pure-shear initial velocity from the NONUNIFORM vertex coordinates
    # (reference :125-126 evaluates x·ε̇bg on xvi directly)
    xv = jnp.asarray(xvi[0], dt_f)
    yv = jnp.asarray(xvi[1], dt_f)
    Vx = jnp.broadcast_to((eps_bg * xv)[:, None], (n + 1, n + 2))
    Vy = jnp.broadcast_to((-eps_bg * yv)[None, :], (n + 2, n + 1))
    flow_bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True, top=True, bot=True)
    )
    Vx, Vy = flow_bcs((Vx, Vy), flow_bc)
    stokes = stokes.replace(V=stokes.V.replace(Vx=Vx, Vy=Vy))

    t = 0.0
    tau_max_hist, sol_hist, tt = [], [], []
    info = None
    for _ in range(nt):
        stokes, info = solve_vep(
            stokes, pt_stokes, geometry, flow_bc, material,
            pr_center, pr_vertex, dt, iter_max=50_000, nout=100,
        )
        tau_max_hist.append(float(stokes.tau.xx.max()))
        t += dt
        sol_hist.append(
            2.0 * eps_bg * eta0 * (1.0 - math.exp(-G0 * t / eta0)))
        tt.append(t)

    tau_II = tensor_invariant_staggered_2d(
        stokes.tau.xx, stokes.tau.yy, stokes.tau.xy)
    return stokes, info, tau_max_hist, sol_hist, tau_II
