"""Grid-blocked temporally-blocked Pallas VEP chunk
(ops/pallas_stokes_vep.py::stokes_vep_chunk_blocked): interpret-mode
equivalence with the VMEM-resident chunk kernel.

The blocked kernel runs the SAME ``_vep_iteration`` body on row windows with
2k-row halos; if the halo width is sufficient (x-stencil radius 2 per
iteration), the owned rows are bit-identical to the full-canvas result —
this is the correctness proof the streaming path rests on. Windows exercise
all three store offsets {0, H, 2H} (first / interior / clamped-last block),
the global-row ghost-ring refresh and per-side BC bands under a nonzero
``x_off``.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_pallas_vep import _powerlaw_material, _setup
from justrelax_tpu.ops.bc import Faces, VelocityBoundaryConditions, flow_bcs
from justrelax_tpu.ops.pallas_stokes_vep import (
    choose_blocking_vep,
    stokes_vep_chunk_blocked,
    stokes_vep_chunk_vmem,
)
from justrelax_tpu.ops.stencil import av_vertex_to_center


def _run_both(n, bc, material, T, NIT, row_block, iters_per_pass):
    ni, geometry, default_mat, pr_c, pr_v, _, st, Vx0, Vy0, pt = _setup(
        n, dilation=10.0)
    if material is None:
        material = default_mat
    if bc is not None:
        Vx0, Vy0 = flow_bcs((Vx0, Vy0), bc)
    f = st.P.dtype
    T_v = None if T is None else av_vertex_to_center(jnp.pad(T, 1, "edge"))
    txx_o = jnp.full(ni, 1.6, f)
    tau_o = (txx_o, -txx_o, jnp.full(ni, 1.0, f),
             jnp.full((n + 1, n + 1), 1.0, f))
    EII = st.EII_pl + 0.001
    dt = 0.25
    cutoff = (1e-3, 1e3)
    args = (
        Vx0, Vy0, st.P, st.P, tau_o[0], tau_o[1], tau_o[2], tau_o[3],
    )
    from justrelax_tpu.rheology.viscosity import phase_viscosity

    eta0 = phase_viscosity(material, jnp.ones(ni, f), T, pr_c, "tau") * 1.1
    etav0 = phase_viscosity(
        material, jnp.ones((n + 1, n + 1), f), T_v, pr_v, "tau") * 1.1
    inv_dx, inv_dy = 1.0 / geometry.di[0], 1.0 / geometry.di[1]
    common = dict(interpret=True, flow_bc=bc, T_v=T_v)
    res = stokes_vep_chunk_vmem(
        *args, eta0, etav0, jnp.zeros(ni, f), jnp.zeros((n + 1, n + 1), f),
        st.P, st.Q, *tau_o, EII, material, pr_c, pr_v, T,
        dt, inv_dx, inv_dy, pt.r, pt.theta_dtau, pt.etadtau,
        0.2, 0.5, cutoff, nout=NIT, **common)
    blk = stokes_vep_chunk_blocked(
        *args, eta0, etav0, jnp.zeros(ni, f), jnp.zeros((n + 1, n + 1), f),
        st.P, st.Q, *tau_o, EII, material, pr_c, pr_v, T,
        dt, inv_dx, inv_dy, pt.r, pt.theta_dtau, pt.etadtau,
        0.2, 0.5, cutoff, nout=NIT, row_block=row_block,
        iters_per_pass=iters_per_pass, **common)
    return res, blk


NAMES = ["Vx", "Vy", "theta", "P", "txx", "tyy", "txy_c", "txy_v",
         "eta", "eta_v", "lam", "lam_v"]


# Tolerance note: owned rows are BITWISE equal to the resident kernel while
# no cell sits within 1 ulp of the yield surface (NIT ≤ 6 on this config);
# past that, FMA-contraction differences between the two program structures
# flip the F > 0 branch at such cells and the diff is ulp-sized (the same
# bounded yield-flip phenomenon documented in tests/test_pallas_vep.py). A
# WRONG halo gives O(1) roll-wrapped garbage, so tol=2e-15 still proves the
# 2k-row invariant; the bitwise rows pin it exactly.
@pytest.mark.parametrize("NIT,tol", [(2, 0.0), (4, 0.0), (6, 0.0),
                                     (7, 2e-15)])
def test_blocked_matches_resident_linear(NIT, tol):
    """3 row-blocks, k=2 per pass: owned rows equal the resident kernel
    through plasticity, continuation and free-slip BCs (NIT=7 also
    exercises a short remainder pass)."""
    res, blk = _run_both(46, None, None, None, NIT,
                         row_block=16, iters_per_pass=2)
    for nm, a, b in zip(NAMES, res, blk):
        d = float(jnp.abs(a - b).max())
        assert d <= tol, f"{nm}: {d}"


def test_blocked_matches_resident_single_pass_deep():
    """A k=7 single-pass window (H=14) matches over the same depth — the
    halo invariant holds at larger temporal blocks, not just k=2."""
    res, blk = _run_both(62, None, None, None, 7,
                         row_block=32, iters_per_pass=7)
    for nm, a, b in zip(NAMES, res, blk):
        d = float(jnp.abs(a - b).max())
        assert d <= 2e-15, f"{nm}: {d}"


@pytest.mark.slow
def test_blocked_matches_resident_k12():
    """k=12 (H=24) — the deep-temporal-reuse corner of the r04 on-chip
    config sweep (scripts/sweep_blocked_vep.py) — satisfies the same halo
    invariant: owned rows equal the resident kernel over a full 12-iteration
    pass at the minimum legal R = 2H (n chosen so A = n + 2 = 144 splits
    into 3 exact R=48 blocks — smaller n rounds R below 2H and the chooser
    rejects the config)."""
    res, blk = _run_both(142, None, None, None, 12,
                         row_block=48, iters_per_pass=12)
    for nm, a, b in zip(NAMES, res, blk):
        d = float(jnp.abs(a - b).max())
        assert d <= 2e-15, f"{nm}: {d}"


def test_blocked_matches_resident_powerlaw_noslip():
    """The halo analysis holds with every capability active: no-slip walls
    (global-row bands under x_off), the power-law continuation and a T
    field. The power-law body contains ``pow``, whose CPU codegen differs in
    the last ulp between the two program shapes even at one iteration, so
    the assertion is relative (ulp-level; eta_v sits near the 1e3 cutoff so
    its absolute diffs read ~1e-13) — halo errors would be O(1)."""
    n = 46
    bc = VelocityBoundaryConditions(
        free_slip=Faces(left=True, right=True),
        no_slip=Faces(top=True, bot=True))
    material = _powerlaw_material()
    xc = (jnp.arange(n) + 0.5) / n
    T = 300.0 + 50.0 * jnp.sin(
        2.0 * jnp.pi * xc[:, None]) * jnp.ones((1, n))
    res, blk = _run_both(n, bc, material, T, 6,
                         row_block=16, iters_per_pass=2)
    for nm, a, b in zip(NAMES, res, blk):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-13, atol=5e-13,
            err_msg=nm)


@pytest.mark.slow
def test_solve_vep_blocked_dispatch():
    """solve_vep(use_pallas="blocked") reproduces the XLA solve — the
    force-blocked testing hook exercises the full streaming path at solve
    level (interpret mode on CPU)."""
    from justrelax_tpu.ops.bc import flow_bcs as _fb
    from justrelax_tpu.solvers.stokes2d_vep import solve_vep

    n = 46
    ni, geometry, material, pr_c, pr_v, bc, st, Vx0, Vy0, pt = _setup(
        n, dilation=0.0)
    st = st.replace(V=st.V.replace(Vx=Vx0, Vy=Vy0))
    kw = dict(iter_max=600, iter_min=200, nout=100)
    s_ref, info_ref = solve_vep(
        st, pt, geometry, bc, material, pr_c, pr_v, 0.25, **kw)
    s_blk, info_blk = solve_vep(
        st, pt, geometry, bc, material, pr_c, pr_v, 0.25,
        use_pallas="blocked", **kw)
    assert int(info_blk.iters) == int(info_ref.iters)
    np.testing.assert_allclose(
        np.asarray(s_blk.tau.II), np.asarray(s_ref.tau.II), atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(s_blk.V.Vx), np.asarray(s_ref.V.Vx), atol=2e-6)


def _blk_args(n):
    """Assembled argument list for a direct stokes_vep_chunk_blocked call."""
    ni, geometry, material, pr_c, pr_v, _, st, Vx0, Vy0, pt = _setup(
        n, dilation=10.0)
    f = st.P.dtype
    txx_o = jnp.full(ni, 1.6, f)
    tau_o = (txx_o, -txx_o, jnp.full(ni, 1.0, f),
             jnp.full((n + 1, n + 1), 1.0, f))
    from justrelax_tpu.rheology.viscosity import phase_viscosity

    eta0 = phase_viscosity(material, jnp.ones(ni, f), None, pr_c, "tau") * 1.1
    etav0 = phase_viscosity(
        material, jnp.ones((n + 1, n + 1), f), None, pr_v, "tau") * 1.1
    args = (Vx0, Vy0, st.P, st.P, tau_o[0], tau_o[1], tau_o[2], tau_o[3],
            eta0, etav0, jnp.zeros(ni, f), jnp.zeros((n + 1, n + 1), f),
            st.P, st.Q, *tau_o, st.EII_pl + 0.001,
            material, pr_c, pr_v, None,
            0.25, n / 1.0, n / 1.0, pt.r, pt.theta_dtau, pt.etadtau,
            0.2, 0.5, (1e-3, 1e3))
    return args


def test_nout_zero_static_returns_inputs():
    """ADVICE r03: nout=0 (static) must return the 12 input fields
    unchanged, not uninitialized ping-pong buffers."""
    args = _blk_args(46)
    out = stokes_vep_chunk_blocked(*args, nout=0, interpret=True,
                                   row_block=16, iters_per_pass=2)
    for nm, a, b in zip(NAMES, args[:12], out):
        assert float(jnp.abs(a - b).max()) == 0.0, nm


def test_nout_zero_traced_copies_carry():
    """A traced nout=0 runs one k_act=0 pass that copies the carry to the
    output buffer — finite fields equal to the inputs (ADVICE r03)."""
    import jax

    args = _blk_args(46)

    def f(nout):
        return stokes_vep_chunk_blocked(
            *args, nout=nout, interpret=True,
            row_block=16, iters_per_pass=2, max_nout=8)

    out = jax.jit(f)(jnp.asarray(0, jnp.int32))
    for nm, a, b in zip(NAMES, args[:12], out):
        assert bool(jnp.all(jnp.isfinite(b))), nm
        assert float(jnp.abs(a - b).max()) == 0.0, nm


def test_traced_nout_clamped_to_max_nout():
    """A traced nout past max_nout is clamped (not silently dropped):
    the result equals the max_nout result (ADVICE r03)."""
    import jax

    args = _blk_args(46)

    def f(nout):
        return stokes_vep_chunk_blocked(
            *args, nout=nout, interpret=True,
            row_block=16, iters_per_pass=2, max_nout=4)

    out_hi = jax.jit(f)(jnp.asarray(99, jnp.int32))
    out_max = jax.jit(f)(jnp.asarray(4, jnp.int32))
    for nm, a, b in zip(NAMES, out_max, out_hi):
        assert float(jnp.abs(a - b).max()) == 0.0, nm


def test_choose_blocking_vep_invariants():
    """Production-size configs exist and respect the alignment/offset
    invariants (R multiple of 8, R >= 2H, H multiple of 8)."""
    for ny in (1024, 2048):
        cfg = choose_blocking_vep(ny, ny, n_const=31)
        assert cfg is not None
        R, k, n_blocks, A_pad, W = cfg
        H = 2 * k
        assert R % 8 == 0 and H % 8 == 0 and R >= 2 * H
        assert W == R + 2 * H and A_pad == R * n_blocks
        assert A_pad >= ny + 2
