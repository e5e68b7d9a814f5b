"""solve_vep Pallas dispatch policy (solvers/stokes2d_vep.py).

The round-3 bench postmortem (BENCH_r03: the grid-blocked VEP kernel was
auto-dispatched past VMEM residency and failed to compile on the chip)
fixed the policy to: `use_pallas=True` uses the VMEM-resident chunk while
it fits and falls back to the XLA streaming path past residency; the
blocked streaming kernel is strictly opt-in (`use_pallas="blocked"` /
`pallas_blocked=True`) until an on-chip measurement shows it winning
(`VEP_BLOCKED_AUTO_DISPATCH`). These tests pin the decision table by
intercepting the jitted inner solve — no large-grid solve is run.
"""

import jax.numpy as jnp
import pytest

import justrelax_tpu.solvers.stokes2d_vep as sv
from tests.test_pallas_vep import _setup


def _dispatch(n, monkeypatch, **kw):
    """Return the (use_pallas, pallas_blocked, pallas_visc_m) the public
    entry resolves for an n×n grid, without running the solve."""
    seen = {}

    def fake(stokes, pt, geometry, bc, material, prc, prv, dt, **kwargs):
        seen.update(kwargs)
        raise _Intercept

    class _Intercept(Exception):
        pass

    monkeypatch.setattr(sv, "_solve_vep", fake)
    ni, geometry, material, pr_c, pr_v, bc, st, Vx0, Vy0, pt = _setup(32)
    if n != 32:
        # fake a big grid: only shapes feed the dispatch decision
        f = st.P.dtype
        big = jnp.zeros((n, n), f)
        st = st.replace(P=big)
    with pytest.raises(_Intercept):
        sv.solve_vep(st, pt, geometry, bc, material, pr_c, pr_v, 0.25, **kw)
    return (seen["use_pallas"], seen["pallas_blocked"],
            seen["pallas_visc_m"])


def test_small_grid_resident(monkeypatch):
    up, blk, m = _dispatch(32, monkeypatch, use_pallas=True)
    assert up is True and blk is False


def test_big_grid_dispatch_follows_measurement(monkeypatch):
    """Past VMEM residency the use_pallas=True default follows the on-chip
    measurement record (docs/performance.md): blocked kernel when
    VEP_BLOCKED_AUTO_DISPATCH (r04: 576 vs 566 GB/s win), XLA fallback
    otherwise."""
    up, blk, m = _dispatch(1024, monkeypatch, use_pallas=True)
    if sv.VEP_BLOCKED_AUTO_DISPATCH:
        assert up is True and blk is True
    else:
        assert up is False and blk is False


def test_big_grid_blocked_opt_out_falls_back_to_xla(monkeypatch):
    """Explicit pallas_blocked=False past residency cannot use the
    VMEM-resident chunk (compile OOM) — it must fall back to XLA."""
    up, blk, m = _dispatch(1024, monkeypatch, use_pallas=True,
                           pallas_blocked=False)
    assert up is False and blk is False


def test_big_grid_blocked_opt_in(monkeypatch):
    up, blk, m = _dispatch(1024, monkeypatch, use_pallas="blocked")
    assert up is True and blk is True


def test_big_grid_blocked_kwarg_opt_in(monkeypatch):
    up, blk, m = _dispatch(1024, monkeypatch, use_pallas=True,
                           pallas_blocked=True)
    assert up is True and blk is True


def test_has_cap_escape_hatch_requires_visc_m():
    ni, geometry, material, pr_c, pr_v, bc, st, Vx0, Vy0, pt = _setup(32)
    with pytest.raises(ValueError, match="pallas_visc_m"):
        sv.solve_vep(st, pt, geometry, bc, material, pr_c, pr_v, 0.25,
                     use_pallas=True, pallas_has_cap=False)


def test_has_cap_escape_hatch_dispatch(monkeypatch):
    up, blk, m = _dispatch(32, monkeypatch, use_pallas=True,
                           pallas_has_cap=False, pallas_visc_m=None)
    assert up is True and blk is False and m is None
