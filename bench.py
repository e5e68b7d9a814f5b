"""Benchmark + TPU validation: per-kernel-family T_eff / GUPS and on-chip
golden assertions.

The APT method is memory-bandwidth bound (Räss et al. 2022 GMD; reference
docs/src/man/equations_APT.md:38): the per-chip figure of merit is T_eff —
the necessary memory traffic of one fused PT iteration divided by its wall
time — against the HBM speed-of-light, plus grid-updates/s. BASELINE.md
requires this *per kernel family*; the families and their Räss-convention
traffic accounting live in justrelax_tpu/utils/bench_kernels.py.

Crash-isolation contract (round-3 postmortem: one VMEM compile failure at
family 11 of 12 erased every already-measured row AND the golden tier):
- goldens run FIRST, each wrapped individually;
- every family is wrapped; a compile/runtime failure becomes that family's
  row ({"error": tail}) instead of killing the run;
- every completed item is appended immediately to BENCH_partial.jsonl (and
  a progress line goes to stderr), so a kill at any point leaves a record;
- Pallas families are compiled via the explicit AOT path
  (jit(step).lower(...).compile()) — the compile outcome at the production
  shape is recorded in the "pallas_preflight" section whether or not the
  timed run happens;
- the process exits 0 with the final single JSON line on stdout unless the
  harness itself is broken.

Prints ONE JSON line. Headline metric = flagship 2D VEP T_eff at the
production grid (1024² f32) through the auto-dispatched fast path, with
the same-size XLA fallback alongside; per-family rows under "families";
golden outcomes under "tpu_goldens"; AOT compile table under
"pallas_preflight"; vs_baseline = T_eff / HBM peak (v5e: 819 GB/s).

Env overrides: BENCH_FAMILIES=ve2d,vep2d,...  BENCH_GOLDENS=default|full|off
BENCH_REPEATS=3
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

# NOTE (axon tunnel): block_until_ready does not actually block — force
# materialization with np.asarray; the persistent compilation cache does not
# capture axon executables, so each family costs one remote compile
# (~minutes). Per-call jitter is ~10-100 ms, so the two-point slope signal is
# auto-calibrated to >= 0.5 s.

HBM_PEAK = 819.0  # v5e HBM GB/s
PARTIAL_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_partial.jsonl")


def _progress(section, name, row):
    """Append one completed item to the partial record and stderr — a later
    crash/kill can never erase it."""
    line = json.dumps({"section": section, "name": name, "row": row})
    try:
        with open(PARTIAL_PATH, "a") as f:
            f.write(line + "\n")
    except OSError:
        pass
    print(f"[bench] {section}:{name} -> {line[:400]}", file=sys.stderr,
          flush=True)


def _err_tail(exc, n=900):
    s = f"{type(exc).__name__}: {exc}"
    return s[-n:]


def _materialize(out):
    # Reduce ON DEVICE and fetch 4 bytes: np.asarray(leaf) would download
    # the whole array over the tunnel (67 MB/leaf at 254³ — seconds of
    # jitter per timing call, the r05 254³ A/B noise source). The sum
    # executes after the timed computation, so it still forces completion
    # (block_until_ready does not actually block on axon).
    leaf = jax.tree.leaves(out)[0]
    return float(np.asarray(jnp.sum(leaf)))


def _time_once(fn, n, carry, consts):
    t0 = time.perf_counter()
    _materialize(fn(jnp.asarray(n, jnp.int32), carry, consts))
    return time.perf_counter() - t0


def bench_family(name, factory_kwargs=None, repeats=3, preflight=None):
    from justrelax_tpu.utils import bench_kernels as bk

    # factory work on the host CPU backend (axon eager ops are remote
    # compiles — minutes per family otherwise), one transfer to the chip
    step, carry, consts, bytes_per_iter, n_cells = bk.build_family_on_cpu(
        name, factory_kwargs
    )
    # explicit AOT stage: for Pallas families the compile outcome at this
    # (production) shape is the dispatch-gate record the VERDICT asks for;
    # the same executable is then timed (no second compile).
    jitted = jax.jit(step)
    t0 = time.perf_counter()
    try:
        fn = jitted.lower(jnp.asarray(10, jnp.int32), carry, consts).compile()
        compile_s = time.perf_counter() - t0
        if preflight is not None:
            preflight[name] = {
                "compiles": True, "compile_s": round(compile_s, 1),
                "n_cells": n_cells,
            }
    except Exception as exc:  # compile failure: record and re-raise
        if preflight is not None:
            preflight[name] = {"compiles": False, "error": _err_tail(exc)}
        raise

    _time_once(fn, 10, carry, consts)  # warmup

    # calibrate iteration time, then size the slope signal to ~0.6 s.
    # Plausibility loop (VERDICT r04 #2a: the pallas_ve2d row shipped a
    # collapsed slope -> 9.3e9 GB/s): if the measured slope signal
    # (min(t2)-min(t1)) came out under 0.3 s — i.e. inside the tunnel's
    # 10-100 ms per-call jitter — the calibration was wrong; grow dn and
    # re-measure rather than shipping an absurd number.
    t_a = min(_time_once(fn, 10, carry, consts) for _ in range(2))
    t_b = _time_once(fn, 510, carry, consts)
    t_est = max((t_b - t_a) / 500.0, 1e-7)
    dn = int(min(max(0.6 / t_est, 300), 2_000_000))

    for _attempt in range(4):
        n1, n2 = 100, 100 + dn
        t1s, t2s = [], []
        for _ in range(repeats):
            t1s.append(_time_once(fn, n1, carry, consts))
            t2s.append(_time_once(fn, n2, carry, consts))
        signal = min(t2s) - min(t1s)
        if signal >= 0.3 or dn >= 2_000_000:
            break
        dn = int(min(max(dn * max(0.6 / max(signal, 1e-3), 2.0), dn * 2),
                     2_000_000))

    t_iters = sorted(max((b - a) / dn, 1e-12) for a, b in zip(t1s, t2s))
    t_iter = max(signal / dn, 1e-12)  # min-over-repeats slope (noise floor)
    t_med = t_iters[len(t_iters) // 2]
    t_eff = bytes_per_iter / t_iter / 1e9
    gups = n_cells / t_iter / 1e9
    row = {
        "T_eff_GBs": round(t_eff, 2),
        "GUPS": round(gups, 3),
        "t_iter_us": round(t_iter * 1e6, 3),
        # spread record (VERDICT r04 #2b): per-repeat slopes + median, so a
        # 2% "win" inside the run-to-run band is visibly not a decision
        "t_iter_us_median": round(t_med * 1e6, 3),
        "t_iter_us_repeats": [round(t * 1e6, 3) for t in t_iters],
        "slope_signal_s": round(signal, 3),
        "dn": dn,
        "n_cells": n_cells,
        "vs_hbm_peak": round(t_eff / HBM_PEAK, 4),
    }
    if signal < 0.3:
        row["suspect"] = ("slope signal %.3f s below 0.3 s target at dn cap;"
                          " t_iter unreliable" % signal)
    if not name.startswith("pallas_"):
        # measured roofline fraction at ACTUAL traffic (carry 2x + consts
        # 1x, zero HBM temps): ~1.0 proves the XLA path is memory-bound at
        # speed-of-light and any T_eff deficit is traffic overhead (which
        # the Pallas chunk/blocked paths remove), not kernel inefficiency
        try:
            sb = bk.stream_bytes_per_iter(name, factory_kwargs)
            frac = sb / t_iter / 1e9 / HBM_PEAK
            row["stream_GBs"] = round(sb / t_iter / 1e9, 2)
            row["stream_frac_peak"] = round(frac, 4)
            if frac > 1.02:
                # VERDICT r04 #8: the carry x2 + consts x1 byte model assumes
                # every iteration round-trips HBM; when XLA keeps the fori
                # carry VMEM-resident (sub-residency grids) the model
                # overcounts and the fraction exceeds 1 — NOT a roofline
                # proof for this row.
                row["stream_frac_note"] = (
                    "frac>1: carry is VMEM-resident across iterations; byte "
                    "model overcounts — roofline claim invalid at this size")
        except Exception:
            pass
    return row


def paired_ab(name_a, name_b, repeats=5, kwargs_a=None, kwargs_b=None,
              target_s=0.5):
    """Same-process alternating A/B (VERDICT r04 #2c): compile both paths,
    then interleave slope measurements A,B,A,B,... so drift/jitter hits both
    equally. Returns per-repeat t_iter for each and a decision that only
    calls a winner when the median gap exceeds the half-range spread of
    BOTH paths — a 2% 'win' inside +-4% noise is reported as a tie."""
    from justrelax_tpu.utils import bench_kernels as bk

    paths = {}
    for key, name, kw in (("a", name_a, kwargs_a), ("b", name_b, kwargs_b)):
        step, carry, consts, bpi, n_cells = bk.build_family_on_cpu(name, kw)
        fn = jax.jit(step).lower(
            jnp.asarray(10, jnp.int32), carry, consts).compile()
        _time_once(fn, 10, carry, consts)  # warmup
        t_a = min(_time_once(fn, 10, carry, consts) for _ in range(2))
        t_b = _time_once(fn, 510, carry, consts)
        t_est = max((t_b - t_a) / 500.0, 1e-7)
        dn = int(min(max(target_s / t_est, 300), 2_000_000))
        paths[key] = dict(name=name, fn=fn, carry=carry, consts=consts,
                          bpi=bpi, dn=dn, slopes=[])

    for _ in range(repeats):
        for key in ("a", "b"):
            p = paths[key]
            t1 = _time_once(p["fn"], 100, p["carry"], p["consts"])
            t2 = _time_once(p["fn"], 100 + p["dn"], p["carry"], p["consts"])
            p["slopes"].append(max((t2 - t1) / p["dn"], 1e-12))

    out = {}
    stats = {}
    degraded = False
    for key in ("a", "b"):
        p = paths[key]
        # a repeat whose slope collapsed to the 1e-12 clamp (negative raw
        # slope under jitter) is an invalid sample, not a fast kernel
        ts = sorted(t for t in p["slopes"] if t > 1e-9)
        if len(ts) < 3:
            degraded = True
            ts = ts or [1.0]
        med = ts[len(ts) // 2]
        half_range = (ts[-1] - ts[0]) / 2.0
        stats[key] = (med, half_range)
        out[p["name"]] = {
            "T_eff_GBs_median": round(p["bpi"] / med / 1e9, 2),
            "T_eff_GBs_best": round(p["bpi"] / ts[0] / 1e9, 2),
            "t_iter_us_repeats": [round(t * 1e6, 2) for t in p["slopes"]],
            "n_valid": len(ts),
            "dn": p["dn"],
        }
    (med_a, hr_a), (med_b, hr_b) = stats["a"], stats["b"]
    gap = med_a - med_b  # >0: b (blocked) faster
    noise = max(hr_a, hr_b)
    if degraded:
        decision = "invalid (collapsed repeats)"
    elif abs(gap) <= noise:
        decision = "tie"
    else:
        decision = name_b if gap > 0 else name_a
    out["decision"] = decision
    out["median_gap_us"] = round(gap * 1e6, 3)
    out["noise_half_range_us"] = round(noise * 1e6, 3)
    return out


def _golden_items(level):
    """Yield (name, thunk) pairs; each thunk returns a result dict with a
    'pass' key. Reference oracles: test_stokes_solcx.jl:33-34,
    test_diffusion2D.jl:133-134, test_shearband2D.jl:197-201,
    test_stokes_burstedde.jl:32-40, test_shearband2D_DYREL.jl,
    test_stokes_elastic_buildup.jl, test_Blankenbach.jl:285-287."""

    def solcx():
        from justrelax_tpu.models import solcx as m
        _, _, info, _ = m.run(nx=32, ny=32, d_eta=1.0e6)
        v = float(info.err)
        # f64 oracle is 1e-8; f32 PT stalls at the rounding floor ~1e-6
        return {"value": v, "tol": 5.0e-6, "pass": bool(v < 5.0e-6)}

    def diffusion2d():
        from justrelax_tpu.models import diffusion2d as m
        thermal, _ = m.run(nx=32, ny=32)
        T = np.asarray(thermal.T)
        mid = float(T[T.shape[0] // 2, T.shape[1] // 2])
        golden = 1817.9448461176817
        return {"value": mid, "golden": golden, "atol": 0.5,
                "pass": bool(abs(mid - golden) < 0.5)}

    def _shearband(**kw):
        from justrelax_tpu.models import shearband as m
        _, info, _, _, tau_II = m.run(n=32, nt=10, **kw)
        v = float(np.asarray(tau_II).max())
        return {"value": v, "golden": 1.6415, "atol": 0.01,
                "err": float(info.err),
                "pass": bool(abs(v - 1.6415) < 0.01
                             and float(info.err) < 1e-4)}

    def burstedde():
        from justrelax_tpu.models import burstedde as m
        geom3, st3, info3 = m.run(nx=16, ny=16, nz=16, iter_max=20_000,
                                  nout=1_000)
        vx_a, _ = m.analytic_velocity(geom3)
        vx = np.asarray(st3.V.Vx[:, 1:-1, 8])
        rel = float(np.linalg.norm(vx - vx_a) / np.linalg.norm(vx_a))
        return {"value": rel, "tol": 5.0e-2, "err": float(info3.err),
                "pass": bool(rel < 5.0e-2)}

    def dyrel():
        from justrelax_tpu.models import shearband_dyrel as m
        _, info, _, _, tau_II = m.run(n=32, nt=10)
        v = float(np.asarray(tau_II).max())
        return {"value": v, "golden": 1.639, "atol": 0.02,
                "err": float(info.err),
                "pass": bool(abs(v - 1.639) < 0.02)}

    def elastic_buildup():
        from justrelax_tpu.models import elastic_buildup as m
        _, av, sol, _, _ = m.run(nx=32, ny=32, endtime_kyr=10.0)
        err = float(np.mean([abs(abs(a) - s) / s for a, s in zip(av, sol)]))
        return {"value": err, "tol": 6.0e-3, "pass": bool(err <= 6.0e-3)}

    def blankenbach_pallas():
        """Coupled application on the fast path (VERDICT r03 #5): Blankenbach
        convection — T-dependent density ρ(T)·g through the Pallas VEP
        chunk — XLA vs use_pallas=True cross-checked ON-CHIP."""
        from justrelax_tpu.models import blankenbach as m
        ur_x, nu_x, info_x, _, _ = m.run(nx=32, ny=32, nit=1)
        ur_p, nu_p, info_p, _, _ = m.run(nx=32, ny=32, nit=1,
                                         use_pallas=True)
        rel = abs(ur_p[-1] - ur_x[-1]) / abs(ur_x[-1])
        # two oracles (VERDICT r04 weak #7): path equivalence (measured
        # on-chip: 9.8e-5) AND the frozen CPU/f64 physics value of this
        # exact configuration (0.29207194, r05) — the absolute check
        # catches an error common to BOTH chip paths; info.err is an
        # ABSOLUTE residual (~2.7e-6 of the 4e4 Pa/m buoyancy scale at
        # f32) so it is reported, not thresholded
        golden_f64 = 0.29207194481326537
        rel_abs = abs(ur_p[-1] - golden_f64) / golden_f64
        ok = bool(rel < 1e-3 and rel_abs < 2e-2 and np.isfinite(ur_p[-1]))
        return {"value": float(ur_p[-1]), "xla": float(ur_x[-1]),
                "rel_gap": float(rel), "golden_f64": golden_f64,
                "rel_vs_f64": float(rel_abs),
                "err": float(info_p.err), "pass": ok}

    def vep3d_hybrid():
        """3D VEP through the r05 fast path: solve_vep_3d(use_pallas=True)
        — Pallas edge passes + XLA center (ops/pallas_vep3d_edges.py) —
        vs the XLA mixed-shape solve, cross-checked ON-CHIP (certified
        12% paired-A/B win; this golden keeps it honest)."""
        import math as _math

        import jax.numpy as _jnp

        from justrelax_tpu.core.coeffs import PTStokesCoeffs
        from justrelax_tpu.core.grid import Geometry
        from justrelax_tpu.core.state import StokesState
        from justrelax_tpu.ops.bc import (
            Faces, VelocityBoundaryConditions, flow_bcs)
        from justrelax_tpu.rheology.materials import Material, MaterialStack
        from justrelax_tpu.rheology.phases import phase_ratios_from_field
        from justrelax_tpu.solvers.stokes3d_vep import solve_vep_3d

        n = 10
        ni = (n, n, n)
        geometry = Geometry(ni, (1.0, 1.0, 1.0))
        common = dict(Kb=4.0, eta0=1.0, is_plastic=1.0,
                      C=0.15 / _math.cos(_math.radians(30.0)),
                      friction_angle=30.0, eta_reg=8.0e-3)
        mat = MaterialStack.make([
            Material(G=1.0, **common), Material(G=0.5, **common)])
        X, Y, Z = geometry.cell_centers_mesh()
        sph = ((np.asarray(X) - 0.5) ** 2 + (np.asarray(Y) - 0.5) ** 2
               + (np.asarray(Z) - 0.5) ** 2) < 0.15 ** 2
        pr = phase_ratios_from_field(_jnp.asarray(sph.astype(int)), 2)
        st = StokesState.make(ni)
        st = st.replace(viscosity=st.viscosity.replace(eta=_jnp.ones(ni)))
        xv = _jnp.asarray(geometry.xvi[0])
        zv = _jnp.asarray(geometry.xvi[2])
        Vx = _jnp.broadcast_to(xv[:, None, None], (n + 1, n + 2, n + 2))
        Vy = _jnp.zeros((n + 2, n + 1, n + 2))
        Vz = _jnp.broadcast_to((-zv)[None, None, :], (n + 2, n + 2, n + 1))
        bc = VelocityBoundaryConditions(free_slip=Faces(
            left=True, right=True, top=True, bot=True,
            front=True, back=True))
        Vx, Vy, Vz = flow_bcs((Vx, Vy, Vz), bc)
        st = st.replace(V=st.V.replace(Vx=Vx, Vy=Vy, Vz=Vz))
        pt = PTStokesCoeffs.make(geometry.li, geometry.di, eps_rel=1.0e-5,
                                 eps_abs=1.0e-5,
                                 CFL=0.75 / _math.sqrt(3.1))
        args = (st, pt, geometry, bc, mat, pr.center,
                (pr.edge_yz, pr.edge_xz, pr.edge_xy), 0.25)
        kw = dict(iter_max=3000, iter_min=100, nout=100)
        out_h, info_h = solve_vep_3d(*args, use_pallas=True, **kw)
        out_x, info_x = solve_vep_3d(*args, **kw)
        scale = float(_jnp.abs(out_x.tau.II).max())
        gap = float(_jnp.abs(out_h.tau.II - out_x.tau.II).max()) / scale
        # absolute physics oracle: frozen CPU/f64 solve of this config
        # (r05, scripts/make_f64_goldens.py → tauII max 0.16069083)
        golden_f64 = 0.16069082924126105
        v = float(_jnp.abs(out_h.tau.II).max())
        rel_abs = abs(v - golden_f64) / golden_f64
        ok = bool(gap < 1e-3 and rel_abs < 2e-2
                  and np.isfinite(scale) and scale > 0)
        return {"value": v, "xla": scale,
                "rel_gap": gap, "golden_f64": golden_f64,
                "rel_vs_f64": rel_abs,
                "err": float(info_h.err), "pass": ok}

    def blob3d_pallas():
        """3D solve through solve_ve_3d(use_pallas=True) (VERDICT r03 #4):
        rising-blob coupled step, Pallas blocked kernel vs XLA on-chip."""
        from justrelax_tpu.models import rising_blob3d as m
        s_x, _, _, i_x, zc_x = m.run(n=16, nt=1)
        s_p, _, _, i_p, zc_p = m.run(n=16, nt=1, use_pallas=True)
        vref = float(np.abs(np.asarray(s_x.V.Vz)).max())
        dv = float(np.abs(np.asarray(s_p.V.Vz - s_x.V.Vz)).max())
        rel = dv / vref
        # absolute physics oracles: frozen CPU/f64 values of this config
        # (r05: zc 340668.63 m, |Vz|max 3.2058709e-9 m/s)
        golden_v_f64 = 3.2058708898361283e-09
        rel_v = abs(vref - golden_v_f64) / golden_v_f64
        ok = bool(rel < 1e-3 and rel_v < 2e-2
                  and np.isfinite(vref) and vref > 0)
        return {"value": float(zc_p[0]), "xla": float(zc_x[0]),
                "v_rel_gap": rel, "golden_v_f64": golden_v_f64,
                "rel_vs_f64": rel_v, "err": float(i_p.err), "pass": ok}

    yield "solcx_err", solcx
    yield "diffusion2d_T_mid", diffusion2d
    # flagship VEP shearband: fused center+vertex Drucker-Prager return
    # mapping + λ relaxation survive f32 on hardware, through all three
    # dispatch paths (XLA / VMEM-resident chunk / grid-blocked streaming)
    yield "shearband_vep_tauII_max", _shearband
    yield "shearband_vep_pallas_tauII_max", (
        lambda: _shearband(use_pallas=True))
    yield "shearband_vep_pallas_blocked_tauII_max", (
        lambda: _shearband(use_pallas="blocked"))
    yield "burstedde3d_vx_rel_err", burstedde
    yield "dyrel_shearband_tauII_max", dyrel
    # fast-path application goldens (r04): a coupled ρ(T)·g app through the
    # Pallas VEP chunk, and a coupled 3D step through the blocked 3D kernel
    yield "blankenbach_pallas_urms", blankenbach_pallas
    yield "blob3d_pallas_zc", blob3d_pallas
    # r05 fast path: 3D VEP through the hybrid edges kernel on-chip
    yield "vep3d_hybrid_tauII", vep3d_hybrid
    if level == "full":
        yield "elastic_buildup_rel_err", elastic_buildup


def run_goldens(level="default"):
    """Execute small solves ON THE ATTACHED BACKEND (f32 on TPU) and check
    reference goldens at f32-appropriate tolerances. Each golden is isolated:
    a failure records an error row and the rest still run."""
    out = {}
    if level == "off":
        return out
    for name, thunk in _golden_items(level):
        try:
            out[name] = thunk()
        except Exception as exc:
            out[name] = {"pass": False, "error": _err_tail(exc)}
        _progress("goldens", name, out[name])
    return out


DEFAULT_FAMILIES = (
    "ve2d,vep2d,vep2d_1024,thermal2d,thermal3d,ve3d,ve3d_canvas,vep3d,"
    "vep3d_canvas,"
    "pallas_ve2d,pallas_ve2d_blocked,pallas_ve3d_blocked,"
    "pallas_vep3d_blocked,pallas_vep3d_edges,"
    "ve3d_254,ve3d_canvas_254,pallas_ve3d_blocked_254,"
    "pallas_vep2d,pallas_vep2d_blocked,pallas_thermal2d"
)


def main():
    families = os.environ.get("BENCH_FAMILIES", DEFAULT_FAMILIES)
    families = [f for f in families.split(",") if f]
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    golden_level = os.environ.get("BENCH_GOLDENS", "default")

    try:
        os.remove(PARTIAL_PATH)
    except OSError:
        pass

    # goldens FIRST: the correctness record survives any later perf failure
    goldens = run_goldens(golden_level)

    results = {}
    preflight = {}
    for fam in families:
        try:
            results[fam] = bench_family(fam, repeats=repeats,
                                        preflight=preflight)
        except Exception as exc:
            traceback.print_exc(file=sys.stderr)
            results[fam] = {"error": _err_tail(exc)}
        _progress("families", fam, results[fam])
        if fam in preflight:
            _progress("pallas_preflight", fam, preflight[fam])

    # paired same-process A/B for the 2D VEP production dispatch (VERDICT
    # r04 #2c): the blocked-vs-XLA decision must survive its own error bars
    ab = None
    if "vep2d_1024" in families and "pallas_vep2d_blocked" in families:
        try:
            ab = paired_ab("vep2d_1024", "pallas_vep2d_blocked",
                           repeats=int(os.environ.get("BENCH_AB_REPEATS",
                                                      "5")))
        except Exception as exc:
            traceback.print_exc(file=sys.stderr)
            ab = {"error": _err_tail(exc)}
        _progress("vep2d_dispatch_ab", "vep2d_1024_vs_blocked", ab)

    ok_rows = {k: v for k, v in results.items() if "T_eff_GBs" in v}

    # Headline = the flagship iteration AT PRODUCTION GRID SIZE (1024² f32,
    # past VMEM residency) through the path solve_vep(use_pallas=True)
    # actually dispatches there — the grid-blocked streaming kernel — with
    # the XLA fallback at the same size recorded alongside ("xla_fallback").
    # The r03 bench compared vep2d@512² (VMEM-friendlier, ~0.83×) against
    # the blocked kernel@1024², which silently mixed scales.
    # "best_effective" stays: the best Pallas chunk row (effective T_eff —
    # HBM touched once per chunk/pass — may exceed HBM peak).
    prod = (ok_rows.get("pallas_vep2d_blocked") or ok_rows.get("vep2d_1024")
            or ok_rows.get("vep2d") or next(iter(ok_rows.values()), None))
    pallas_rows = {k: v for k, v in ok_rows.items() if k.startswith("pallas_")}
    best = max(pallas_rows.items(), key=lambda kv: kv[1]["T_eff_GBs"])[0] \
        if pallas_rows else None
    payload = {
        "metric": "vep2d_production_1024_fastpath_T_eff",
        "value": prod["T_eff_GBs"] if prod else None,
        "unit": "GB/s",
        "vs_baseline": prod["vs_hbm_peak"] if prod else None,
        "xla_fallback_1024": ok_rows.get("vep2d_1024"),
        "best_effective": (
            {"family": best, **results[best]} if best else None
        ),
        "vep2d_dispatch_ab": ab,
        "families": results,
        "pallas_preflight": preflight,
        "tpu_goldens": goldens,
        "goldens_all_pass": all(g["pass"] for g in goldens.values()) if goldens else None,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(payload))
    return payload


if __name__ == "__main__":
    main()
