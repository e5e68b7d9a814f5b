"""On-chip config sweep for the grid-blocked streaming VEP kernel at 1024².

Round-4 follow-up to the dispatch-gate measurement (docs/performance.md,
blocked-VEP measurement history): the auto config R=120/k=8 wins by 1.9%
over XLA; this sweep probes the remaining feasible (R, k) corners under the
calibrated 90·W spill model. H = 2k must be a multiple of 8, W = R + 2H
must satisfy 133·W·1152·4 ≤ 100 MB → W ≤ 171 at 1024² f32:

  k=8,  R=120, W=152  — the shipping auto config (re-measured as control)
  k=8,  R=96,  W=128  — smaller halo fraction per block (W/R = 1.33)
  k=12, R=96,  W=144  — deeper temporal reuse, more redundant halo compute
  k=4,  R=136, W=152  — shallow-reuse control (r04: k=4/R=120 lost at 492)

Prints one JSON line per row, incrementally; safe to kill.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

from bench import bench_family  # noqa: E402


def main():
    n = 1024
    preflight = {}
    for tag, kw in [
        ("xla_vep2d", {"n": n}),
        ("blocked_R120_k8", {"n": n, "row_block": 120, "iters_per_pass": 8}),
        ("blocked_R96_k8", {"n": n, "row_block": 96, "iters_per_pass": 8}),
        ("blocked_R96_k12", {"n": n, "row_block": 96, "iters_per_pass": 12}),
        ("blocked_R136_k4", {"n": n, "row_block": 136, "iters_per_pass": 4}),
    ]:
        base = "vep2d" if tag.startswith("xla") else "pallas_vep2d_blocked"
        try:
            row = bench_family(base, factory_kwargs=kw, repeats=3,
                               preflight=preflight)
            if base in preflight:
                row["preflight"] = preflight.pop(base)
        except Exception as exc:
            row = {"error": f"{type(exc).__name__}: {exc}"[-900:]}
            if base in preflight:
                row["preflight"] = preflight.pop(base)
        print(json.dumps({tag: row}), flush=True)


if __name__ == "__main__":
    main()
