"""On-chip cost bisect for the 3D VEP iteration (the weakest bench row:
141.5 GB/s = 0.17x HBM peak at 126^3 f32, stream_frac 0.15).

The iteration's flop count (144/cell, cost_analysis) is only ~2x the 2D
VEP's, yet per-cell time is ~8.6x — so the cost is NOT arithmetic; it is
XLA materializing interpolation intermediates between the mixed-shape
passes (achieved traffic ~1644 B/cell vs the 284 B/cell convention).
This probe times the SAME iteration frame with the fused stress update's
passes selectively degenerated to passthroughs (ops/stokes3d_vep.py
``probe_passes``), isolating where the time goes:

  full         — the shipping iteration (control)
  center_only  — 3 edge return-mapping passes removed
  edges_only   — center return-mapping pass removed
  frame        — both removed: maxloc + P + strain rate + viscosity + V

Prints one JSON line per row, incrementally; safe to kill.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

from bench import bench_family  # noqa: E402


def main():
    for tag, probe in [
        ("full", None),
        ("center_only", ("center",)),
        ("edges_only", ("edges",)),
        ("frame", ()),
    ]:
        try:
            row = bench_family(
                "vep3d", factory_kwargs={"probe_passes": probe}, repeats=3
            )
        except Exception as exc:
            row = {"error": f"{type(exc).__name__}: {exc}"[-900:]}
        print(json.dumps({tag: row}), flush=True)


if __name__ == "__main__":
    main()
