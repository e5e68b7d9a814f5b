"""On-chip sweep of the 3D VE canvas iteration variants at 126³ f32.

Round-4 follow-up to the 3D dispatch measurement (docs/performance.md, "VE
3D measurement record"): the precomputed-coefficient canvas runs 490 µs/iter
(0.70× HBM peak); its actual traffic is 10 carry canvases ×2 + 11
coefficient canvases ×1 ≈ 260 MB → 318 µs at wire speed, so there is both a
traffic lever (lean consts: stream η/ητ/fz only, re-derive coefficients in
the loop body behind the anti-LICM carry scalar — 193 MB → 236 µs ideal)
and a fusion lever (roll lowers to concatenate; slice lowers to pad — they
fuse differently on XLA:TPU). Variants are bitwise-identical in results
(tests/test_stokes3d_canvas.py).

Prints one JSON line per row, incrementally; safe to kill.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

from bench import bench_family  # noqa: E402


def main():
    preflight = {}
    for tag, kw in [
        ("canvas_roll_precomputed", {}),              # shipping control
        ("canvas_roll_lean", {"lean": True}),
        ("canvas_slice_precomputed", {"shift": "slice"}),
        ("canvas_slice_lean", {"lean": True, "shift": "slice"}),
    ]:
        try:
            row = bench_family("ve3d_canvas", factory_kwargs=kw, repeats=3,
                               preflight=preflight)
        except Exception as exc:
            row = {"error": f"{type(exc).__name__}: {exc}"[-900:]}
        print(json.dumps({tag: row}), flush=True)


if __name__ == "__main__":
    main()
