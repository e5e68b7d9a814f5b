"""On-chip measurement: grid-blocked streaming VEP vs the XLA streaming path
at production size (1024² f32) on the attached v5e.

This is the dispatch-gate measurement VERDICT r03 #2 asks for: the blocked
kernel becomes the `use_pallas=True` default past VMEM residency only with a
recorded win here (see docs/performance.md, blocked-VEP measurement history).
Prints one JSON line per row, incrementally.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

from bench import bench_family  # noqa: E402


def main():
    n = 1024
    preflight = {}
    rows = {}
    for fam, kw in [
        ("vep2d", {"n": n}),
        ("pallas_vep2d_blocked", {"n": n}),
        # candidate alternates if the auto config loses: smaller k trades
        # halo-redundancy for live-range pressure
        ("pallas_vep2d_blocked@k4", {"n": n, "iters_per_pass": 4}),
    ]:
        base = fam.split("@")[0]
        try:
            rows[fam] = bench_family(base, factory_kwargs=kw, repeats=3,
                                     preflight=preflight)
            if base in preflight:
                rows[fam]["preflight"] = preflight.pop(base)
        except Exception as exc:
            rows[fam] = {"error": f"{type(exc).__name__}: {exc}"[-900:]}
            if base in preflight:
                rows[fam]["preflight"] = preflight.pop(base)
        print(json.dumps({fam: rows[fam]}), flush=True)
    print(json.dumps({"all": rows}), flush=True)


if __name__ == "__main__":
    main()
