"""Merge N full bench.py records into the committed local anchor
(BENCH_local_r{N}.json): per-query MIN across runs for headline and
extended, totals recomputed from the merged minima, calibration = min
across runs (the session's best effective speed, consistent with the
per-query minima it normalizes).

Usage: python tools/merge_bench_runs.py OUT run1.out [run2.out ...]
Each run file's FIRST line must be the full bench.py summary JSON.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    out_path, *run_paths = sys.argv[1:]
    runs = []
    for p in run_paths:
        with open(p) as f:
            runs.append(json.loads(f.readline()))
    base = runs[0]

    def merged(field: str, reps_field: str):
        names = set()
        for r in runs:
            names |= set(r.get(field, {}))
        q, reps = {}, {}
        for n in sorted(names):
            best, best_reps = None, None
            for r in runs:
                v = r.get(field, {}).get(n)
                if v is not None and (best is None or v < best):
                    best, best_reps = v, r.get(reps_field, {}).get(n)
            q[n] = best
            if best_reps is not None:
                reps[n] = best_reps
        return q, reps

    queries, reps = merged("queries", "reps")
    extended, ext_reps = merged("extended", "extended_reps")
    rec = {
        "metric": "headline_total",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "reps": reps,
        "extended": extended,
        "extended_reps": ext_reps,
        "extended_total": round(sum(extended.values()), 3),
        "regressions_vs_baseline": {},
        "calibration": min(r["calibration"] for r in runs if "calibration" in r),
        # r14: the streaming probe's min rides along so stream_* floors
        # normalize by micro-batch speed, not scan speed (bench.py ask #3)
        "calibration_streaming": min(
            (r["calibration_streaming"] for r in runs
             if "calibration_streaming" in r),
            default=None,
        ),
        "sf": base.get("sf", 0.1),
        "note": (
            f"min-of-{len(runs)} idle-box runs; per-query min, totals "
            "recomputed from merged minima; calibration = min across runs "
            "(r12 verdict ask #2: normalization anchor)"
        ),
        "run_totals": [
            {
                "headline": r.get("value"),
                "extended": r.get("extended_total"),
                "calibration": r.get("calibration"),
                "calibration_streaming": r.get("calibration_streaming"),
            }
            for r in runs
        ],
    }
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
        f.write("\n")
    print(
        json.dumps(
            {
                "headline": rec["value"],
                "extended": rec["extended_total"],
                "calibration": rec["calibration"],
                "runs": rec["run_totals"],
            }
        )
    )


if __name__ == "__main__":
    main()
