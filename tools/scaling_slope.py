"""Scaling-slope measurement: run the headline bench at several scale
factors and fit a per-query power-law exponent.

slope = d log(t) / d log(sf), least-squares over the measured points.
slope ~= 1.0 -> linear scaling (perfect for a fixed-resource node);
slope < 1 -> fixed overhead still amortizing; slope > ~1.2 -> something
super-linear (spill, single-task stage, quadratic candidate set) —
root-cause it.

Usage: python tools/scaling_slope.py [out.json]
Writes the combined per-sf timings + fitted slopes as ONE json file and
prints a markdown table for SCALE.md.
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SFS = [
    (0.01, "/root/testdata/sf0.01"),
    (0.1, "/root/testdata/sf0.1"),
    (1.0, os.path.join(REPO, "localdata/sf1")),
]


def run_bench(sf_dir: str, reps: int) -> dict:
    # arms are skipped: slopes fit the headline medians, and the arm
    # pass would triple the sf1 leg for numbers the fit never reads
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_REPS=str(reps),
        SPARK_GRAFT_ARMS="0",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, cwd=REPO, check=True,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def fit_slope(xs: list[float], ys: list[float]) -> float:
    lx = [math.log10(x) for x in xs]
    ly = [math.log10(y) for y in ys]
    n = len(lx)
    mx, my = sum(lx) / n, sum(ly) / n
    num = sum((a - mx) * (b - my) for a, b in zip(lx, ly))
    den = sum((a - mx) ** 2 for a in lx)
    return num / den


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "BENCH_SCALING.json")
    # r9 (verdict #6): legs are median-of-3 like the headline bench —
    # per-leg reps recorded in each leg's "reps"/"queries_runs". The sf1
    # leg defaults to 3 too; SPARK_GRAFT_SF1_REPS=1 trades noise
    # rejection for wall time when cost demands (the output says which).
    sf1_reps = max(1, int(os.environ.get("SPARK_GRAFT_SF1_REPS", "3")))
    runs = {}
    for sf, d in SFS:
        if not os.path.isdir(d):
            print(f"skip sf{sf}: {d} missing (generate with tools/gen_sf.py)")
            continue
        reps = sf1_reps if sf >= 1.0 else 3
        print(f"running bench at sf{sf} (reps={reps}) ...", flush=True)
        runs[str(sf)] = run_bench(d, reps)
        print(f"  total {runs[str(sf)]['value']} s")

    sfs = sorted(float(s) for s in runs)
    queries = list(runs[str(sfs[0])]["queries"])
    slopes = {}
    for q in queries:
        xs = [sf for sf in sfs if q in runs[str(sf)]["queries"]]
        ys = [runs[str(sf)]["queries"][q] for sf in xs]
        slopes[q] = round(fit_slope(xs, ys), 3)
    totals = {str(sf): runs[str(sf)]["value"] for sf in sfs}
    slopes["__total__"] = round(fit_slope(sfs, [totals[str(s)] for s in sfs]), 3)

    try:
        head = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, cwd=REPO,
        ).stdout.strip()
    except OSError:
        head = None
    with open(out_path, "w") as f:
        json.dump({
            "runs": runs, "slopes": slopes,
            "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
            "git_head": head,
        }, f, indent=1)

    hdr = "| query | " + " | ".join(f"sf{s} (s)" for s in sfs) + " | slope |"
    print(hdr)
    print("|" + "---|" * (len(sfs) + 2))
    for q in sorted(queries, key=lambda q: -slopes[q]):
        cells = " | ".join(f"{runs[str(s)]['queries'][q]:.2f}" for s in sfs)
        print(f"| {q} | {cells} | {slopes[q]:.2f} |")
    cells = " | ".join(f"{totals[str(s)]:.2f}" for s in sfs)
    print(f"| **total** | {cells} | {slopes['__total__']:.2f} |")


if __name__ == "__main__":
    main()
