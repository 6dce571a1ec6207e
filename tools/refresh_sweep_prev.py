"""Refresh SWEEP_PREV.json from a completed sweep artifact — the sweep
twin of bench.py's BENCH_PREV.json refresh. Run at close-out AFTER the
certified sf1 sweep so next round's oracle_sweep stamps its
sentinel_factor against this round.

Usage: python tools/refresh_sweep_prev.py localdata/sweep_sf1.json <round>
"""

from __future__ import annotations

import json
import os
import sys


def main() -> None:
    src_path, rnd = sys.argv[1], int(sys.argv[2])
    with open(src_path) as fh:
        src = json.load(fh)
    out = {
        "round": rnd,
        "sf_dir": src["sf_dir"],
        "git_head": src.get("git_head"),
        "note": (
            "per-query SPARK-side seconds from the prior round's sf1 "
            "sweep; oracle_sweep.py's sentinel_factor normalizes "
            "against this"
        ),
        "queries": {
            n: r["spark_sec"]
            for n, r in src["results"].items()
            if r.get("spark_sec")
        },
    }
    dst = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SWEEP_PREV.json")
    with open(dst, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"SWEEP_PREV.json <- {src_path} ({len(out['queries'])} queries, "
          f"round {rnd})")


if __name__ == "__main__":
    main()
