"""Split each headline query's wall time into CONSTRUCT (the queries()
builder call — where eager driver-fed protocol work lives: store builds,
streaming lifecycles, collects) vs FORCE (the noop-sink evaluation of the
returned plan). Guides where §2.6 job-overlap pays vs where plan work
pays. Usage: python tools/profile_split.py [out_json] [only_csv]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "localdata/profile_split.json"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None

    import __spark_entry__ as entrymod
    from bench import HEADLINE, _force
    from parallel_pandas_spark.session import get_spark

    spark = get_spark(app_name="pps-profile-split")
    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs and (only is None or n in only)]
    for name in names:  # warm-up, same discipline as bench.py
        _force(qs[name](spark, "/root/testdata/sf0.001"))
    for name in names:
        _force(qs[name](spark, SF_DIR))

    reps = max(1, int(os.environ.get("SPARK_GRAFT_REPS", "3")))
    runs: dict[str, dict[str, list[float]]] = {
        n: {"construct": [], "force": []} for n in names
    }
    for _ in range(reps):
        for name in names:
            t0 = time.perf_counter()
            df = qs[name](spark, SF_DIR)
            t1 = time.perf_counter()
            _force(df)
            t2 = time.perf_counter()
            runs[name]["construct"].append(round(t1 - t0, 4))
            runs[name]["force"].append(round(t2 - t1, 4))
    summary = {
        n: {
            "construct": round(statistics.median(r["construct"]), 4),
            "force": round(statistics.median(r["force"]), 4),
            "runs": r,
        }
        for n, r in runs.items()
    }
    os.makedirs(os.path.dirname(out_json) or ".", exist_ok=True)
    with open(out_json, "w") as fh:
        json.dump(summary, fh, indent=1)
    for n, s in summary.items():
        print(f"{n:32s} construct={s['construct']:8.3f}  force={s['force']:8.3f}")


if __name__ == "__main__":
    main()
