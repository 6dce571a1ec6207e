"""Interleaved same-process A/B of battery composition: sequential arm
builders (old _compose_union) vs overlap_eager threaded builders (new).
Both variants are constructed from the SAME __arms__ functions, so the
only difference is the composition — the measurement discipline the r16
sessions used for every perf claim (cross-run bench deltas carry host
noise; interleaved in-process medians reject it).

Usage: python tools/ab_overlap.py <battery[,battery...]> [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1].split(",")
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    import __spark_entry__ as entry
    from bench import _force
    from parallel_pandas_spark.session import get_spark

    spark = get_spark(app_name="pps-ab-overlap")
    qs = entry.queries()

    def seq_variant(arms):
        def fn(sf_dir):
            return entry._pad_union([(t, f(spark, sf_dir)) for t, f in arms])
        return fn

    for name in names:
        new_fn = qs[name]
        old_fn = seq_variant(new_fn.__arms__)
        variants = [("seq", lambda sf: old_fn(sf)), ("ovl", lambda sf: new_fn(spark, sf))]
        # warm both at the small SF then the target SF
        for _, v in variants:
            _force(v("/root/testdata/sf0.001"))
            _force(v(SF_DIR))
        runs: dict[str, list[float]] = {"seq": [], "ovl": []}
        for _ in range(reps):
            for tag, v in variants:
                t0 = time.perf_counter()
                _force(v(SF_DIR))
                runs[tag].append(round(time.perf_counter() - t0, 3))
        for tag in ("seq", "ovl"):
            print(
                f"{name} {tag}: median={statistics.median(runs[tag]):.3f}s "
                f"runs={runs[tag]}"
            )


if __name__ == "__main__":
    main()
