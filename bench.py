"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Headline set mirrors the reference's published benchmarks (BASELINE.md):
grouped aggregation, z-score normalize, nunique, rolling mean, regex
extract, grouped UDF transform — plus the engine's scale extensions
(dedup, similarity) so regressions there are visible per round.

SPARK_GRAFT_PROGRESS=1 shows per-query live task progress (the
reference's signature tqdm UX, progress_imap.py:143-221) via
ProgressTracker — driver-side status polling only, so it costs nothing on
the executors; stderr, so the JSON line on stdout stays machine-parsable.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline queries: name -> queries() key. One representative per operator
# family so per-round regressions anywhere are visible.
HEADLINE = [
    "q1_pricing_summary",
    "stats_battery",
    "zscore_normalize",
    "corr_pearson",
    "groupby_agg_spec",
    "groupby_transform_zscore",
    "groupby_apply_demean",
    "pivot_battery",
    "rolling_moments_battery",
    "rolling_shapes_battery",
    "ordered_battery",
    "merge_battery",
    "ewm_battery",
    "chunk_split_by_col",
    "str_battery",
    "minhash_dedup_pairs",
    "cosine_topk",
    "text_doc_battery",
    "event_windows_battery",
    "corpus_build_pipeline",
]


def main() -> None:
    import __spark_entry__ as entrymod
    from parallel_pandas_spark.session import get_spark

    spark = get_spark(app_name="pps-bench")
    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs]
    # warm up EVERY headline query once at the smallest SF (one-time
    # Janino codegen / catalyst analysis / python-worker forks), then once
    # at the target SF (page cache, JIT tiering on the real data volume),
    # so timings reflect the steady state a resident cluster actually
    # runs at (the reference's baseline numbers are steady-state loops
    # too)
    for name in names:
        qs[name](spark, "/root/testdata/sf0.001").count()
    for name in names:
        qs[name](spark, SF_DIR).count()

    progress = os.environ.get("SPARK_GRAFT_PROGRESS", "") not in ("", "0")

    def _run(name: str) -> int:
        df = qs[name](spark, SF_DIR)
        if not progress:
            return df.count()
        from parallel_pandas_spark.progress import ProgressTracker

        def sink(done: int, active: int, total: int) -> None:
            print(f"\r{name}: {done}/{total} tasks ({active} running)",
                  end="", file=sys.stderr, flush=True)

        with ProgressTracker(spark, sink=sink):
            n = df.count()
        print(file=sys.stderr)
        return n

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        n = _run(name)  # force full execution
        timings[name] = round(time.perf_counter() - t0, 4)
        assert n >= 0
    total = round(sum(timings.values()), 4)
    try:
        sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = None
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
