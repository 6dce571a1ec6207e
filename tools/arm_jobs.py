"""Jobs-per-arm probe for driver-fed ANN chains (r16 verdict #5): for
each named cosine arm, count the Spark jobs issued while the builder
runs (train/encode/LUT/store-load collects) and while the noop sink
forces the result, with wall time for each phase. Median-of-reps wall
times; job counts are from the LAST rep (steady state — first rep may
include one-time store builds).

Usage: python tools/arm_jobs.py [arm,arm,...] [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

ARMS = {
    "pq": "cosine_pq_topk_query",
    "ivfpq": "cosine_ivfpq_topk_query",
    "opq": "cosine_opq_topk_query",
}


def main() -> None:
    names = sys.argv[1].split(",") if len(sys.argv) > 1 else list(ARMS)
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import __spark_entry__ as entry
    from bench import _force
    from parallel_pandas_spark.session import get_spark

    spark = get_spark(app_name="pps-arm-jobs")
    tracker = spark.sparkContext.statusTracker()

    def job_count() -> int:
        return len(tracker.getJobIdsForGroup(None) or [])

    # warm: builds stores, forks python workers, JITs codegen
    for name in names:
        _force(getattr(entry, ARMS[name])(spark, SF_DIR))

    for name in names:
        builds, forces = [], []
        bj = fj = 0
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"armjobs:{name}:build")
            j0 = job_count()
            t0 = time.perf_counter()
            df = getattr(entry, ARMS[name])(spark, SF_DIR)
            builds.append(time.perf_counter() - t0)
            j1 = job_count()
            spark.sparkContext.setJobDescription(f"armjobs:{name}:force")
            t0 = time.perf_counter()
            _force(df)
            forces.append(time.perf_counter() - t0)
            j2 = job_count()
            bj, fj = j1 - j0, j2 - j1
        print(
            f"ARM {name}: build jobs={bj} "
            f"sec={statistics.median(builds):.3f} | "
            f"force jobs={fj} sec={statistics.median(forces):.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
