"""Interleaved same-process A/B of the r17 kendall kernel (928edd4):
old kernel (928edd4~1, separate tie-count shuffle + re-read of the
checkpointed frame) vs new (tie counts folded into the single sorted
pass). Usage: python tools/ab_kendall_r17.py [pairs] [old_path]
— old_path defaults to extracting 928edd4~1:.../kendall.py via git.
Both variants are built fresh from parquet every iteration and forced
through the noop sink (guide §1.4); pairs interleave old/new to cancel
host drift.
"""

from __future__ import annotations

import importlib.util
import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    old_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/kendall_old_r17.py"
    if not os.path.exists(old_path):
        src = subprocess.run(
            ["git", "show", "928edd4~1:parallel_pandas_spark/operators/kendall.py"],
            capture_output=True, text=True, cwd=REPO, check=True,
        ).stdout
        with open(old_path, "w") as fh:
            fh.write(src)

    spec = importlib.util.spec_from_file_location("kendall_old", old_path)
    old = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(old)

    from pyspark.sql import functions as F

    from parallel_pandas_spark.operators import kendall as new
    from parallel_pandas_spark.session import get_spark

    spark = get_spark(app_name="pps-ab-kendall-r17")

    def frame():
        o = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
        return o.select(
            F.col("o_totalprice").cast("double").alias("x"),
            F.year("o_orderdate").cast("double").alias("y"),
        )

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    def run(mod):
        t0 = time.perf_counter()
        force(mod.kendall_tau_exact(frame(), "x", "y", num_buckets=64))
        return round(time.perf_counter() - t0, 4)

    # warm both once
    run(old), run(new)
    olds, news = [], []
    for _ in range(pairs):
        olds.append(run(old))
        news.append(run(new))
    # value identity on the final pair
    ro = old.kendall_tau_exact(frame(), "x", "y", num_buckets=64).collect()
    rn = new.kendall_tau_exact(frame(), "x", "y", num_buckets=64).collect()
    same = [r.asDict() for r in ro] == [r.asDict() for r in rn]
    out = {
        "old_runs": olds, "new_runs": news,
        "old_median": round(statistics.median(olds), 4),
        "new_median": round(statistics.median(news), 4),
        "rows_identical": same,
        "sf_dir": SF_DIR,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
