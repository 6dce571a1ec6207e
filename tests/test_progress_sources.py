"""Progress accounting + source round-trips (reference analogues:
test_progress_logger.py, and the implicit pd.read_csv/read_json entry
points the reference delegates to callers)."""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from parallel_pandas_spark import progress  # noqa: E402
from parallel_pandas_spark.sources import from_pandas, read_csv, read_json  # noqa: E402


def test_progress_tracker_observes_job(spark):
    events = []

    def slow(batches):
        import time

        for pdf in batches:
            time.sleep(0.2)
            yield pdf

    with progress.ProgressTracker(
        spark, interval=0.05, sink=lambda d, a, t: events.append((d, a, t))
    ):
        n = (
            spark.range(16, numPartitions=16)
            .mapInPandas(slow, "id long")
            .count()
        )
        assert n == 16
    assert events, "tracker saw no stage activity during a 16-task job"
    # the last sample may be the tiny job-finalize stage; the 16-task map
    # stage must appear somewhere in the trace
    assert max(t for _, _, t in events) >= 16
    assert all(0 <= d <= t for d, _, t in events)


def test_count_rows_accumulator(spark):
    acc = spark.sparkContext.accumulator(0)
    df = spark.range(10_000, numPartitions=4)
    out = progress.count_rows(df, acc)
    assert out.count() == 10_000
    assert acc.value == 10_000


def test_from_pandas_roundtrip(spark):
    pdf = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", None], "c": [1.5, None, 3.0]})
    df = from_pandas(spark, pdf)
    back = df.orderBy("a").toPandas()
    assert list(back["a"]) == [1, 2, 3]
    assert back["b"][2] is None or pd.isna(back["b"][2])


def test_csv_json_roundtrip(spark, tmp_path):
    pdf = pd.DataFrame({"k": [1, 2, 3], "v": ["a", "b", "c"], "x": [0.5, 1.5, 2.5]})
    csv_path = str(tmp_path / "t.csv")
    json_path = str(tmp_path / "t.json")
    pdf.to_csv(csv_path, index=False)
    pdf.to_json(json_path, orient="records", lines=True)

    c = read_csv(spark, csv_path)
    assert c.count() == 3
    assert {r["k"] for r in c.collect()} == {1, 2, 3}

    j = read_json(spark, json_path)
    assert j.count() == 3
    assert {r["v"] for r in j.collect()} == {"a", "b", "c"}


def test_parallel_frame_progress_action(spark):
    """ParallelFrame.initialize(progress_bar=True) routes terminal actions
    through ProgressTracker (reference initialize() UX, main.py:58-267)."""
    from parallel_pandas_spark.api import ParallelFrame

    pf = ParallelFrame(spark.range(100).withColumn("x", F.col("id") * 2))
    try:
        ParallelFrame.initialize(progress_bar=True)
        assert pf.count() == 100
        assert len(pf.collect()) == 100
    finally:
        ParallelFrame.initialize(progress_bar=False)
    assert pf.count() == 100
