"""Round-16 surface: the baseline-twin operators (r15 verdict #2) and
their battery arms.

- ``reductions.quantile_axis1`` — row-wise quantile (pandas
  ``df.quantile(q, axis=1)``, linear interpolation, per-row NaN skip):
  the reference README's HEADLINE 1M x 100 benchmark shape, now a
  first-class JVM operator (one filtered array_sort per row, zero
  shuffle) pinned against pandas and registered as
  stats_quantile_describe:rowq.
- ``windows.rolling_global`` — exact UNPARTITIONED rolling without the
  single-reducer ``Window.orderBy`` collapse: dense-integer range
  buckets + (window-1)-row context replication, bit-equal to the
  single-partition window, registered as
  rolling_shapes_battery:globalroll. The plan must hash-exchange on the
  bucket id (parallel), not sort globally.
- ``reductions.zscore_normalize`` wide-frame safety: the projection is
  ONE select (a 1000-column withColumn tower made Catalyst analysis the
  bottleneck at the reference's own benchmark shape).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from parallel_pandas_spark.operators import reductions as red  # noqa: E402
from parallel_pandas_spark.operators import windows as W  # noqa: E402


@pytest.fixture(scope="module")
def frame(spark):
    rng = np.random.default_rng(7)
    pdf = pd.DataFrame({
        "idx": np.arange(3001),
        "a": rng.standard_normal(3001),
        "b": rng.standard_normal(3001),
        "c": rng.standard_normal(3001),
        "d": rng.standard_normal(3001),
    })
    pdf.loc[10:40, "b"] = np.nan
    return pdf, spark.createDataFrame(pdf)


def test_quantile_axis1_matches_pandas(frame):
    pdf, df = frame
    got = (
        red.quantile_axis1(df, ["a", "b", "c", "d"], [0.25, 0.5, 0.95],
                           keep=("idx",))
        .orderBy("idx").toPandas()
    )
    want = pdf[["a", "b", "c", "d"]].quantile([0.25, 0.5, 0.95], axis=1).T
    for q, col in [(0.25, "q_25"), (0.5, "q_50"), (0.95, "q_95")]:
        diff = np.nanmax(np.abs(got[col].to_numpy() - want[q].to_numpy()))
        assert diff < 1e-12, (col, diff)


def test_quantile_axis1_all_nan_row_is_null(spark):
    df = spark.createDataFrame(
        [(0, float("nan"), None)], "idx long, a double, b double"
    )
    row = red.quantile_axis1(df, ["a", "b"], [0.5], keep=("idx",)).first()
    assert row["q_50"] is None


def test_rolling_global_bit_equals_single_partition(spark, frame):
    pdf, df = frame
    g = W.rolling_global(df, ["a", "b"], 25, "idx",
                         funcs=("mean", "sum", "count"), buckets=8)
    s = W.rolling(df, ["a", "b"], 25, ["idx"],
                  funcs=("mean", "sum", "count"))
    cols = [f"{c}_roll_{fn}" for c in ("a", "b")
            for fn in ("mean", "sum", "count")]
    gp = g.orderBy("idx").toPandas()
    sp = s.orderBy("idx").toPandas()
    for c in cols:
        assert (gp[c].fillna(-9e99) == sp[c].fillna(-9e99)).all(), c
    # pandas parity spot-check (float tolerance: summation order differs)
    want = pdf["a"].rolling(25).mean().to_numpy()
    diff = np.nanmax(np.abs(gp["a_roll_mean"].to_numpy() - want))
    assert diff < 1e-10, diff
    assert gp["a_roll_mean"].isna().to_numpy()[:24].all()


def test_rolling_global_plan_is_parallel_not_single_sort(spark, frame):
    _pdf, df = frame
    g = W.rolling_global(df, ["a"], 25, "idx", buckets=8)
    plan = g._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(__bkt" in plan, plan
    # no global single-partition sort anywhere in the plan
    assert "SinglePartition" not in plan.replace(
        "Exchange SinglePartition", "", 0), plan


def test_rolling_global_refuses_sparse_index(spark, frame):
    _pdf, df = frame
    with pytest.raises(ValueError, match="dense integer"):
        W.rolling_global(df.where(F.col("idx") % 2 == 0), ["a"], 10, "idx")


def test_zscore_normalize_still_exact(spark, frame):
    pdf, df = frame
    got = (
        red.zscore_normalize(df.select("idx", "a", "c"), ["a", "c"])
        .orderBy("idx").toPandas()
    )
    want = (pdf[["a", "c"]] - pdf[["a", "c"]].mean()) / pdf[["a", "c"]].std()
    for c in ("a", "c"):
        diff = np.nanmax(np.abs(got[c].to_numpy() - want[c].to_numpy()))
        assert diff < 1e-12, (c, diff)
    assert list(got.columns) == ["idx", "a", "c"]  # column order preserved


def test_r16_arms_registered_not_new_entries():
    import __spark_entry__ as em

    qs = em.queries()
    assert len(qs) == 50
    for gone in ("row_quantile_arm", "global_rolling_arm",
                 "corpus_livepost_arm"):
        assert gone not in qs
    assert [t for t, _ in qs["stats_quantile_describe"].__arms__] == [
        "describe", "quantile", "custom", "interp", "rowq"]
    assert [t for t, _ in qs["rolling_shapes_battery"].__arms__] == [
        "time", "rankskewcov", "apply", "globalroll"]
    assert [t for t, _ in qs["corpus_build_pipeline"].__arms__] == [
        "build", "incremental", "livepost"]
