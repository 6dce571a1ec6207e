"""global_avg_rank must equal the single-task window rank exactly —
including under plans that evaluate the bucketed frame more than once
(the failure mode that motivated value-deterministic buckets)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F  # noqa: E402

from parallel_pandas_spark.operators import ordered  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_global_avg_rank_matches_window(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_quantity", "l_extendedprice")
    g = ordered.global_avg_rank(li, "l_quantity", out_col="gr")
    # chain a second rank so the first plan is re-evaluated inside a more
    # complex tree (the regression shape)
    g = ordered.global_avg_rank(g, "l_extendedprice", out_col="gp")

    w = Window.orderBy("l_quantity")
    wp = Window.partitionBy("l_quantity")
    w2 = Window.orderBy("l_extendedprice")
    wp2 = Window.partitionBy("l_extendedprice")
    ref = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_quantity", "l_extendedprice")
        .withColumn("rr", F.rank().over(w) + (F.count("*").over(wp) - 1) / 2.0)
        .withColumn("rp", F.rank().over(w2) + (F.count("*").over(wp2) - 1) / 2.0)
    )

    got = {
        (r["l_quantity"], r["l_extendedprice"]): (r["gr"], r["gp"])
        for r in g.groupBy("l_quantity", "l_extendedprice")
        .agg(F.min("gr").alias("gr"), F.min("gp").alias("gp"))
        .collect()
    }
    want = {
        (r["l_quantity"], r["l_extendedprice"]): (r["rr"], r["rp"])
        for r in ref.groupBy("l_quantity", "l_extendedprice")
        .agg(F.min("rr").alias("rr"), F.min("rp").alias("rp"))
        .collect()
    }
    assert got == want
    # rank sums are the exact triangular numbers
    n = li.count()
    tot = g.agg(F.sum("gr").alias("a"), F.sum("gp").alias("b")).collect()[0]
    assert tot["a"] == n * (n + 1) / 2
    assert tot["b"] == n * (n + 1) / 2
