"""bucket_write: persisting bucketed by join key must let a repeated
self-join/aggregation on that key plan WITHOUT a shuffle exchange — the
100 TB answer to 'this join shuffles every night' (joins.py docstring)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from parallel_pandas_spark.operators import joins  # noqa: E402


def test_bucketed_join_skips_exchange(spark, sf_small):
    orders = spark.read.parquet(f"{sf_small}/orders.parquet")
    table = "t_orders_bucketed"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        joins.bucket_write(
            orders.select("o_orderkey", "o_custkey", "o_totalprice"),
            table,
            keys=["o_custkey"],
            num_buckets=8,
        )
        b = spark.table(table)
        agg = b.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("s"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed agg still shuffles:\n{plan}"

        # values identical to the unbucketed plan
        got = {r["o_custkey"]: round(r["s"], 6) for r in agg.collect()}
        want = {
            r["o_custkey"]: round(r["s"], 6)
            for r in orders.groupBy("o_custkey")
            .agg(F.sum("o_totalprice").alias("s"))
            .collect()
        }
        assert got == want
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
