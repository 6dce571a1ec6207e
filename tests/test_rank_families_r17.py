"""rank_multi_families (r17, r16 verdict #4): the fused multi-family
value-aggregate rank must return bit-identical values to the chained
rank_multi(bucketed="value") calls it replaces, and its plan must carry
exactly one grouping pass for all families' count frames."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parallel_pandas_spark.operators import ordered  # noqa: E402
from parallel_pandas_spark.sources import load_table  # noqa: E402

SF = "/root/testdata/sf0.001"

SPECS_Q = [
    {"method": "average", "out_col": "rank_avg"},
    {"method": "min", "out_col": "rank_min"},
    {"method": "max", "out_col": "rank_max"},
    {"method": "first", "out_col": "rank_first"},
    {"method": "dense", "out_col": "rank_dense"},
    {"method": "average", "pct": True, "out_col": "rank_pct"},
]
SPECS_VQ = [
    {"method": "min", "na_option": "top", "out_col": "rank_na_top"},
    {"method": "average", "na_option": "bottom", "pct": True,
     "out_col": "rank_na_bottom"},
]


def _frame(spark):
    from pyspark.sql import functions as F

    li = load_table(spark, SF, "lineitem")
    return li.withColumn(
        "vq", F.when(F.col("l_quantity") < 40, F.col("l_quantity"))
    )


def test_fused_families_equal_chained(spark):
    kw = dict(
        partition_by=["l_returnflag"],
        tie_break=["l_orderkey", "l_linenumber"],
    )
    r = _frame(spark)
    a = ordered.rank_multi(r, "l_quantity", SPECS_Q, bucketed="value", **kw)
    a = ordered.rank_multi(a, "vq", SPECS_VQ, bucketed="value", **kw)
    b = ordered.rank_multi_families(
        r,
        [{"col": "l_quantity", "specs": SPECS_Q},
         {"col": "vq", "specs": SPECS_VQ}],
        **kw,
    )
    cols = ["l_orderkey", "l_linenumber"] + [
        s["out_col"] for s in SPECS_Q + SPECS_VQ
    ]
    ra = sorted(tuple(x) for x in a.select(cols).collect())
    rb = sorted(tuple(x) for x in b.select(cols).collect())
    assert ra == rb  # bit-exact: same integers, same FP derivations


def test_fused_families_single_grouping_pass(spark):
    """The fused plan's data side scans the input exactly once and joins
    the (lazily checkpointed) offset tables above it — no grouping pass
    or scan replay hangs below either family's join. The count frames
    come from one shared grouping-sets materialization (row equality
    with the chained calls pins its correctness)."""
    b = ordered.rank_multi_families(
        _frame(spark),
        [{"col": "l_quantity", "specs": SPECS_Q},
         {"col": "vq", "specs": SPECS_VQ}],
        partition_by=["l_returnflag"],
        tie_break=["l_orderkey", "l_linenumber"],
    )
    plan = b._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1
    assert plan.count("Expand") == 0


def test_fused_families_global_rank_no_keys(spark):
    """partition_by=None: global ranks, same equality contract."""
    r = _frame(spark)
    a = ordered.rank_multi(
        r, "l_quantity", SPECS_Q, bucketed="value",
        tie_break=["l_orderkey", "l_linenumber"],
    )
    a = ordered.rank_multi(
        a, "vq", SPECS_VQ, bucketed="value",
        tie_break=["l_orderkey", "l_linenumber"],
    )
    b = ordered.rank_multi_families(
        r,
        [{"col": "l_quantity", "specs": SPECS_Q},
         {"col": "vq", "specs": SPECS_VQ}],
        tie_break=["l_orderkey", "l_linenumber"],
    )
    cols = ["l_orderkey", "l_linenumber"] + [
        s["out_col"] for s in SPECS_Q + SPECS_VQ
    ]
    ra = sorted(tuple(x) for x in a.select(cols).collect())
    rb = sorted(tuple(x) for x in b.select(cols).collect())
    assert ra == rb
