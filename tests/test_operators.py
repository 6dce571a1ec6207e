"""Operator unit battery — reference test-strategy style (SURVEY.md §5:
differential vs a known-good computation on small frames), covering the
parameter variants the registered queries don't exercise: merge how
variants, callable transform, descending/pct rank, approx paths, asof tie
semantics, na_action, ascending top-k, ddof variants."""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from parallel_pandas_spark.operators import (  # noqa: E402
    elementwise,
    grouped,
    joins,
    ordered,
    reductions,
)
from parallel_pandas_spark.sources import from_pandas  # noqa: E402


def _pdf(spark, data):
    return from_pandas(spark, pd.DataFrame(data))


def test_merge_right_and_cross(spark):
    left = _pdf(spark, {"k": [1, 2, 3], "a": ["x", "y", "z"]})
    right = _pdf(spark, {"k": [2, 3, 4], "b": ["p", "q", "r"]})
    r = joins.merge(left, right, how="right", on=["k"]).orderBy("k").collect()
    assert [row["k"] for row in r] == [2, 3, 4]
    assert r[2]["a"] is None  # k=4 has no left match
    # pandas merge(how='cross') takes NO keys (raises MergeError with on=)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no join keys"):
        joins.merge(left, right, how="cross", on=["k"])
    c = joins.merge(left, right, how="cross")
    assert c.count() == 9  # full Cartesian product, like pandas
    semi = joins.semi_join(left, right, ["k"]).orderBy("k").collect()
    assert [row["k"] for row in semi] == [2, 3]


def test_merge_validate_suffix_overlap_keys(spark):
    left = _pdf(spark, {"k": [1, 2], "v": [10.0, 20.0]})
    right = _pdf(spark, {"k": [1, 2], "v": [1.0, 2.0]})
    m = joins.merge(left, right, how="inner", on=["k"]).orderBy("k").collect()
    assert m[0]["v_x"] == 10.0 and m[0]["v_y"] == 1.0


def test_groupby_transform_callable(spark):
    df = _pdf(spark, {"g": [1, 1, 2, 2], "x": [1.0, 3.0, 10.0, 30.0]})

    def center(pdf):
        pdf = pdf.copy()
        pdf["x"] = pdf["x"] - pdf["x"].mean()
        return pdf

    out = grouped.groupby_transform(
        df, ["g"], ["x"], center, schema="g long, x double"
    )
    got = sorted((r["g"], r["x"]) for r in out.collect())
    assert got == [(1, -1.0), (1, 1.0), (2, -10.0), (2, 10.0)]


def test_rank_descending_and_pct(spark):
    df = _pdf(spark, {"id": [1, 2, 3, 4], "x": [10.0, 20.0, 20.0, 40.0]})
    r = ordered.rank(df, "x", method="average", ascending=False, out_col="r")
    got = {row["id"]: row["r"] for row in r.collect()}
    # desc: 40 -> 1, the two 20s -> (2+3)/2, 10 -> 4
    assert got == {4: 1.0, 2: 2.5, 3: 2.5, 1: 4.0}
    p = ordered.rank(df, "x", method="average", pct=True, out_col="r")
    gotp = {row["id"]: row["r"] for row in p.collect()}
    assert gotp[4] == 1.0 and gotp[1] == 0.25


def test_rank_nulls_keep(spark):
    df = _pdf(spark, {"id": [1, 2, 3], "x": [5.0, None, 7.0]})
    r = ordered.rank(df, "x", method="min", out_col="r")
    got = {row["id"]: row["r"] for row in r.collect()}
    assert got[2] is None  # pandas na_option='keep'
    assert got == {1: 1.0, 2: None, 3: 2.0}


def test_quantile_approx_and_nunique_approx(spark, sf_small):
    li = spark.read.parquet(f"{sf_small}/lineitem.parquet")
    exact = reductions.quantile(li, ["l_quantity"], [0.5], exact=True).collect()[0]
    approx = reductions.quantile(li, ["l_quantity"], [0.5], exact=False).collect()[0]
    assert abs(exact["l_quantity"] - approx["l_quantity"]) <= 2.0
    nu = reductions.nunique(li, ["l_partkey"], approx=True).collect()[0]
    exact_nu = reductions.nunique(li, ["l_partkey"]).collect()[0]
    rel = abs(nu["l_partkey_nunique"] - exact_nu["l_partkey_nunique"]) / exact_nu[
        "l_partkey_nunique"
    ]
    assert rel < 0.1  # HLL++ default precision


def test_asof_tie_and_no_match(spark):
    left = _pdf(spark, {"u": [1, 1, 1], "t": [5, 10, 1], "eid": [100, 101, 102]})
    right = _pdf(spark, {"u": [1, 1], "t": [5, 8], "val": [50.0, 80.0]})
    out = joins.asof_join(
        left, right, ts_left="t", ts_right="t", by_left=["u"], by_right=["u"],
        right_cols=["val"], direction="backward",
    )
    got = {r["eid"]: r["val"] for r in out.collect()}
    # t=5 matches the equal-ts right row (ties match); t=1 has none
    assert got == {100: 50.0, 101: 80.0, 102: None}
    fwd = joins.asof_join(
        left, right, ts_left="t", ts_right="t", by_left=["u"], by_right=["u"],
        right_cols=["val"], direction="forward",
    )
    gotf = {r["eid"]: r["val"] for r in fwd.collect()}
    assert gotf == {100: 50.0, 101: None, 102: 50.0}


def test_map_elements_na_action(spark):
    df = _pdf(spark, {"x": [1.0, None, 9.0]})
    out = elementwise.map_elements(
        df, "x", lambda v: v * 2, "y", "double", na_action="ignore"
    )
    got = [r["y"] for r in out.orderBy(F.col("x").asc_nulls_first()).collect()]
    assert got == [None, 2.0, 18.0]


def test_map_dict_missing_key_null(spark):
    df = _pdf(spark, {"s": ["a", "b", "c"]})
    out = elementwise.map_dict(df, "s", {"a": 1, "b": 2}, out_col="m")
    got = {r["s"]: r["m"] for r in out.collect()}
    assert got == {"a": 1, "b": 2, "c": None}


def test_top_k_ascending(spark):
    df = _pdf(spark, {"g": [1, 1, 1, 2], "v": [3.0, 1.0, 2.0, 9.0], "id": [1, 2, 3, 4]})
    out = ordered.top_k_per_group(df, ["g"], "v", 2, descending=False, tie_breaker="id")
    got = sorted((r["g"], r["v"]) for r in out.collect())
    assert got == [(1, 1.0), (1, 2.0), (2, 9.0)]


def test_mad_and_zscore_ddof0(spark):
    pdf = pd.DataFrame({"x": [1.0, 2.0, 3.0, 4.0]})
    df = from_pandas(spark, pdf)
    mad = reductions.mad(df, ["x"]).collect()[0]["x_mad"]
    assert mad == (pdf["x"] - pdf["x"].mean()).abs().mean()
    z0 = reductions.zscore_normalize(df, ["x"], ddof=0).collect()
    exp = ((pdf["x"] - pdf["x"].mean()) / pdf["x"].std(ddof=0)).tolist()
    assert sorted(round(r["x"], 9) for r in z0) == sorted(round(v, 9) for v in exp)


def test_sum_prod_min_count_nulls(spark):
    df = _pdf(spark, {"x": [1.0, None, 3.0]})
    r = df.agg(
        reductions.sum_min_count("x", 2).alias("ok"),
        reductions.sum_min_count("x", 3).alias("short"),
        reductions.prod_min_count("x", 2).alias("pok"),
    ).collect()[0]
    assert r["ok"] == 4.0 and r["short"] is None and r["pok"] == 3.0


def test_salted_matches_plain(spark, sf_small):
    li = spark.read.parquet(f"{sf_small}/lineitem.parquet")
    salted = {
        r["l_returnflag"]: (r["l_quantity_sum"], r["l_quantity_count"])
        for r in grouped.salted_groupby_agg(
            li, ["l_returnflag"], {"l_quantity": ["sum", "count"]}, salt_buckets=8
        ).collect()
    }
    plain = {
        r["l_returnflag"]: (r["s"], r["c"])
        for r in li.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("s"), F.count("l_quantity").alias("c"))
        .collect()
    }
    assert salted == plain
