"""API-parity layer smoke battery: every p_* entry point on ParallelFrame
runs and produces the same values as the underlying operator/pandas."""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from parallel_pandas_spark.api import ParallelFrame  # noqa: E402
from parallel_pandas_spark.sources import from_pandas  # noqa: E402


def _frame(spark):
    pdf = pd.DataFrame(
        {
            "id": range(100),
            "g": [i % 4 for i in range(100)],
            "x": [float(i % 13) for i in range(100)],
            "y": [float((i * 7) % 11) for i in range(100)],
        }
    )
    return ParallelFrame(from_pandas(spark, pdf)), pdf


def test_reductions_surface(spark):
    pf, pdf = _frame(spark)
    assert pf.p_mean(["x"]).collect()[0]["x_mean"] == pdf["x"].mean()
    assert pf.p_sum(["x"]).collect()[0]["x_sum"] == pdf["x"].sum()
    assert pf.p_std(["x"]).collect()[0]["x_std"] == pdf["x"].std()
    assert pf.p_nunique(["x"]).collect()[0]["x_nunique"] == pdf["x"].nunique()
    med = pf.p_quantile(0.5, ["x"]).collect()[0]["x"]
    assert med == pdf["x"].quantile(0.5)
    d = pf.p_describe(["x"])
    assert d.count() == 8
    m = pf.p_mode("g").collect()[0]
    assert m["g_mode"] in (0, 1, 2, 3)
    c = pf.p_corr(["x", "y"], round_to=6).collect()
    exp = round(pdf["x"].corr(pdf["y"]), 6)
    assert abs(c[0]["corr"] - exp) < 1e-6
    ix = pf.p_idxmax(["x"], "id").collect()[0]["x_idxmax"]
    assert pdf["x"][ix] == pdf["x"].max()


def test_groupby_and_windows_surface(spark):
    pf, pdf = _frame(spark)
    g = pf.groupby("g").p_agg({"x": ["sum", "count"]})
    got = {r["g"]: r["x_sum"] for r in g.collect()}
    want = pdf.groupby("g")["x"].sum().to_dict()
    assert got == want

    t = pf.groupby("g").p_transform(["x"], "mean")
    row = t.where(F.col("g") == 1).select("x_mean").distinct().collect()
    assert len(row) == 1 and row[0]["x_mean"] == pdf[pdf.g == 1]["x"].mean()

    r = pf.rolling(5, order_by=["id"], partition_by=["g"]).p_mean(["x"])
    one = r.where(F.col("g") == 0).orderBy("id").collect()
    series = pdf[pdf.g == 0].sort_values("id")["x"].rolling(5).mean()
    got_vals = [row["x_roll_mean"] for row in one]
    exp_vals = [None if pd.isna(v) else v for v in series]
    assert got_vals == exp_vals

    e = pf.expanding(order_by=["id"], partition_by=["g"]).p_sum(["x"])
    last = e.where(F.col("g") == 2).orderBy(F.col("id").desc()).limit(1).collect()[0]
    assert last["x_exp_sum"] == pdf[pdf.g == 2]["x"].sum()

    w = pf.ewm(order_by=["id"], partition_by=["g"], span=5).p_mean(["x"])
    lastw = w.where(F.col("g") == 3).orderBy(F.col("id").desc()).limit(1).collect()[0]
    expw = pdf[pdf.g == 3].sort_values("id")["x"].ewm(span=5).mean().iloc[-1]
    assert abs(lastw["x_ewm_mean"] - expw) < 1e-9


def test_elementwise_and_merge_surface(spark):
    pf, pdf = _frame(spark)
    m = pf.p_map("g", {0: "a", 1: "b"})
    vals = {r["g"]: r["g_mapped"] for r in m.select("g", "g_mapped").distinct().collect()}
    assert vals[0] == "a" and vals[2] is None

    a = pf.p_apply(lambda row: row["x"] + row["y"], axis=1, out_col="s", cols=["x", "y"])
    r0 = a.where(F.col("id") == 3).collect()[0]
    assert r0["s"] == pdf.loc[3, "x"] + pdf.loc[3, "y"]

    dims = ParallelFrame(from_pandas(spark, pd.DataFrame({"g": [0, 1], "name": ["zero", "one"]})))
    j = pf.p_merge(dims, how="inner", on=["g"])
    assert j.df.count() == len(pdf[pdf.g.isin([0, 1])])

    rk = pf.p_rank("x", method="dense", partition_by=["g"], out_col="r")
    sub = {r["id"]: r["r"] for r in rk.where(F.col("g") == 0).collect()}
    exp = pdf[pdf.g == 0].set_index("id")["x"].rank(method="dense").to_dict()
    assert sub == exp

    cs = pf.p_cumsum(["x"], order_by=["id"], partition_by=["g"])
    lastc = cs.where(F.col("g") == 1).orderBy(F.col("id").desc()).limit(1).collect()[0]
    assert lastc["x_cumsum"] == pdf[pdf.g == 1]["x"].sum()


def test_parallel_accessor_dispatch(spark):
    """Reference .parallel accessor behaviors (tests/test_accessor.py):
    bare-name dispatch, AttributeError on unknown, dir() listing."""
    import pytest as _pytest

    from parallel_pandas_spark.api import ParallelAccessor, ParallelFrame

    pf = ParallelFrame(spark.range(50).withColumn("x", F.col("id") * 1.5))
    assert isinstance(pf.parallel, ParallelAccessor)
    a = pf.parallel.mean(["x"]).collect()
    b = pf.p_mean(["x"]).collect()
    assert a == b
    with _pytest.raises(AttributeError, match="definitely_not_a_method"):
        pf.parallel.definitely_not_a_method()
    listing = dir(pf.parallel)
    assert "mean" in listing and "apply" in listing and "chunk_apply" in listing
