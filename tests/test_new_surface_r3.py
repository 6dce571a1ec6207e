"""Round-3 API additions vs pandas itself: pivot_table aggfunc
list/dict/callable (reference tests/test_pivot_table.py), chunk_apply
split_by_col (parallel_dataframe.py:80-84), the generic .str/.dt accessor
passthrough (parallel_str_dt.py:69-131), and EWM halflife/com/times."""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from parallel_pandas_spark.functions import datetimes as dtf  # noqa: E402
from parallel_pandas_spark.functions import strings as sfn  # noqa: E402
from parallel_pandas_spark.operators import elementwise, grouped, windows  # noqa: E402
from parallel_pandas_spark.sources import from_pandas  # noqa: E402


def _pivot_pdf():
    return pd.DataFrame(
        {
            "k": ["a", "a", "b", "b", "b", "c"],
            "p": ["x", "y", "x", "x", "y", "y"],
            "v": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
            "w": [10.0, 20.0, 30.0, 40.0, 50.0, 60.0],
        }
    )


def test_pivot_aggfunc_list_with_margins(spark):
    pdf = _pivot_pdf()
    out = grouped.pivot_table(
        from_pandas(spark, pdf), ["k"], "p", "v",
        aggfunc=["mean", "sum"], margins=True, fill_value=0.0,
    )
    rows = {r["k"]: r.asDict() for r in out.collect()}
    ref = pd.pivot_table(
        pdf, index="k", columns="p", values="v",
        aggfunc=["mean", "sum"], margins=True, fill_value=0.0,
    )
    for k in ("a", "b", "c"):
        for p in ("x", "y"):
            for fn in ("mean", "sum"):
                assert rows[k][f"{p}_{fn}"] == ref.loc[k, (fn, p)]
        for fn in ("mean", "sum"):
            assert rows[k][f"All_{fn}"] == ref.loc[k, (fn, "All")]
    grand = rows["All"]
    for p in ("x", "y"):
        for fn in ("mean", "sum"):
            assert grand[f"{p}_{fn}"] == ref.loc["All", (fn, p)]


def test_pivot_aggfunc_dict(spark):
    pdf = _pivot_pdf()
    out = grouped.pivot_table(
        from_pandas(spark, pdf), ["k"], "p", "v",
        aggfunc={"v": "sum", "w": ["mean", "max"]},
    )
    rows = {r["k"]: r.asDict() for r in out.collect()}
    ref = pd.pivot_table(pdf, index="k", columns="p", aggfunc={"v": "sum", "w": ["mean", "max"]})
    for k in ("a", "b", "c"):
        for p in ("x", "y"):
            got = rows[k][f"{p}_v_sum"]
            want = ref.loc[k, ("v", "sum", p)]
            assert (got is None) == pd.isna(want) and (got is None or got == want)
            got = rows[k][f"{p}_w_mean"]
            want = ref.loc[k, ("w", "mean", p)]
            assert (got is None) == pd.isna(want) and (got is None or got == want)


def test_pivot_aggfunc_callable(spark):
    pdf = _pivot_pdf()
    out = grouped.pivot_table(
        from_pandas(spark, pdf), ["k"], "p", "v",
        aggfunc=lambda s: float(s.max() - s.min()),
    )
    rows = {r["k"]: r.asDict() for r in out.collect()}
    ref = pd.pivot_table(
        pdf, index="k", columns="p", values="v", aggfunc=lambda s: float(s.max() - s.min())
    )
    for k in ("a", "b", "c"):
        for p in ("x", "y"):
            got, want = rows[k][p], ref.loc[k, p]
            assert (got is None) == pd.isna(want) and (got is None or got == want)
    with pytest.raises(NotImplementedError):
        grouped.pivot_table(
            from_pandas(spark, pdf), ["k"], "p", "v", aggfunc=lambda s: 0.0, margins=True
        )


def test_map_batches_split_by_whole_groups(spark):
    """Each chunk must contain whole key groups; the concatenated result
    must equal a per-group aggregation regardless of chunk packing."""
    n = 5000
    pdf = pd.DataFrame({"k": [i % 37 for i in range(n)], "x": np.arange(n, dtype="float64")})
    df = from_pandas(spark, pdf).repartition(8)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
    try:
        def per_chunk(chunk: pd.DataFrame) -> pd.DataFrame:
            # one row per key IN THIS CHUNK: proves func sees whole groups
            g = chunk.groupby("k")["x"].agg(["sum", "count"]).reset_index()
            return g.rename(columns={"sum": "s", "count": "c"})

        out = elementwise.map_batches_split_by(
            df, "k", per_chunk, "k long, s double, c long"
        ).toPandas()
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
    # if a key were split across chunks it would appear twice
    assert out["k"].is_unique, "a key group was split across chunks"
    want = pdf.groupby("k")["x"].agg(["sum", "count"])
    got = out.set_index("k").sort_index()
    assert (got["s"] == want["sum"]).all()
    assert (got["c"] == want["count"]).all()


def test_str_dt_accessor_passthrough(spark):
    pdf = pd.DataFrame(
        {
            "s": ["Straße", "Hello", None, "ab"],
            "t": pd.to_datetime(
                ["2024-02-15 10:30:00", "2023-06-01 00:00:00", "2024-01-31 23:59:59", "2020-02-29 12:00:00"]
            ),
        }
    )
    df = from_pandas(spark, pdf)
    out = df.select(
        sfn.accessor("s", "get", 1).alias("g1"),
        sfn.accessor("s", "casefold").alias("cf"),
        sfn.accessor("s", "normalize", "NFC").alias("nz"),
        dtf.accessor("t", "days_in_month").alias("dim"),
        dtf.accessor("t", "is_leap_year", out_type="boolean").alias("leap"),
    ).collect()
    want_g1 = pdf["s"].str.get(1)
    want_cf = pdf["s"].str.casefold()
    for i, r in enumerate(out):
        assert (r["g1"] is None) == pd.isna(want_g1.iloc[i])
        if r["g1"] is not None:
            assert r["g1"] == want_g1.iloc[i]
            assert r["cf"] == want_cf.iloc[i]
        assert r["dim"] == pdf["t"].dt.days_in_month.iloc[i]
        assert r["leap"] == bool(pdf["t"].dt.is_leap_year.iloc[i])


def test_ewm_halflife_com_and_times(spark):
    pdf = pd.DataFrame(
        {
            "g": [0] * 15 + [1] * 15,
            "i": list(range(15)) * 2,
            "x": [float((i * 7) % 5) for i in range(30)],
            "t": list(pd.to_datetime("2024-01-01")
                      + pd.to_timedelta([int((i * 11) % 17) * 3600 + i * 7200 for i in range(15)], unit="s")) * 2,
        }
    )
    df = from_pandas(spark, pdf)
    # halflife (scalar) and com
    out = windows.ewm(df, ["x"], ["i"], ["g"], funcs=("mean",), halflife=3.0)
    last = {r["g"]: r["x_ewm_mean"] for r in out.where(F.col("i") == 14).collect()}
    for g in (0, 1):
        want = pdf[pdf.g == g].sort_values("i")["x"].ewm(halflife=3.0).mean().iloc[-1]
        assert abs(last[g] - want) < 1e-12
    out = windows.ewm(df, ["x"], ["i"], ["g"], funcs=("mean",), com=2.0)
    last = {r["g"]: r["x_ewm_mean"] for r in out.where(F.col("i") == 14).collect()}
    for g in (0, 1):
        want = pdf[pdf.g == g].sort_values("i")["x"].ewm(com=2.0).mean().iloc[-1]
        assert abs(last[g] - want) < 1e-12
    # times= with halflife as a string timedelta
    out = windows.ewm(
        df, ["x"], ["i"], ["g"], funcs=("mean",), halflife="1h", times_col="t"
    )
    last = {r["g"]: r["x_ewm_mean"] for r in out.where(F.col("i") == 14).collect()}
    for g in (0, 1):
        sub = pdf[pdf.g == g].sort_values("i")
        want = sub["x"].ewm(halflife="1h", times=sub["t"]).mean().iloc[-1]
        assert abs(last[g] - want) < 1e-12
    with pytest.raises(ValueError):
        windows.ewm(df, ["x"], ["i"], ["g"], span=5.0, alpha=0.5)


def test_rolling_cov_corr_matches_pandas(spark):
    """windows.rolling_cov_corr (reference rolling.p_cov dispatch,
    parallel_window.py:180-185) vs pandas rolling().cov()/corr()."""
    rng = np.random.default_rng(7)
    pdf = pd.DataFrame(
        {
            "g": np.repeat(["a", "b"], 40),
            "i": np.tile(np.arange(40), 2),
            "x": np.round(rng.uniform(0, 50, 80), 2),
            "y": np.round(rng.uniform(0, 1000, 80), 2),
        }
    )
    got = (
        windows.rolling_cov_corr(
            from_pandas(spark, pdf), "x", "y", window=7,
            order_by=["i"], partition_by=["g"], out_prefix="xy",
        )
        .orderBy("g", "i")
        .toPandas()
    )
    for g, sub in pdf.groupby("g"):
        sub = sub.sort_values("i")
        want_cov = sub["x"].rolling(7).cov(sub["y"]).to_numpy()
        want_corr = sub["x"].rolling(7).corr(sub["y"]).to_numpy()
        sel = got[got["g"] == g].sort_values("i")
        np.testing.assert_allclose(sel["xy_roll_cov"], want_cov, rtol=1e-9, equal_nan=True)
        np.testing.assert_allclose(sel["xy_roll_corr"], want_corr, rtol=1e-9, equal_nan=True)


def test_api_rolling_cov_and_cumprod(spark):
    from parallel_pandas_spark.api import ParallelFrame

    pdf = pd.DataFrame({"i": range(12), "x": np.arange(12) * 0.5 + 1, "y": np.arange(12) % 4 + 1.0})
    pf = ParallelFrame(from_pandas(spark, pdf))
    out = pf.rolling(4, order_by=["i"]).p_cov("x", "y").orderBy("i").toPandas()
    want = pdf["x"].rolling(4).cov(pdf["y"]).to_numpy()
    np.testing.assert_allclose(out["x_y_roll_cov"], want, rtol=1e-9, equal_nan=True)

    cp = pf.p_cumprod(["y"], order_by=["i"]).orderBy("i").toPandas()
    np.testing.assert_allclose(cp["y_cumprod"], pdf["y"].cumprod(), rtol=1e-12)


def test_deterministic_sampling(spark):
    """sampling.*: layout-independent membership, per-stratum fractions,
    stable split assignment (operators/sampling.py)."""
    from parallel_pandas_spark.operators import sampling

    pdf = pd.DataFrame(
        {"id": range(4000), "s": np.where(np.arange(4000) % 4 == 0, "rare", "big")}
    )
    df = from_pandas(spark, pdf)

    a = set(r.id for r in sampling.hash_sample(df, ["id"], 0.25, seed=9).collect())
    b = set(r.id for r in sampling.hash_sample(df.repartition(13), ["id"], 0.25, seed=9).collect())
    assert a == b
    assert 0.2 < len(a) / 4000 < 0.3

    st = sampling.stratified_sample(
        df, "s", {"big": 0.1}, ["id"], default_fraction=1.0, seed=2
    ).toPandas()
    assert (st[st.s == "rare"].shape[0]) == 1000  # rare stratum kept whole
    assert 0.05 < st[st.s == "big"].shape[0] / 3000 < 0.15

    sp = sampling.train_test_split(df, ["id"], test_fraction=0.2, val_fraction=0.1, seed=5)
    counts = sp.groupBy("split").count().toPandas().set_index("split")["count"]
    assert 0.15 < counts["test"] / 4000 < 0.25
    assert 0.06 < counts["val"] / 4000 < 0.14
    # appending rows never reassigns existing ones
    sp2 = sampling.train_test_split(
        from_pandas(spark, pdf.head(1000)), ["id"], test_fraction=0.2, val_fraction=0.1, seed=5
    ).toPandas().set_index("id")["split"]
    full = sp.toPandas().set_index("id")["split"]
    assert (full.loc[sp2.index] == sp2).all()


def test_pack_sequences_invariants(spark):
    """packing.pack_sequences: offsets are exact exclusive running totals
    in hash order, pack ids are offset//budget, layout-independent."""
    from parallel_pandas_spark.operators import packing

    pdf = pd.DataFrame({"id": range(500), "tok": (np.arange(500) * 37) % 900 + 10})
    df = from_pandas(spark, pdf)
    out = packing.pack_sequences(df, ["id"], "tok", budget=2000, num_buckets=4, seed=1)
    got = out.toPandas()
    got2 = packing.pack_sequences(
        from_pandas(spark, pdf).repartition(11), ["id"], "tok", budget=2000, num_buckets=4, seed=1
    ).toPandas()
    key = ["id"]
    assert got.sort_values(key).reset_index(drop=True).equals(
        got2.sort_values(key).reset_index(drop=True)
    )
    for b, sub in got.groupby("pack_bucket"):
        sub = sub.sort_values("pack_offset")
        run = 0
        for _, r in sub.iterrows():
            assert r["pack_offset"] == run
            assert r["pack_id"] == run // 2000
            run += r["tok"]


def test_resample_by_weight(spark):
    """sampling.resample_by_weight: expected copy counts per stratum,
    deterministic across layouts, copy_id dense per row."""
    from parallel_pandas_spark.operators import sampling

    pdf = pd.DataFrame({"id": range(3000), "s": np.where(np.arange(3000) % 3 == 0, "rare", "big")})
    df = from_pandas(spark, pdf)
    r = sampling.resample_by_weight(df, "s", {"rare": 2.5, "big": 0.5}, ["id"], seed=4)
    got = r.toPandas()
    rare = got[got.s == "rare"]
    big = got[got.s == "big"]
    # rare: every source row has >= 2 copies; mean ~2.5
    per = rare.groupby("id").size()
    assert per.min() >= 2 and per.max() <= 3
    assert 2.3 < per.mean() < 2.7
    assert 0.4 < big.groupby("id").size().reindex(range(1, 3000, 1)).notna().sum() / 2000 < 0.6
    # copies are dense 1..n
    assert (rare.groupby("id")["copy_id"].max() == per).all()
    got2 = sampling.resample_by_weight(
        from_pandas(spark, pdf).repartition(9), "s", {"rare": 2.5, "big": 0.5}, ["id"], seed=4
    ).toPandas()
    k = ["id", "copy_id"]
    assert got.sort_values(k).reset_index(drop=True).equals(got2.sort_values(k).reset_index(drop=True))


def test_rolling_cov_corr_pairwise_nulls(spark):
    """Pairwise-complete semantics: a row with either side null drops out
    of every frame sum, exactly as pandas rolling cov/corr."""
    rng = np.random.default_rng(11)
    pdf = pd.DataFrame(
        {"i": range(60), "x": np.round(rng.uniform(1, 9, 60), 2),
         "y": np.round(rng.uniform(1, 9, 60), 2)}
    )
    pdf.loc[pdf.index % 7 == 3, "x"] = np.nan
    pdf.loc[pdf.index % 11 == 5, "y"] = np.nan
    got = (
        windows.rolling_cov_corr(
            from_pandas(spark, pdf), "x", "y", window=8, order_by=["i"],
            partition_by=[], min_periods=4, out_prefix="xy",
        )
        .orderBy("i").toPandas()
    )
    # pandas pairwise: mask both sides before rolling
    m = pdf.copy()
    bad = m["x"].isna() | m["y"].isna()
    m.loc[bad, ["x", "y"]] = np.nan
    want_cov = m["x"].rolling(8, min_periods=4).cov(m["y"]).to_numpy()
    want_corr = m["x"].rolling(8, min_periods=4).corr(m["y"]).to_numpy()
    np.testing.assert_allclose(got["xy_roll_cov"], want_cov, rtol=1e-6, equal_nan=True)
    np.testing.assert_allclose(got["xy_roll_corr"], want_corr, rtol=1e-6, equal_nan=True)


def test_cum_axis1_matches_pandas(spark):
    """Row-wise cumulatives (reference CUMULATIVE axis=1 tests) including
    NaN propagation."""
    from parallel_pandas_spark.api import ParallelFrame

    rng = np.random.default_rng(3)
    pdf = pd.DataFrame(rng.uniform(-5, 5, (40, 4)), columns=list("abcd")).round(3)
    pdf.iloc[3, 1] = np.nan
    pdf.iloc[7, 0] = np.nan
    pf = ParallelFrame(from_pandas(spark, pdf.reset_index()))
    for op in ["cumsum", "cumprod", "cummax", "cummin"]:
        got = (
            getattr(pf, f"p_{op}")(list("abcd"), axis=1)
            .orderBy("index").toPandas()
        )
        want = getattr(pdf, op)(axis=1)
        for i, c in enumerate("abcd"):
            np.testing.assert_allclose(
                got[f"{c}_cum{op[3:]}1"], want[c], rtol=1e-9, equal_nan=True
            )


def test_p_agg_list_spec(spark):
    from parallel_pandas_spark.api import ParallelFrame

    pdf = pd.DataFrame({"x": [1.0, 2.0, 3.0], "y": [4.0, 6.0, 11.0]})
    out = ParallelFrame(from_pandas(spark, pdf)).p_agg(["mean", "max"]).collect()[0]
    assert out["x_mean"] == 2.0 and out["y_max"] == 11.0


def test_groupby_agg_named_and_callable(spark):
    """Reference test_agg_named / test_agg_dict-with-callable forms."""
    from parallel_pandas_spark.api import ParallelFrame

    pdf = pd.DataFrame(
        {"k": ["a", "a", "b", "b", "b"], "x": [1.0, 3.0, 2.0, 8.0, 4.0],
         "y": [1.0, 2.0, 3.0, 4.0, 5.0]}
    )
    gb = ParallelFrame(from_pandas(spark, pdf)).groupby("k")
    named = gb.p_agg(mx=("x", "max"), sy=("y", "sum")).toPandas().set_index("k")
    want = pdf.groupby("k").agg(mx=("x", "max"), sy=("y", "sum"))
    assert named["mx"].to_dict() == want["mx"].to_dict()
    assert named["sy"].to_dict() == want["sy"].to_dict()

    mixed = gb.p_agg({"x": "mean", "y": lambda s: float(s.max() - s.min())}).toPandas().set_index("k")
    wantm = pdf.groupby("k").agg({"x": "mean", "y": lambda s: s.max() - s.min()})
    assert mixed["x_mean"].to_dict() == wantm["x"].to_dict()
    assert mixed["y_agg"].to_dict() == wantm["y"].to_dict()
