"""Round-6 differential fuzzing: grouped / pivot / str / dt families vs
real pandas (the r5 technique that surfaced six silent parity bugs,
extended per the round-5 verdict queue #6).

Frames are randomized but seeded: NaN keys, duplicate keys, groups that
vanish under dropna, unicode/empty/whitespace strings, and boundary
timestamps (leap day, ISO-week-53, month edges)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def from_pandas(spark, pdf):
    return spark.createDataFrame(pdf)


def _eq(gv, rv, tol=1e-9, ctx=None):
    if rv is None or (isinstance(rv, float) and math.isnan(rv)):
        assert gv is None or (isinstance(gv, float) and math.isnan(gv)), (ctx, gv, rv)
    else:
        assert gv == pytest.approx(rv, abs=tol, rel=1e-9), (ctx, gv, rv)


def _grouped_frame(seed: int, n: int = 120) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    g1 = rng.integers(0, 5, n).astype(float)
    g1[rng.choice(n, n // 10, replace=False)] = np.nan  # NULL keys
    v = rng.normal(10, 4, n).round(3)
    v[rng.choice(n, n // 8, replace=False)] = np.nan
    w = rng.integers(1, 100, n).astype(float)
    return pd.DataFrame({"g": g1, "v": v, "w": w, "i": range(n)})


def test_groupby_agg_fuzz_vs_pandas(spark):
    from parallel_pandas_spark.operators import grouped

    for seed in (101, 102, 103):
        pdf = _grouped_frame(seed)
        df = from_pandas(spark, pdf)
        spec = {"v": ["sum", "mean", "min", "max", "count", "std", "var", "median"], "w": "sum"}
        got = grouped.groupby_agg(df, ["g"], spec, dropna=True).toPandas().set_index("g")
        ref = pdf.groupby("g", dropna=True).agg(
            {"v": ["sum", "mean", "min", "max", "count", "std", "var", "median"], "w": ["sum"]}
        )
        assert len(got) == len(ref), (seed, len(got), len(ref))
        for g in ref.index:
            for stat in ("sum", "mean", "min", "max", "count", "std", "var", "median"):
                _eq(got.loc[g, f"v_{stat}"], ref.loc[g, ("v", stat)], ctx=(seed, g, stat))
            _eq(got.loc[g, "w_sum"], ref.loc[g, ("w", "sum")], ctx=(seed, g, "w_sum"))


def test_groupby_transform_fuzz_vs_pandas(spark):
    from parallel_pandas_spark.operators import grouped

    for seed in (111, 112):
        pdf = _grouped_frame(seed)
        df = from_pandas(spark, pdf)
        for fn in ("mean", "sum", "max", "min", "count"):
            r = grouped.groupby_transform(df, ["g"], ["v"], fn)
            got = {row["i"]: row[f"v_{fn}"] for row in r.collect()}
            ref = pdf.groupby("g", dropna=True)["v"].transform(fn)
            for i in pdf["i"]:
                _eq(got[i], ref.iloc[i], ctx=(seed, fn, i))


def test_pivot_table_fuzz_vs_pandas(spark):
    from parallel_pandas_spark.operators import grouped

    for seed in (121, 122):
        rng = np.random.default_rng(seed)
        n = 150
        pdf = pd.DataFrame(
            {
                "r": rng.choice(["x", "y", "z"], n),
                "c": rng.choice(["p", "q"], n),
                "v": rng.normal(5, 2, n).round(3),
            }
        )
        pdf.loc[rng.choice(n, 10, replace=False), "v"] = np.nan
        df = from_pandas(spark, pdf)

        # single aggfunc + margins + fill_value
        got = (
            grouped.pivot_table(df, ["r"], "c", "v", aggfunc="mean", margins=True)
            .toPandas().set_index("r")
        )
        ref = pdf.pivot_table(index="r", columns="c", values="v", aggfunc="mean", margins=True)
        for r_ in ("x", "y", "z"):
            for c_ in ("p", "q"):
                _eq(got.loc[r_, c_], ref.loc[r_, c_], ctx=(seed, r_, c_))
            _eq(got.loc[r_, "All"], ref.loc[r_, "All"], ctx=(seed, r_, "All"))
        for c_ in ("p", "q", "All"):
            _eq(got.loc["All", c_], ref.loc["All", c_], ctx=(seed, "All", c_))

        # aggfunc list
        got = (
            grouped.pivot_table(df, ["r"], "c", "v", aggfunc=["sum", "count"])
            .toPandas().set_index("r")
        )
        ref = pdf.pivot_table(index="r", columns="c", values="v", aggfunc=["sum", "count"])
        for r_ in ("x", "y", "z"):
            for c_ in ("p", "q"):
                for fn in ("sum", "count"):
                    _eq(got.loc[r_, f"{c_}_{fn}"], ref.loc[r_, (fn, c_)], ctx=(seed, r_, c_, fn))


_STR_CASES = [
    "", " ", "  padded  ", "hello world", "HeLLo", "über-straße", "naïve café",
    "こんにちは", "数据 分析", "a,b,,c", "-42", "+7", "0", "tab\there",
    "line1\nline2", "d'angelo o'neil", "MiXeD CaSe WoRdS", "aaa", "ab"*20,
]


def test_str_accessor_fuzz_vs_pandas(spark):
    from parallel_pandas_spark.functions import strings as S
    from pyspark.sql import functions as F

    rng = np.random.default_rng(131)
    vals = list(_STR_CASES) + [
        "".join(rng.choice(list("abcXYZ 09_-ü"), rng.integers(0, 12)))
        for _ in range(30)
    ] + [None, None]
    pdf = pd.DataFrame({"i": range(len(vals)), "s": vals})
    df = from_pandas(spark, pdf)
    ps = pdf["s"]

    out = df.select(
        "i",
        S.lower("s").alias("lower"),
        S.upper("s").alias("upper"),
        S.strip("s").alias("strip"),
        S.length("s").alias("len"),
        S.contains("s", "a.").alias("contains"),
        S.startswith("s", "he").alias("startswith"),
        S.endswith("s", "e").alias("endswith"),
        S.count("s", "a").alias("count"),
        S.replace("s", r"\s+", "_").alias("replace"),
        S.slice_("s", 1, 4).alias("slice"),
        S.zfill("s", 6).alias("zfill"),
        S.pad("s", 8, "left", ".").alias("pad"),
        S.title("s").alias("title"),
        S.repeat("s", 2).alias("repeat"),
        S.find("s", "a").alias("find"),
    )
    got = {r["i"]: r.asDict() for r in out.collect()}
    refs = {
        "lower": ps.str.lower(), "upper": ps.str.upper(), "strip": ps.str.strip(),
        "len": ps.str.len(), "contains": ps.str.contains("a."),
        "startswith": ps.str.startswith("he"), "endswith": ps.str.endswith("e"),
        "count": ps.str.count("a"), "replace": ps.str.replace(r"\s+", "_", regex=True),
        "slice": ps.str.slice(1, 4), "zfill": ps.str.zfill(6),
        "pad": ps.str.pad(8, "left", "."), "title": ps.str.title(),
        "repeat": ps.str.repeat(2), "find": ps.str.find("a"),
    }
    for name, ref in refs.items():
        for i in pdf["i"]:
            rv, gv = ref.iloc[i], got[i][name]
            if rv is None or (isinstance(rv, float) and math.isnan(rv)):
                assert gv is None, (name, i, vals[i], gv)
            elif isinstance(rv, (bool, np.bool_)):
                assert gv == bool(rv), (name, i, vals[i], gv, rv)
            elif isinstance(rv, (int, np.integer, float)):
                assert gv == int(rv), (name, i, vals[i], gv, rv)
            else:
                assert gv == rv, (name, i, repr(vals[i]), repr(gv), repr(rv))


_DT_CASES = pd.to_datetime(format="mixed", arg=[
    "2024-02-29 00:00:00",        # leap day
    "2020-12-31 23:59:59",        # ISO week 53
    "2021-01-01 00:00:00",        # ISO week 53 of 2020
    "2015-12-28 12:00:00",        # ISO week 53 start
    "2024-01-01 00:00:00", "2024-03-31 23:59:59.999999",
    "1999-12-31 23:59:59", "2000-01-01 00:00:00",
    "2024-07-15 13:45:30.123456", "1970-01-01 00:00:00",
])


def test_dt_accessor_fuzz_vs_pandas(spark):
    from parallel_pandas_spark.functions import datetimes as D

    rng = np.random.default_rng(141)
    extra = pd.Timestamp("2010-01-01") + pd.to_timedelta(
        rng.integers(0, 10 * 365 * 86400, 40), unit="s"
    )
    ts = _DT_CASES.append(pd.DatetimeIndex(extra))
    pdf = pd.DataFrame({"i": range(len(ts)), "t": ts})
    df = from_pandas(spark, pdf)
    pt = pdf["t"].dt

    out = df.select(
        "i",
        D.year("t").alias("year"), D.month("t").alias("month"), D.day("t").alias("day"),
        D.hour("t").alias("hour"), D.minute("t").alias("minute"), D.second("t").alias("second"),
        D.quarter("t").alias("quarter"), D.dayofweek("t").alias("dayofweek"),
        D.dayofyear("t").alias("dayofyear"), D.week("t").alias("week"),
        D.is_month_start("t").alias("is_month_start"), D.is_month_end("t").alias("is_month_end"),
        D.day_name("t").alias("day_name"), D.month_name("t").alias("month_name"),
        D.strftime("t", "%Y-%m-%d %H:%M:%S").alias("strftime"),
    )
    got = {r["i"]: r.asDict() for r in out.collect()}
    refs = {
        "year": pt.year, "month": pt.month, "day": pt.day, "hour": pt.hour,
        "minute": pt.minute, "second": pt.second, "quarter": pt.quarter,
        "dayofweek": pt.dayofweek, "dayofyear": pt.dayofyear,
        "week": pt.isocalendar().week, "is_month_start": pt.is_month_start,
        "is_month_end": pt.is_month_end, "day_name": pt.day_name(),
        "month_name": pt.month_name(), "strftime": pt.strftime("%Y-%m-%d %H:%M:%S"),
    }
    for name, ref in refs.items():
        for i in pdf["i"]:
            rv, gv = ref.iloc[i], got[i][name]
            if isinstance(rv, (bool, np.bool_)):
                assert gv == bool(rv), (name, i, str(ts[i]), gv, rv)
            elif isinstance(rv, (int, np.integer)):
                assert gv == int(rv), (name, i, str(ts[i]), gv, rv)
            else:
                assert gv == rv, (name, i, str(ts[i]), gv, rv)


def test_groupby_agg_all_nan_group_identities(spark):
    """pandas min_count=0 identities (r6 fuzz catch): an all-NaN group
    sums to 0.0 and products to 1.0 — SQL SUM/PRODUCT give NULL."""
    from parallel_pandas_spark.operators import grouped

    pdf = pd.DataFrame({"g": [1, 1, 2, 3], "v": [np.nan, np.nan, 5.0, np.nan]})
    got = (
        grouped.groupby_agg(
            from_pandas(spark, pdf), ["g"],
            {"v": ["sum", "prod", "count", "mean", "std"]},
        )
        .toPandas().set_index("g")
    )
    ref = pdf.groupby("g").agg({"v": ["sum", "prod", "count", "mean", "std"]})
    for g in (1, 2, 3):
        for stat in ("sum", "prod", "count", "mean", "std"):
            _eq(got.loc[g, f"v_{stat}"], ref.loc[g, ("v", stat)], ctx=(g, stat))
