"""Regression tests for the round-6 advisor findings (ADVICE.md r7).

1. queryexpr `_lit` must escape backslashes — the session parser runs
   with escapedStringLiterals=false, so an unescaped '\\' becomes a
   C-style escape (silently wrong matches) and a trailing '\\' eats the
   closing quote (PARSE_SYNTAX_ERROR).
2. crosstab must drop NULL keys on both axes (pandas NaN behavior) so
   normalize='index' rows sum to 1.
3. rolling_time over an INTEGER epoch column must demand an explicit
   epoch_unit instead of silently guessing microseconds.
4. p_resample(asfreq=True, closed=, label=) must accept and honor the
   binning kwargs.
"""

import numpy as np
import pandas as pd
import pytest

from parallel_pandas_spark.api import ParallelFrame
from parallel_pandas_spark.functions.queryexpr import to_sql
from parallel_pandas_spark.operators import reshape, windows


def _from_pandas(spark, pdf):
    return spark.createDataFrame(pdf)


def test_query_backslash_literals(spark):
    pdf = pd.DataFrame({"s": ["a\\b", "plain", "tail\\"], "v": [1, 2, 3]})
    df = _from_pandas(spark, pdf)

    got = ParallelFrame(df).p_query("s == @x", env={"x": "a\\b"}).df.collect()
    assert [r["v"] for r in got] == [1]

    # trailing backslash: must not PARSE_SYNTAX_ERROR, must match
    got = ParallelFrame(df).p_query("s == @x", env={"x": "tail\\"}).df.collect()
    assert [r["v"] for r in got] == [3]

    # pandas twins for the inline-literal forms: `'a\b'` decodes as a
    # BACKSPACE under Python/pandas semantics (matches nothing here);
    # `'a\\b'` is the literal backslash. Our AST path inherits both.
    for expr, expect in ((r"s == 'a\b'", []), ("s == 'a\\\\b'", [1])):
        sql = to_sql(expr)
        got = [r["v"] for r in df.where(sql).collect()]
        exp = pdf.query(expr)["v"].tolist()
        assert got == exp == expect, expr


def test_crosstab_drops_null_keys_and_normalizes(spark):
    pdf = pd.DataFrame(
        {
            "r": ["x", "x", "y", None, "x"],
            "c": ["a", "b", "a", "a", None],
        }
    )
    df = _from_pandas(spark, pdf)
    out = reshape.crosstab(df, "r", "c").toPandas().set_index("r").sort_index()
    exp = pd.crosstab(pdf["r"], pdf["c"]).sort_index()
    assert sorted(out.columns) == sorted(exp.columns)
    for col in exp.columns:
        assert out[col].tolist() == exp[col].tolist(), col
    assert None not in out.index and "null" not in out.columns

    norm = (
        reshape.crosstab(df, "r", "c", normalize="index")
        .toPandas()
        .set_index("r")
        .sort_index()
    )
    sums = norm.sum(axis=1)
    assert np.allclose(sums.values, 1.0), sums


def test_rolling_time_integer_epoch_requires_unit(spark):
    pdf = pd.DataFrame({"ep": [0, 1_000_000, 2_000_000], "v": [1.0, 2.0, 3.0]})
    df = _from_pandas(spark, pdf)
    with pytest.raises(ValueError, match="epoch_unit"):
        windows.rolling_time(df, ["v"], 10, "ep", funcs=("sum",))

    # epoch seconds vs microseconds give the declared window width
    r_us = windows.rolling_time(
        df, ["v"], 2, "ep", funcs=("count",), epoch_unit="us"
    ).collect()
    # 2-second window over values 0s, 1s, 2s
    by_ep = {row["ep"]: row["v_roll_count"] for row in r_us}
    assert by_ep == {0: 1, 1_000_000: 2, 2_000_000: 2}

    pdf_s = pd.DataFrame({"ep": [0, 1, 2], "v": [1.0, 2.0, 3.0]})
    r_s = windows.rolling_time(
        _from_pandas(spark, pdf_s), ["v"], 2, "ep", funcs=("count",), epoch_unit="s"
    ).collect()
    by_ep = {row["ep"]: row["v_roll_count"] for row in r_s}
    assert by_ep == {0: 1, 1: 2, 2: 2}


def test_resample_asfreq_closed_label(spark):
    from pyspark.sql import functions as F

    ts = pd.to_datetime(
        ["2024-01-01 00:00:00", "2024-01-01 00:10:00", "2024-01-01 00:30:00"]
    )
    pdf = pd.DataFrame({"ts": ts, "v": [1.0, 2.0, 4.0]})
    df = _from_pandas(spark, pdf)

    out = (
        ParallelFrame(df)
        .p_resample(
            "ts", "10min", [F.sum("v").alias("v")],
            asfreq=True, fill_cols=("v",),
            closed="right", label="right",
        )
        .df.orderBy("bin")
        .toPandas()
    )
    exp = (
        pdf.set_index("ts")["v"]
        .resample("10min", closed="right", label="right")
        .sum(min_count=1)
        .ffill()
    )
    assert out["bin"].tolist() == list(exp.index)
    assert out["v"].tolist() == exp.tolist()


def test_bloom_anti_join_single_seen_scan(spark):
    """r6 verdict #5: the bucket set feeds two broadcast joins; it must be
    materialized once (localCheckpoint) so the returned plan holds exactly
    ONE scan of the seen relation (the exact-key anti-join side)."""
    import tempfile

    from parallel_pandas_spark.operators import dedup as dd
    from parallel_pandas_spark.plans.explain import explain_str

    with tempfile.TemporaryDirectory() as d:
        seen_p = f"{d}/seen.parquet"
        spark.range(200).selectExpr("id * 3 AS k").write.parquet(seen_p)
        seen = spark.read.parquet(seen_p)
        new = spark.range(1000).selectExpr("id AS k", "id AS tag")
        out = dd.bloom_anti_join(new, seen, "k")
        plan = explain_str(out)
        assert plan.count("seen.parquet") == 1, plan
        # result still exact
        want = sorted(
            r["tag"] for r in new.join(seen.distinct(), "k", "left_anti").collect()
        )
        got = sorted(r["tag"] for r in out.collect())
        assert got == want


def test_win_type_tail_shapes():
    """r6 verdict #6: kaiser/parzen/bohman/blackmanharris closed forms.
    kaiser twins against numpy.kaiser (same I0-series definition scipy
    uses); the other three against hand-derived values of the published
    scipy formulas."""
    from parallel_pandas_spark.operators.windows import win_type_weights as w

    for m, beta in ((5, 6.0), (9, 6.0), (12, 14.0), (2, 0.5)):
        assert np.allclose(w("kaiser", m, beta=beta), np.kaiser(m, beta))

    # parzen(4): n = ±0.5 -> 1 - 6(.25)^2 + 6(.25)^3 = 0.71875;
    #            n = ±1.5 -> 2(1 - 0.75)^3 = 0.03125
    assert np.allclose(w("parzen", 4), [0.03125, 0.71875, 0.71875, 0.03125])
    # bohman(7): x = 2/3 -> (1/3)cos(2π/3) + sin(2π/3)/π; x = 1/3 sym.
    import math

    b23 = (1 / 3) * math.cos(2 * math.pi / 3) + math.sin(2 * math.pi / 3) / math.pi
    b13 = (2 / 3) * math.cos(math.pi / 3) + math.sin(math.pi / 3) / math.pi
    assert np.allclose(w("bohman", 7), [0.0, b23, b13, 1.0, b13, b23, 0.0])
    # blackmanharris(5): published 4-term coefficients at n/(M-1) = 0,.25,.5
    e0 = 0.35875 - 0.48829 + 0.14128 - 0.01168
    e1 = 0.35875 - 0.14128
    assert np.allclose(w("blackmanharris", 5), [e0, e1, 1.0, e1, e0])

    # every shape is symmetric and peaks at the center
    for wt, kw in (("kaiser", {"beta": 6.0}), ("parzen", {}), ("bohman", {}),
                   ("blackmanharris", {}), ("gaussian", {"std": 1.0})):
        ws = w(wt, 9, **kw)
        assert np.allclose(ws, ws[::-1]), wt
        assert max(ws) == ws[4], wt


def test_rolling_agg_list_and_str_spec(spark):
    """pandas Rolling.agg also takes a bare string or list applied to
    every numeric value column — parity for the non-dict spec forms."""
    import pandas as pd

    from parallel_pandas_spark.api import ParallelFrame

    pdf = pd.DataFrame(
        {"i": range(12), "v": [float(x * x % 7) for x in range(12)],
         "u": [float(x % 5) for x in range(12)]}
    )
    df = spark.createDataFrame(pdf)

    out = (
        ParallelFrame(df).rolling(3, ["i"]).p_agg(["mean", "max"])
        .orderBy("i").toPandas()
    )
    ref = pdf.set_index("i").rolling(3).agg(["mean", "max"])
    for c in ("v", "u"):
        for stat in ("mean", "max"):
            got = out[f"{c}_roll_{stat}"].tolist()
            want = ref[(c, stat)].tolist()
            for g, w in zip(got, want):
                g_null = g is None or (isinstance(g, float) and np.isnan(g))
                assert (g_null and np.isnan(w)) or g == w, (c, stat, g, w)

    es = (
        ParallelFrame(df).expanding(["i"]).p_agg("sum")
        .orderBy("i").toPandas()
    )
    ref2 = pdf.set_index("i").expanding(1).agg("sum")
    assert es["v_exp_sum"].tolist() == ref2["v"].tolist()
    assert es["u_exp_sum"].tolist() == ref2["u"].tolist()
