"""Round-5 surface: single-pass pair-long corr matrices (callable + keyed
kendall kernel), empty-pair NULL seeding, and the plan-shape guarantee that
the matrix reads its input ONCE regardless of pair count."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as em
from parallel_pandas_spark.operators import reductions
from parallel_pandas_spark.plans import explain
from tests.test_new_surface_r4 import _brute_tau_b

SF = "/root/testdata/sf0.001"


def from_pandas(spark, pdf):
    return spark.createDataFrame(pdf)


def test_corr_matrix_callable_single_input_scan(spark):
    """The pair-long frame is ONE explode over a literal struct array, so
    the physical plan scans the parquet exactly once no matter how many
    pairs the matrix has (the former per-pair union scanned it C(k,2)x)."""
    li = em.load_table(spark, SF, "lineitem")
    df = reductions.corr_matrix(
        li,
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        method=lambda x, y: float(np.corrcoef(x, y)[0, 1]),
    )
    txt = explain.explain_str(df)
    # formatted explain prints each scan node twice (tree + detail section);
    # count the numbered detail headers, one per physical scan node
    import re

    assert len(re.findall(r"\(\d+\) Scan parquet", txt)) == 1, txt


def test_corr_matrix_callable_empty_pair_yields_null_row(spark):
    """A pair with zero pairwise-complete rows must still produce a row
    with NULL corr (pandas: NaN) — r4 dropped the row entirely."""
    pdf = pd.DataFrame(
        {
            "a": [1.0, 2.0, 3.0, 4.0],
            "b": [np.nan] * 4,
            "c": [2.0, 1.0, 4.0, 3.0],
        }
    )
    rows = {
        (r["col_x"], r["col_y"]): r["corr"]
        for r in reductions.corr_matrix(
            from_pandas(spark, pdf),
            ["a", "b", "c"],
            method=lambda x, y: float(np.corrcoef(x, y)[0, 1]),
        ).collect()
    }
    assert set(rows) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert rows[("a", "b")] is None  # NULL, not a missing row
    assert rows[("b", "c")] is None
    assert rows[("a", "c")] == pytest.approx(
        float(np.corrcoef(pdf["a"], pdf["c"])[0, 1]), abs=1e-12
    )


def test_corr_matrix_kendall_multi_kernel_matches_brute(spark):
    """All pairs through ONE keyed kernel invocation — values must equal
    the O(n^2) reference per pair, including heavy-tie columns whose rows
    span many range partitions."""
    rng = np.random.default_rng(11)
    pdf = pd.DataFrame(
        {
            "a": rng.integers(0, 8, 300).astype(float),  # heavy ties
            "b": rng.normal(size=300),
            "c": rng.integers(0, 3, 300).astype(float),  # heavier ties
            "d": np.arange(300, dtype=float),
        }
    )
    got = {
        (r["col_x"], r["col_y"]): r["corr"]
        for r in reductions.corr_matrix(
            from_pandas(spark, pdf), ["a", "b", "c", "d"], method="kendall"
        ).collect()
    }
    assert len(got) == 6
    for (x, y), v in got.items():
        ref = _brute_tau_b(pdf[x].to_numpy(), pdf[y].to_numpy())
        assert v == pytest.approx(ref, abs=1e-12), (x, y)


def test_corr_matrix_kendall_min_periods_and_empty_pair(spark):
    pdf = pd.DataFrame(
        {
            "a": [1.0, 2.0, 3.0, 4.0, 5.0],
            "b": [np.nan] * 5,
            "c": [5.0, 3.0, 4.0, 1.0, 2.0],
        }
    )
    got = {
        (r["col_x"], r["col_y"]): r["corr"]
        for r in reductions.corr_matrix(
            from_pandas(spark, pdf), ["a", "b", "c"], method="kendall", min_periods=3
        ).collect()
    }
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert got[("a", "b")] is None
    assert got[("b", "c")] is None
    assert got[("a", "c")] == pytest.approx(
        _brute_tau_b(pdf["a"].to_numpy(), pdf["c"].to_numpy()), abs=1e-12
    )
    # min_periods above the complete-row count nulls the surviving pair too
    gated = {
        (r["col_x"], r["col_y"]): r["corr"]
        for r in reductions.corr_matrix(
            from_pandas(spark, pdf), ["a", "c"], method="kendall", min_periods=6
        ).collect()
    }
    assert gated[("a", "c")] is None


# --- rank na_option + p_replace regex/limit/method parity ------------------


def test_rank_na_option_matches_pandas(spark):
    from parallel_pandas_spark.operators import ordered

    rng = np.random.default_rng(5)
    pdf = pd.DataFrame(
        {
            "id": range(60),
            "g": rng.integers(0, 3, 60),
            "v": rng.integers(0, 10, 60).astype(float),
        }
    )
    pdf.loc[rng.choice(60, 12, replace=False), "v"] = np.nan
    df = from_pandas(spark, pdf)
    for na_option in ("keep", "top", "bottom"):
        for method, pct in (("min", False), ("average", True), ("dense", False)):
            ref = pdf.groupby("g")["v"].rank(
                method=method, na_option=na_option, pct=pct
            )
            got = {
                r["id"]: r["r"]
                for r in ordered.rank(
                    df, "v", method=method, na_option=na_option, pct=pct,
                    partition_by=["g"], out_col="r", tie_break=["id"],
                ).collect()
            }
            for i in pdf["id"]:
                rv = ref.iloc[i]
                if math.isnan(rv):
                    assert got[i] is None, (na_option, method, i)
                else:
                    assert got[i] == pytest.approx(rv, abs=1e-12), (
                        na_option, method, pct, i,
                    )


def test_rank_na_option_descending(spark):
    from parallel_pandas_spark.operators import ordered

    pdf = pd.DataFrame({"id": range(6), "v": [3.0, np.nan, 1.0, 2.0, np.nan, 1.0]})
    df = from_pandas(spark, pdf)
    for na_option in ("top", "bottom"):
        ref = pdf["v"].rank(method="min", ascending=False, na_option=na_option)
        got = {
            r["id"]: r["r"]
            for r in ordered.rank(
                df, "v", method="min", ascending=False, na_option=na_option,
                partition_by=[], out_col="r", tie_break=["id"],
            ).collect()
        }
        for i in pdf["id"]:
            assert got[i] == pytest.approx(ref.iloc[i], abs=1e-12), (na_option, i)


def test_replace_regex_matches_pandas(spark):
    from parallel_pandas_spark.operators import reductions as red

    pdf = pd.DataFrame(
        {"s": ["foo bar", "bazfoo", "nothing", "foofoo"], "t": ["a1", "b22", "c", "d3"]}
    )
    got = (
        red.replace_values(
            from_pandas(spark, pdf), {"foo": "X", "[0-9]+": "#"}, regex=True
        )
        .orderBy("t")
        .collect()
    )
    ref = pdf.replace({"foo": "X", "[0-9]+": "#"}, regex=True).sort_values("t")
    assert [r["s"] for r in got] == list(ref["s"])
    assert [r["t"] for r in got] == list(ref["t"])


def test_replace_fill_method_limit_matches_pandas(spark):
    from parallel_pandas_spark.operators import reductions as red

    pdf = pd.DataFrame(
        {
            "id": range(8),
            "v": ["a", "X", "X", "b", "X", "X", "X", "c"],
        }
    )
    df = from_pandas(spark, pdf)
    for method, limit in (("ffill", None), ("ffill", 1), ("bfill", None), ("bfill", 2)):
        # pandas equivalent: mask the listed values, then fill with limit
        masked = pdf["v"].where(pdf["v"] != "X")
        ref = masked.ffill(limit=limit) if method == "ffill" else masked.bfill(limit=limit)
        got = {
            r["id"]: r["v"]
            for r in red.replace_fill(
                df, "v", ["X"], method=method, order_by=["id"], limit=limit
            ).collect()
        }
        for i in pdf["id"]:
            rv = ref.iloc[i]
            if isinstance(rv, float) and math.isnan(rv):
                assert got[i] is None, (method, limit, i)
            else:
                assert got[i] == rv, (method, limit, i)
