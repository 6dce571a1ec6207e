"""Round-4 API additions vs pandas itself: win_type scipy-shape weights
(reference ParallelWindow win_type=, parallel_window.py:206-213), Series
p_map with a Series argument (parallel_series.py:47-68), p_corr callable
method + min_periods (parallel_dataframe.py:186-231), and the sampled
kendall routed through the distributed exact kernel."""

from __future__ import annotations

import math
import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from parallel_pandas_spark.operators import (  # noqa: E402
    elementwise,
    reductions,
    windows,
)
from parallel_pandas_spark.sources import from_pandas  # noqa: E402


# --- win_type shape table -------------------------------------------------
# expected values are scipy.signal.get_window(name, M, fftbins=False)
# (= what pandas rolling(win_type=...) feeds the weighted kernel),
# precomputed so the suite has no scipy dependency.


def test_win_type_gaussian_closed_form():
    w = windows.win_type_weights("gaussian", 5, std=1.0)
    exp = [math.exp(-0.5 * (i - 2.0) ** 2) for i in range(5)]
    assert w == pytest.approx(exp, abs=0)
    assert w[0] == w[4] and w[1] == w[3] and w[2] == 1.0


@pytest.mark.parametrize(
    "name,M,expected",
    [
        ("triang", 5, [1 / 3, 2 / 3, 1.0, 2 / 3, 1 / 3]),
        ("triang", 4, [0.25, 0.75, 0.75, 0.25]),
        ("bartlett", 5, [0.0, 0.5, 1.0, 0.5, 0.0]),
        ("hamming", 5, [0.08, 0.54, 1.0, 0.54, 0.08]),
        ("hann", 5, [0.0, 0.5, 1.0, 0.5, 0.0]),
        ("blackman", 5, [-1.3877787807814457e-17, 0.34, 1.0, 0.34, -1.3877787807814457e-17]),
    ],
)
def test_win_type_shapes_match_scipy_values(name, M, expected):
    assert windows.win_type_weights(name, M) == pytest.approx(expected, abs=1e-12)


def test_win_type_window_one_and_errors():
    assert windows.win_type_weights("hamming", 1) == [1.0]
    # the full scipy catalog is closed-form as of r8; unknown names raise
    # with the supported set spelled out
    with pytest.raises(ValueError, match="supported"):
        windows.win_type_weights("no_such_window", 5)


def test_weighted_window_gaussian_matches_pandas_dot(spark):
    rng = np.random.default_rng(42)
    pdf = pd.DataFrame(
        {
            "g": ["a"] * 30 + ["b"] * 30,
            "i": list(range(30)) * 2,
            "v": rng.normal(10, 3, 60).round(3),
        }
    )
    w = windows.win_type_weights("gaussian", 5, std=1.0)
    out = (
        windows.weighted_window(
            from_pandas(spark, pdf), "v", 5, w, ["i"], ["g"], func="mean"
        )
        .select("g", "i", "v_wmean")
        .toPandas()
        .sort_values(["g", "i"])
        .reset_index(drop=True)
    )
    arr = np.asarray(w)
    for g in ("a", "b"):
        v = pdf[pdf.g == g]["v"].to_numpy()
        got = out[out.g == g]["v_wmean"].to_numpy()
        assert np.isnan(got[:4]).all()  # < window rows
        for i in range(4, 30):
            exp = float(np.dot(v[i - 4 : i + 1], arr) / arr.sum())
            assert got[i] == pytest.approx(exp, rel=1e-12)


# --- Series.p_map(Series) -------------------------------------------------


def test_map_series_lookup_null_and_unmatched(spark):
    df = from_pandas(
        spark,
        pd.DataFrame({"id": [1, 2, 3, 4], "k": pd.array([10, 20, 99, None], dtype="Int64")}),
    )
    lk = from_pandas(
        spark, pd.DataFrame({"key": [10, 20, 30], "val": ["x", "y", "z"]})
    )
    out = {
        r["id"]: r["k_mapped"]
        for r in elementwise.map_series(df, "k", lk, "key", "val").collect()
    }
    # matches pandas: s.map(lookup_series) -> value, NaN for missing/NaN key
    assert out == {1: "x", 2: "y", 3: None, 4: None}


# --- p_corr callable + min_periods ---------------------------------------


def _corr_pdf():
    rng = np.random.default_rng(0)
    pdf = pd.DataFrame(rng.normal(size=(200, 3)), columns=["a", "b", "c"])
    pdf.loc[rng.choice(200, 40, replace=False), "b"] = np.nan
    return pdf


def test_corr_matrix_callable_matches_pandas(spark):
    pdf = _corr_pdf()

    def cb(x, y):
        return float(np.corrcoef(x, y)[0, 1])

    got = {
        (r["col_x"], r["col_y"]): r["corr"]
        for r in reductions.corr_matrix(
            from_pandas(spark, pdf), ["a", "b", "c"], method=cb
        ).collect()
    }
    ref = pdf.corr(method="pearson")  # pairwise-complete, same as callable path
    for (x, y), v in got.items():
        assert v == pytest.approx(ref.loc[x, y], abs=1e-12)


def test_corr_matrix_min_periods_guard(spark):
    pdf = _corr_pdf()
    df = from_pandas(spark, pdf)
    # b has 160 complete rows; threshold between 160 and 200 nulls only
    # the pairs involving b — native and callable paths agree with pandas
    ref = pdf.corr(method="pearson", min_periods=180)
    for method in ("pearson", lambda x, y: float(np.corrcoef(x, y)[0, 1])):
        got = {
            (r["col_x"], r["col_y"]): r["corr"]
            for r in reductions.corr_matrix(
                df, ["a", "b", "c"], method=method, min_periods=180
            ).collect()
        }
        for (x, y), v in got.items():
            rv = ref.loc[x, y]
            if math.isnan(rv):
                assert v is None or math.isnan(v)
            else:
                assert v == pytest.approx(rv, abs=1e-12)
    assert math.isnan(ref.loc["a", "b"])  # the guard actually fired


# --- sampled kendall through the exact kernel -----------------------------


def _brute_tau_b(x: np.ndarray, y: np.ndarray) -> float:
    """O(n²) τ-b reference (pandas' kendall needs scipy, absent here)."""
    n = len(x)
    sx = np.sign(x[:, None] - x[None, :])
    sy = np.sign(y[:, None] - y[None, :])
    upper = np.triu(np.ones((n, n), dtype=bool), 1)
    s = sx * sy
    conc = int(((s > 0) & upper).sum())
    disc = int(((s < 0) & upper).sum())
    n0 = n * (n - 1) // 2
    n1 = sum(c * (c - 1) // 2 for c in pd.Series(x).value_counts())
    n2 = sum(c * (c - 1) // 2 for c in pd.Series(y).value_counts())
    return (conc - disc) / math.sqrt(float(n0 - n1) * float(n0 - n2))


def test_kendall_tau_sampled_matches_pandas_on_sample(spark):
    rng = np.random.default_rng(7)
    pdf = pd.DataFrame(
        {
            "id": range(500),
            "x": rng.integers(0, 50, 500).astype(float),
            "y": rng.normal(size=500),
        }
    )
    df = from_pandas(spark, pdf)
    row = reductions.kendall_tau(
        df, "x", "y", sample_mod=4, id_cols=["id"], num_buckets=16
    ).first()
    # replay the md5 gate in python to find the surviving rows
    import hashlib

    def gate(v):
        h = hashlib.md5(f"s0:{v}".encode()).hexdigest()[:15]
        return int(h, 16) % 4 == 0

    sub = pdf[pdf["id"].map(gate)]
    assert row["n"] == len(sub)
    ref = _brute_tau_b(sub["x"].to_numpy(), sub["y"].to_numpy())
    assert row["tau"] == pytest.approx(ref, abs=1e-12)


def test_corr_matrix_kendall_method(spark):
    rng = np.random.default_rng(3)
    pdf = pd.DataFrame(
        {
            "a": rng.integers(0, 20, 120).astype(float),
            "b": rng.normal(size=120),
            "c": rng.integers(0, 5, 120).astype(float),
        }
    )
    got = {
        (r["col_x"], r["col_y"]): r["corr"]
        for r in reductions.corr_matrix(
            from_pandas(spark, pdf), ["a", "b", "c"], method="kendall"
        ).collect()
    }
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    for (x, y), v in got.items():
        ref = _brute_tau_b(pdf[x].to_numpy(), pdf[y].to_numpy())
        assert v == pytest.approx(ref, abs=1e-12)


def test_api_p_corr_p_map_win_type(spark):
    from parallel_pandas_spark.api import ParallelFrame

    pdf = pd.DataFrame(
        {"k": [1, 2, 3, 4, 5, 6], "v": [1.0, 3.0, 2.0, 5.0, 4.0, 6.0]}
    )
    pf = ParallelFrame(from_pandas(spark, pdf))
    # p_corr kendall through the API
    row = {
        (r["col_x"], r["col_y"]): r["corr"]
        for r in pf.p_corr(["k", "v"], method="kendall").collect()
    }
    assert row[("k", "v")] == pytest.approx(
        _brute_tau_b(pdf["k"].to_numpy(dtype=float), pdf["v"].to_numpy()), abs=1e-12
    )
    # p_map with a Series-as-DataFrame argument
    lk = from_pandas(spark, pd.DataFrame({"key": [1, 2], "val": ["a", "b"]}))
    mapped = {r["k"]: r["k_mapped"] for r in pf.p_map("k", lk).collect()}
    assert mapped[1] == "a" and mapped[2] == "b" and mapped[3] is None
    # rolling(win_type=) weighted mean
    out = (
        ParallelFrame(
            from_pandas(spark, pd.DataFrame({"g": ["x"] * 6, "i": range(6), "v": range(6)}))
        )
        .rolling(3, ["i"], ["g"], win_type="triang")
        .p_mean("v")
        .toPandas()
        .sort_values("i")
    )
    w = np.array([0.5, 1.0, 0.5])
    exp = float(np.dot(np.array([1.0, 2.0, 3.0]), w) / w.sum())
    assert out["v_wmean"].iloc[3] == pytest.approx(exp, rel=1e-12)


def test_kendall_tau_unsampled_is_exact(spark):
    pdf = pd.DataFrame({"x": [1.0, 2.0, 2.0, 3.0, 5.0], "y": [2.0, 1.0, 4.0, 4.0, 3.0]})
    row = reductions.kendall_tau(from_pandas(spark, pdf), "x", "y").first()
    ref = _brute_tau_b(pdf["x"].to_numpy(), pdf["y"].to_numpy())
    assert row["n"] == 5
    assert row["tau"] == pytest.approx(ref, abs=1e-12)
