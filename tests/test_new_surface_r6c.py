"""Round-6c parity surface: reshape (melt/crosstab/get_dummies),
binning (cut/qcut), time resampling (closed/label downsample +
asfreq+ffill grid), gap interpolation, and the pairwise covariance
matrix — each locked by a randomized differential twin against real
pandas (the highest-yield QA technique of rounds 5-6)."""

import numpy as np
import pandas as pd
import pytest

from parallel_pandas_spark.api import ParallelFrame
from parallel_pandas_spark.operators import ordered, reductions, resample, reshape


def _mk(seed: int, n: int = 300) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    x = rng.normal(10.0, 4.0, n)
    y = rng.exponential(2.0, n)
    x[rng.random(n) < 0.15] = np.nan
    y[rng.random(n) < 0.10] = np.nan
    return pd.DataFrame(
        {
            "ord": np.arange(n, dtype=np.int64),
            "grp": rng.choice(list("abcd"), n),
            "cat": rng.choice(["u", "v", "w"], n),
            "x": x,
            "y": y,
        }
    )


# ---------------------------------------------------------------- reshape --
def test_melt_matches_pandas(spark):
    pdf = _mk(1, 50)
    sdf = spark.createDataFrame(pdf)
    got = (
        reshape.melt(sdf, ["ord", "grp"], ["x", "y"])
        .toPandas()
        .sort_values(["ord", "variable"])
        .reset_index(drop=True)
    )
    want = (
        pdf.melt(id_vars=["ord", "grp"], value_vars=["x", "y"])
        .sort_values(["ord", "variable"])
        .reset_index(drop=True)
    )
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.parametrize("normalize", [False, "index", "all"])
def test_crosstab_matches_pandas(spark, normalize):
    pdf = _mk(2)
    sdf = spark.createDataFrame(pdf)
    got = (
        reshape.crosstab(sdf, "grp", "cat", values=["u", "v", "w"],
                         normalize=normalize)
        .toPandas()
        .sort_values("grp")
        .set_index("grp")
    )
    want = pd.crosstab(pdf["grp"], pdf["cat"],
                       normalize=normalize or False).sort_index()
    np.testing.assert_allclose(
        got[["u", "v", "w"]].to_numpy(dtype=float),
        want[["u", "v", "w"]].to_numpy(dtype=float),
        rtol=1e-12, err_msg=f"normalize={normalize}",
    )


def test_get_dummies_matches_pandas(spark):
    pdf = _mk(3, 80)
    pdf.loc[::9, "cat"] = None
    sdf = spark.createDataFrame(pdf)
    got = (
        reshape.get_dummies(sdf, ["grp", "cat"], dummy_na=True)
        .toPandas()
        .sort_values("ord")
        .reset_index(drop=True)
    )
    want = pd.get_dummies(pdf, columns=["grp", "cat"], dummy_na=True,
                          prefix_sep="_", dtype=np.int64)
    want = want.rename(columns={c: c.replace("_nan", "_nan") for c in want.columns})
    want = want.sort_values("ord").reset_index(drop=True)
    dummy_cols = [c for c in want.columns if c.startswith(("grp_", "cat_"))]
    for c in dummy_cols:
        assert c in got.columns, f"missing dummy column {c}"
        np.testing.assert_array_equal(
            got[c].to_numpy(dtype=np.int64), want[c].to_numpy(dtype=np.int64),
            err_msg=c,
        )


# ---------------------------------------------------------------- binning --
@pytest.mark.parametrize("seed", [21, 22])
@pytest.mark.parametrize("right,include_lowest", [(True, False), (True, True),
                                                  (False, False)])
def test_cut_codes_match_pandas(spark, seed, right, include_lowest):
    pdf = _mk(seed)
    sdf = spark.createDataFrame(pdf)
    edges = [0.0, 5.0, 10.0, 15.0, 30.0]
    got = (
        reshape.cut(sdf, "x", edges, labels=False, right=right,
                    include_lowest=include_lowest)
        .toPandas().sort_values("ord")["x_bin"]
    )
    want = pd.cut(pdf.sort_values("ord")["x"], edges, labels=False,
                  right=right, include_lowest=include_lowest)
    # pandas returns float codes (NaN for out-of-range); align on nullable
    np.testing.assert_array_equal(
        got.to_numpy(dtype=float), want.to_numpy(dtype=float),
        err_msg=f"right={right} il={include_lowest}",
    )


@pytest.mark.parametrize("seed", [31, 32])
@pytest.mark.parametrize("q", [4, 10])
def test_qcut_codes_match_pandas(spark, seed, q):
    pdf = _mk(seed)
    sdf = spark.createDataFrame(pdf)
    got = (
        reshape.qcut(sdf, "x", q, labels=False)
        .toPandas().sort_values("ord")["x_qbin"]
    )
    want = pd.qcut(pdf.sort_values("ord")["x"], q, labels=False)
    np.testing.assert_array_equal(
        got.to_numpy(dtype=float), want.to_numpy(dtype=float),
        err_msg=f"q={q} seed={seed}",
    )


def test_qcut_duplicate_edges(spark):
    pdf = pd.DataFrame({"ord": range(40), "x": [1.0] * 30 + list(range(10))})
    sdf = spark.createDataFrame(pdf)
    with pytest.raises(ValueError, match="not unique"):
        reshape.qcut(sdf, "x", 4, labels=False)
    got = reshape.qcut(sdf, "x", 4, labels=False, duplicates="drop")
    assert got.count() == 40


# -------------------------------------------------------------- resample --
def _mk_ts(seed: int, n: int = 200) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    # irregular timestamps incl. exact bin-edge hits (minute-aligned)
    secs = np.sort(rng.integers(0, 6 * 3600, n))
    secs[: n // 5] = (secs[: n // 5] // 900) * 900  # force edge collisions
    ts = pd.Timestamp("2024-03-01") + pd.to_timedelta(np.sort(secs), unit="s")
    return pd.DataFrame(
        {"ts": ts, "grp": rng.choice(["g1", "g2"], n),
         "v": rng.normal(0, 5, n)}
    )


@pytest.mark.parametrize("seed", [41, 42])
@pytest.mark.parametrize("closed,label", [("left", "left"), ("right", "right"),
                                          ("left", "right")])
def test_resample_agg_matches_pandas(spark, seed, closed, label):
    from pyspark.sql import functions as F

    pdf = _mk_ts(seed)
    sdf = spark.createDataFrame(pdf)
    got = (
        resample.resample_agg(
            sdf, "ts", "15min",
            [F.sum("v").alias("v_sum"), F.count("v").alias("n")],
            closed=closed, label=label,
        )
        .toPandas().sort_values("bin").reset_index(drop=True)
    )
    want = (
        pdf.set_index("ts")["v"]
        .resample("15min", closed=closed, label=label)
        .agg(["sum", "count"])
    )
    want = want[want["count"] > 0]  # ours emits only non-empty bins
    np.testing.assert_array_equal(
        got["bin"].to_numpy(), want.index.to_numpy(),
        err_msg=f"bin labels closed={closed} label={label}",
    )
    np.testing.assert_allclose(got["v_sum"].to_numpy(),
                               want["sum"].to_numpy(), rtol=1e-12)
    np.testing.assert_array_equal(got["n"].to_numpy(), want["count"].to_numpy())


def test_resample_asfreq_ffill_matches_pandas(spark):
    from pyspark.sql import functions as F

    pdf = _mk_ts(43)
    # knock out a band of rows to create empty bins mid-range
    pdf = pdf[(pdf.ts < "2024-03-01 01:00") | (pdf.ts > "2024-03-01 03:30")]
    sdf = spark.createDataFrame(pdf)
    got = (
        resample.resample_asfreq(
            sdf, "ts", "15min", [F.mean("v").alias("v_mean")],
            fill_cols=["v_mean"],
        )
        .toPandas().sort_values("bin").reset_index(drop=True)
    )
    want = pdf.set_index("ts")["v"].resample("15min").mean().ffill()
    np.testing.assert_array_equal(got["bin"].to_numpy(), want.index.to_numpy())
    np.testing.assert_allclose(got["v_mean"].to_numpy(), want.to_numpy(),
                               rtol=1e-12)


# ----------------------------------------------------------- interpolate --
@pytest.mark.parametrize("seed", [51, 52, 53])
@pytest.mark.parametrize("method,limit", [("linear", None), ("linear", 2),
                                          ("values", None)])
def test_interpolate_matches_pandas(spark, seed, method, limit):
    rng = np.random.default_rng(seed)
    n = 250
    v = rng.normal(0, 3, n)
    v[rng.random(n) < 0.35] = np.nan
    v[:3] = np.nan  # leading gap
    v[-4:] = np.nan  # trailing gap
    pos = np.sort(rng.choice(np.arange(0, 4 * n), n, replace=False)).astype(
        np.float64
    )
    pdf = pd.DataFrame({"ord": pos, "v": v})
    sdf = spark.createDataFrame(pdf)
    got = (
        ordered.interpolate(sdf, ["v"], ["ord"], method=method, limit=limit)
        .toPandas().sort_values("ord")["v_interp"].to_numpy()
    )
    pm = "index" if method == "values" else "linear"
    want = (
        pdf.set_index("ord")["v"]
        .interpolate(method=pm, limit=limit, limit_direction="forward")
        .to_numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12,
                               err_msg=f"m={method} limit={limit} seed={seed}")


def test_interpolate_grouped(spark):
    """Per-group interpolation is independent across partitions."""
    pdf = pd.DataFrame(
        {
            "g": ["a"] * 5 + ["b"] * 5,
            "ord": list(range(5)) * 2,
            "v": [1.0, np.nan, 3.0, np.nan, np.nan, 10.0, np.nan, np.nan, 40.0, 50.0],
        }
    )
    sdf = spark.createDataFrame(pdf)
    got = (
        ordered.interpolate(sdf, ["v"], ["ord"], partition_by=["g"])
        .toPandas().sort_values(["g", "ord"])["v_interp"].to_numpy()
    )
    want = (
        pdf.groupby("g")["v"]
        .apply(lambda s: s.interpolate(limit_direction="forward"))
        .to_numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-12)


# ------------------------------------------------------------ cov matrix --
@pytest.mark.parametrize("seed", [61, 62])
@pytest.mark.parametrize("ddof", [1, 0, 2])
def test_cov_matrix_matches_pandas(spark, seed, ddof):
    """ddof=1 (+NaNs) matches pandas exactly; general ddof matches the
    pairwise-complete np.cov generalization — pandas' nancorr path
    silently ignores ddof with NaNs present (documented divergence,
    cov_matrix docstring)."""
    pdf = _mk(seed)
    sdf = spark.createDataFrame(pdf)
    got = reductions.cov_matrix(sdf, ["x", "y"], ddof=ddof).toPandas()
    if ddof == 1:
        want = pdf[["x", "y"]].cov(ddof=1)
        ref = lambda a, b: want.loc[a, b]  # noqa: E731
    else:
        def ref(a, b):
            va, vb = pdf[a].to_numpy(), pdf[b].to_numpy()
            m = ~(np.isnan(va) | np.isnan(vb))
            return np.cov(va[m], vb[m], ddof=ddof)[0, 1]
    for _, r in got.iterrows():
        np.testing.assert_allclose(
            r["cov"], ref(r["col_x"], r["col_y"]), rtol=1e-10,
            err_msg=f"pair=({r['col_x']},{r['col_y']}) ddof={ddof}",
        )
    assert len(got) == 3  # (x,x), (x,y), (y,y)


def test_cov_matrix_dense_honors_ddof_like_pandas(spark):
    """No-NaN frame: pandas' dense path applies ddof — ours matches it
    for every ddof."""
    rng = np.random.default_rng(64)
    pdf = pd.DataFrame({"x": rng.normal(0, 1, 120), "y": rng.normal(2, 3, 120)})
    sdf = spark.createDataFrame(pdf)
    for ddof in (0, 1, 2):
        got = reductions.cov_matrix(sdf, ["x", "y"], ddof=ddof).toPandas()
        want = pdf.cov(ddof=ddof)
        for _, r in got.iterrows():
            np.testing.assert_allclose(
                r["cov"], want.loc[r["col_x"], r["col_y"]], rtol=1e-12,
                err_msg=f"dense ddof={ddof}",
            )


def test_cov_matrix_min_periods(spark):
    pdf = _mk(63, 40)
    pdf.loc[5:, "y"] = np.nan  # only rows 0-4 complete for (x,y)
    sdf = spark.createDataFrame(pdf)
    got = reductions.cov_matrix(sdf, ["x", "y"], min_periods=10).toPandas()
    xy = got[(got.col_x == "x") & (got.col_y == "y")]["cov"].iloc[0]
    assert xy is None or (isinstance(xy, float) and np.isnan(xy))
    want = pdf[["x", "y"]].cov(min_periods=10)
    assert np.isnan(want.loc["x", "y"])


# ------------------------------------------------------------- API layer --
def test_api_exposes_r6c_surface(spark):
    pdf = _mk(71, 60)
    pf = ParallelFrame(spark.createDataFrame(pdf))
    assert pf.p_melt(["ord"], ["x", "y"]).df.count() == 120
    assert "u" in pf.p_crosstab("grp", "cat", values=["u", "v", "w"]).df.columns
    assert any(c.startswith("grp_") for c in pf.p_get_dummies(["grp"]).df.columns)
    assert "x_bin" in pf.p_cut("x", [0, 10, 20]).df.columns
    assert "x_qbin" in pf.p_qcut("x", 4, duplicates="drop").df.columns
    assert "v_interp" in ParallelFrame(
        spark.createDataFrame(pd.DataFrame({"o": [1, 2, 3], "v": [1.0, None, 3.0]}))
    ).p_interpolate(["v"], ["o"]).df.columns
    assert pf.p_cov(["x", "y"]).count() == 3
    from pyspark.sql import functions as F

    ts = _mk_ts(72, 50)
    rf = ParallelFrame(spark.createDataFrame(ts))
    assert "bin" in rf.p_resample("ts", "1h", [F.count("v").alias("n")]).df.columns


# ------------------------------------------------------------ rank_multi --
@pytest.mark.parametrize("seed", [81, 82, 83])
def test_rank_multi_matches_pandas_and_single_rank(spark, seed):
    """The fused single-sort family agrees with pandas for every method,
    pct, and na_option over NaN-bearing grouped data."""
    rng = np.random.default_rng(seed)
    n = 400
    v = rng.choice([1.0, 2.5, 2.5, 7.0, np.nan, 11.0], n)  # heavy ties + NaN
    pdf = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], n),
            "ok": np.arange(n, dtype=np.int64),
            "v": v,
        }
    )
    sdf = spark.createDataFrame(pdf)
    specs = [
        {"method": "average", "out_col": "r_avg"},
        {"method": "min", "out_col": "r_min"},
        {"method": "max", "out_col": "r_max"},
        {"method": "first", "out_col": "r_first"},
        {"method": "dense", "out_col": "r_dense"},
        {"method": "average", "pct": True, "out_col": "r_pct"},
        {"method": "min", "na_option": "top", "out_col": "r_natop"},
        {"method": "average", "na_option": "bottom", "pct": True,
         "out_col": "r_nabot"},
    ]
    got = (
        ordered.rank_multi(sdf, "v", specs, partition_by=["g"],
                           tie_break=["ok"])
        .toPandas().sort_values("ok").reset_index(drop=True)
    )
    g = pdf.sort_values("ok").reset_index(drop=True).groupby("g")["v"]
    for out_col, kw in [
        ("r_avg", dict(method="average")),
        ("r_min", dict(method="min")),
        ("r_max", dict(method="max")),
        ("r_first", dict(method="first")),
        ("r_dense", dict(method="dense")),
        ("r_pct", dict(method="average", pct=True)),
        ("r_natop", dict(method="min", na_option="top")),
        ("r_nabot", dict(method="average", na_option="bottom", pct=True)),
    ]:
        want = g.rank(**kw).to_numpy()
        np.testing.assert_allclose(
            got[out_col].to_numpy(), want, rtol=1e-12,
            err_msg=f"{out_col} seed={seed}",
        )


def test_rank_multi_single_sort_plan(spark):
    """The whole 8-variant family plans exactly ONE Exchange + ONE Sort."""
    import re
    from collections import Counter

    pdf = pd.DataFrame({"g": ["a", "b"] * 50, "ok": range(100),
                        "v": [float(i % 7) for i in range(100)]})
    sdf = spark.createDataFrame(pdf)
    specs = [
        {"method": m, "out_col": f"r_{m}"}
        for m in ("average", "min", "max", "first", "dense")
    ] + [{"method": "average", "pct": True, "out_col": "r_pct"}]
    df = ordered.rank_multi(sdf, "v", specs, partition_by=["g"],
                            tie_break=["ok"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    counts = Counter(re.findall(r"^[\s+\-:*]*(\w+)", plan, re.M))
    assert counts["Sort"] == 1, plan
    assert counts["Exchange"] == 1, plan


# ------------------------------------------------------------- scan_multi --
@pytest.mark.parametrize("seed", [91, 92])
def test_scan_multi_matches_standalone_kernels_and_pandas(spark, seed):
    rng = np.random.default_rng(seed)
    n = 300
    v = rng.normal(5, 2, n)
    v[rng.random(n) < 0.2] = np.nan
    pdf = pd.DataFrame(
        {"g": rng.choice(["a", "b"], n), "ord": np.arange(n, dtype=np.int64),
         "v": v}
    )
    sdf = spark.createDataFrame(pdf)
    out = (
        ordered.scan_multi(
            sdf,
            [
                {"op": "cumsum", "col": "v", "out": "cs"},
                {"op": "cummax", "col": "v", "out": "cm"},
                {"op": "shift", "col": "v", "out": "sh"},
                {"op": "diff", "col": "v", "out": "df1"},
                {"op": "diff", "col": "v", "periods": -2, "out": "dfm2"},
                {"op": "ffill", "col": "v", "out": "ff"},
                {"op": "ffill", "col": "v", "limit": 1, "out": "ffl"},
                {"op": "bfill", "col": "v", "out": "bf"},
            ],
            ["ord"], partition_by=["g"],
        )
        .toPandas().sort_values(["g", "ord"]).reset_index(drop=True)
    )
    g = pdf.sort_values(["g", "ord"]).reset_index(drop=True).groupby("g")["v"]
    checks = {
        "cs": g.cumsum(), "cm": g.cummax(), "sh": g.shift(1),
        "df1": g.diff(1), "dfm2": g.diff(-2),
        "ff": g.ffill(), "ffl": g.ffill(limit=1), "bf": g.bfill(),
    }
    for name, want in checks.items():
        np.testing.assert_allclose(
            out[name].to_numpy(dtype=float), want.to_numpy(dtype=float),
            rtol=1e-12, err_msg=f"{name} seed={seed}",
        )


def test_scan_multi_single_window_node(spark):
    import re
    from collections import Counter

    pdf = pd.DataFrame({"g": ["a", "b"] * 40, "ord": range(80),
                        "v": [float(i) for i in range(80)]})
    df = ordered.scan_multi(
        spark.createDataFrame(pdf),
        [
            {"op": "cumsum", "col": "v", "out": "cs"},
            {"op": "cummin", "col": "v", "out": "cmn"},
            {"op": "shift", "col": "v", "out": "sh"},
            {"op": "pct_change", "col": "v", "out": "pc"},
            {"op": "ffill", "col": "v", "out": "ff"},
        ],
        ["ord"], partition_by=["g"],
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    counts = Counter(re.findall(r"^[\s+\-:*]*(\w+)", plan, re.M))
    assert counts["Window"] == 1, plan
    assert counts["Sort"] == 1 and counts["Exchange"] == 1, plan
