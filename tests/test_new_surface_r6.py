"""Round-6 surface: rolling ``center=``/``closed=`` ctor-arg parity (the
reference snapshots every pandas window ctor arg and replays it per chunk,
parallel_window.py:91-100), microsecond-exact time-window ``closed``
semantics, describe(percentiles/include/exclude), and
pct_change(fill_method/limit/freq)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from parallel_pandas_spark.operators import windows

SF = "/root/testdata/sf0.001"


def from_pandas(spark, pdf):
    return spark.createDataFrame(pdf)


def _assert_series_match(got_by_key, key_iter, ref_series, colname, ctx):
    for pos, key in enumerate(key_iter):
        rv = ref_series.iloc[pos]
        gv = got_by_key[key][colname]
        if isinstance(rv, float) and math.isnan(rv):
            assert gv is None or (isinstance(gv, float) and math.isnan(gv)), (ctx, key, colname, gv)
        else:
            assert gv == pytest.approx(rv, abs=1e-9), (ctx, key, colname, gv, rv)


def test_fixed_frame_bounds_model():
    """The (start, end) offsets reproduce pandas' FixedWindowIndexer for
    every center × closed combination (empirically pinned, pandas 2.2)."""
    cases = {
        (3, False, "right"): (-2, 0),
        (3, False, "left"): (-3, -1),
        (3, False, "both"): (-3, 0),
        (3, False, "neither"): (-2, -1),
        (3, True, "right"): (-1, 1),
        (4, True, "right"): (-2, 1),
        (4, True, "both"): (-3, 1),
        (6, True, "both"): (-4, 2),
        (1, False, "neither"): (0, -1),  # empty frame
    }
    for (w, c, cl), want in cases.items():
        assert windows.fixed_frame_bounds(w, c, cl) == want, (w, c, cl)
    with pytest.raises(ValueError):
        windows.fixed_frame_bounds(3, False, "bogus")


def test_rolling_center_closed_randomized_vs_pandas(spark):
    """Randomized differential of every center × closed combination of the
    count-window rolling aggregations against pandas itself."""
    rng = np.random.default_rng(66)
    n = 70
    v = rng.normal(size=n).round(3)
    v[rng.choice(n, 8, replace=False)] = np.nan
    pdf = pd.DataFrame({"g": rng.integers(0, 3, n), "i": range(n), "v": v})
    df = from_pandas(spark, pdf)

    for w in (3, 4, 7):
        for center in (False, True):
            for closed in ("right", "left", "both", "neither"):
                r = windows.rolling(
                    df, ["v"], w, ["i"], funcs=("mean", "sum", "count"),
                    partition_by=["g"], min_periods=2,
                    center=center, closed=closed,
                )
                got = {row["i"]: row.asDict() for row in r.collect()}
                for g, grp in pdf.groupby("g"):
                    grp = grp.sort_values("i")
                    roll = grp["v"].rolling(w, min_periods=2, center=center, closed=closed)
                    ctx = (w, center, closed, g)
                    _assert_series_match(got, grp["i"], roll.mean(), "v_roll_mean", ctx)
                    _assert_series_match(got, grp["i"], roll.sum(), "v_roll_sum", ctx)
                    # pandas count ignores min_periods>frame rules the same way
                    _assert_series_match(got, grp["i"], roll.count(), "v_roll_count", ctx)


def test_rolling_time_closed_randomized_vs_pandas(spark):
    """Time-window closed semantics at microsecond resolution, including
    rows that sit EXACTLY window-width apart (the boundary ties that the
    pre-r6 epoch-second frame got wrong: pandas' default closed='right'
    frame is left-open (t−w, t])."""
    rng = np.random.default_rng(67)
    n = 60
    # UNIQUE whole-second offsets: exact w-apart boundary ties across rows
    # (the closed= bug surface) occur constantly, while equal-timestamp
    # rows are excluded — pandas frames duplicate timestamps POSITIONALLY
    # (each dup sees only earlier dups) where a RANGE frame is value-based
    # (all equal-ts peers included); that divergence is documented on
    # rolling_time, not silently asserted away here
    offs = np.sort(rng.choice(np.arange(0, 120), size=n, replace=False))
    ts = pd.Timestamp("2024-01-05 12:00:00") + pd.to_timedelta(offs, unit="s")
    pdf = pd.DataFrame(
        {"i": range(n), "ts": ts, "v": rng.integers(1, 9, n).astype(float)}
    )
    df = from_pandas(spark, pdf)

    for closed in ("right", "left", "both", "neither"):
        r = windows.rolling_time(
            df, ["v"], 10, "ts", funcs=("sum", "count"), closed=closed,
        )
        got = {row["i"]: row.asDict() for row in r.collect()}
        sp = pdf.set_index("ts").sort_index()
        roll = sp["v"].rolling("10s", closed=closed)
        _assert_series_match(got, pdf["i"], roll.sum(), "v_roll_sum", closed)
        _assert_series_match(got, pdf["i"], roll.count(), "v_roll_count", closed)


def test_rolling_center_closed_battery_matches_duckdb(spark):
    """The driver-facing battery arms value-match their DuckDB oracle at
    sf0.001 (same harness shape the driver runs at sf0.01)."""
    import __spark_entry__ as em
    from tests.oracle_harness import compare, duck_connection

    con = duck_connection(SF)
    oracles = em.oracle_sql()
    for name in ("rolling_shapes_battery",):
        problems = compare(name, em.queries()[name](spark, SF), con, oracles[name])
        assert not problems, problems


def test_rolling_weighted_rejects_center_closed(spark):
    from parallel_pandas_spark.api import ParallelFrame

    pdf = pd.DataFrame({"i": range(10), "v": np.arange(10.0)})
    df = from_pandas(spark, pdf)
    roll = ParallelFrame(df).rolling(5, ["i"], win_type="triang", center=True)
    with pytest.raises(NotImplementedError):
        roll.p_mean(["v"])
    roll2 = ParallelFrame(df).rolling(5, ["i"], closed="left")
    with pytest.raises(NotImplementedError):
        roll2.p_cov("v", "v")  # cov/corr does not take shaped frames yet


def test_describe_percentiles_include_exclude_vs_pandas(spark):
    """describe(percentiles/include/exclude) matches pandas' row set, row
    labels, dtype selection, and values on a mixed frame."""
    from parallel_pandas_spark.operators import reductions

    rng = np.random.default_rng(68)
    pdf = pd.DataFrame(
        {
            "x": rng.normal(10, 3, 50).round(3),
            "y": rng.integers(0, 5, 50).astype("int64"),
            "s": rng.choice(["aa", "bb", "cc"], 50),
        }
    )
    df = from_pandas(spark, pdf)

    # numeric-only default, custom percentiles (0.5 injected like pandas)
    got = reductions.describe_exact(df, percentiles=[0.1, 0.9]).toPandas().set_index("summary")
    ref = pdf.describe(percentiles=[0.1, 0.9])
    assert list(got.index) == list(ref.index)
    assert sorted(got.columns) == sorted(ref.columns) == ["x", "y"]
    for c in ("x", "y"):
        for lbl in ref.index:
            assert got.loc[lbl, c] == pytest.approx(ref.loc[lbl, c], rel=1e-9), (c, lbl)

    # include='all': mixed row set with count/unique/top/freq
    got = reductions.describe_exact(df, include="all").toPandas().set_index("summary")
    ref = pdf.describe(include="all")
    assert list(got.index) == list(ref.index)
    for lbl in ("unique", "top", "freq"):
        rv = ref.loc[lbl, "s"]
        assert got.loc[lbl, "s"] == str(rv), (lbl, got.loc[lbl, "s"], rv)
    # pandas puts NaN in non-applicable cells; ours NULL
    assert got.loc["mean", "s"] is None or pd.isna(got.loc["mean", "s"])
    assert pd.isna(got.loc["top", "x"])

    # exclude numbers -> object-only frame
    got = reductions.describe_exact(df, exclude="number").toPandas().set_index("summary")
    ref = pdf.describe(exclude="number")
    assert list(got.index) == list(ref.index) == ["count", "unique", "top", "freq"]
    assert list(got.columns) == ["s"]

    # validation errors
    with pytest.raises(ValueError):
        reductions.describe_exact(df, percentiles=[1.5])
    with pytest.raises(ValueError):
        reductions.describe_exact(df, include="number", exclude="number")
    with pytest.raises(ValueError):
        reductions.describe_exact(df, include="bogus_cat")


def test_pct_change_fill_limit_freq_vs_pandas(spark):
    """Randomized differential of pct_change(fill_method/limit) against
    pandas (fill-first-then-ratio semantics), plus the freq= exact-time
    path against pandas shift(freq=)."""
    from parallel_pandas_spark.operators import ordered

    rng = np.random.default_rng(69)
    n = 60
    v = rng.integers(1, 20, n).astype(float)
    v[rng.choice(n, 15, replace=False)] = np.nan
    pdf = pd.DataFrame({"g": rng.integers(0, 2, n), "i": range(n), "v": v})
    df = from_pandas(spark, pdf)

    import warnings

    cases = [
        (None, None, 1), ("pad", None, 1), ("pad", 2, 1), ("bfill", None, 1),
        ("ffill", 1, 2), ("backfill", 3, 1),
    ]
    for fill_method, limit, periods in cases:
        r = ordered.pct_change(
            df, ["v"], ["i"], periods=periods, partition_by=["g"],
            fill_method=fill_method, limit=limit,
        )
        got = {row["i"]: row["v_pct_change"] for row in r.collect()}
        for g, grp in pdf.groupby("g"):
            grp = grp.sort_values("i")
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")  # fill_method deprecation
                ref = grp["v"].pct_change(
                    periods=periods, fill_method=fill_method, limit=limit
                )
            for pos, i in enumerate(grp["i"]):
                rv, gv = ref.iloc[pos], got[i]
                if isinstance(rv, float) and math.isnan(rv):
                    assert gv is None or math.isnan(gv), (fill_method, limit, periods, i)
                else:
                    assert gv == pytest.approx(rv, abs=1e-12), (fill_method, limit, periods, i)

    # freq=: exact-time comparison with gaps
    days = np.sort(rng.choice(np.arange(0, 40), size=25, replace=False))
    ts = pd.Timestamp("2024-03-01") + pd.to_timedelta(days, unit="D")
    tv = rng.integers(1, 50, 25).astype(float)
    tpdf = pd.DataFrame({"ts": ts, "v": tv})
    tdf = from_pandas(spark, tpdf)
    r = ordered.pct_change(tdf, ["v"], ["ts"], freq_seconds=86400.0)
    got = {row["ts"]: row["v_pct_change"] for row in r.collect()}
    sref = pd.Series(tv, index=ts).pct_change(freq="D", fill_method=None)
    for t, rv in sref.items():
        gv = got[t.to_pydatetime()]
        if isinstance(rv, float) and math.isnan(rv):
            assert gv is None or math.isnan(gv), t
        else:
            assert gv == pytest.approx(rv, abs=1e-12), t

    with pytest.raises(ValueError):
        ordered.pct_change(df, ["v"], ["i"], limit=2)
    with pytest.raises(ValueError):
        ordered.pct_change(df, ["v"], ["i"], fill_method="bogus")


def test_replace_regex_named_group_java_translation(spark):
    """re.sub named-group references (\\g<name>) must translate to Java's
    ${name} — bare $name is rejected by Matcher.replaceAll at runtime."""
    from parallel_pandas_spark.operators import reductions

    pdf = pd.DataFrame({"s": ["ab12cd", "xy34zf", "nope"]})
    df = from_pandas(spark, pdf)
    out = reductions.replace_values(
        df, {r"(?<num>\d+)": r"[\g<num>]"}, subset=["s"], regex=True
    )
    got = [r["s"] for r in out.orderBy("s").collect()]
    ref = sorted(pd.Series(pdf["s"]).str.replace(r"(?P<num>\d+)", r"[\g<num>]", regex=True))
    assert got == ref, (got, ref)


def test_p_replace_regex_and_method_mutually_exclusive(spark):
    from parallel_pandas_spark.api import ParallelFrame

    df = from_pandas(spark, pd.DataFrame({"i": range(4), "v": ["a", "b", "a", "c"]}))
    with pytest.raises(ValueError, match="mutually exclusive"):
        ParallelFrame(df).p_replace(
            {"a": "z"}, regex=True, method="ffill", col="v", order_by=["i"]
        )


def test_cluster_pairs_long_chain_converges_logarithmically(spark):
    """A 40-hop chain component must converge well under 40 rounds — the
    pointer-jumping step doubles propagation distance per round."""
    from parallel_pandas_spark.operators import dedup

    n = 41
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    out = dedup.cluster_pairs(pairs, max_iter=10)  # O(log 40) ~ 6 rounds
    rows = out.collect()
    assert len(rows) == n
    assert all(r["cluster_id"] == 0 for r in rows)
    assert sum(r["is_canonical"] for r in rows) == 1
    assert all(r["cluster_size"] == n for r in rows)


def test_rolling_quantile_rank_center_closed_vs_pandas(spark):
    """quantile and rank under every center × closed frame vs pandas —
    including the pinned subtlety that rolling.rank ranks the FRAME-END
    element (for closed='left' that is the previous row's value), not the
    current row."""
    rng = np.random.default_rng(70)
    n = 50
    v = rng.integers(0, 8, n).astype(float)  # ties for rank
    v[rng.choice(n, 6, replace=False)] = np.nan
    pdf = pd.DataFrame({"g": rng.integers(0, 2, n), "i": range(n), "v": v})
    df = from_pandas(spark, pdf)

    for w in (3, 5):
        for center in (False, True):
            for closed in ("right", "left", "both", "neither"):
                r = windows.rolling_quantile(
                    df, "v", w, 0.5, ["i"], partition_by=["g"],
                    min_periods=2, out_col="v_med", center=center, closed=closed,
                )
                r = windows.rolling_rank(
                    r, "v", w, ["i"], partition_by=["g"], min_periods=2,
                    out_col="v_rank", center=center, closed=closed,
                )
                got = {row["i"]: row.asDict() for row in r.collect()}
                _, end = windows.fixed_frame_bounds(w, center, closed)
                for g, grp in pdf.groupby("g"):
                    grp = grp.sort_values("i")
                    roll = grp["v"].rolling(w, min_periods=2, center=center, closed=closed)
                    ctx = (w, center, closed, g)
                    _assert_series_match(got, grp["i"], roll.quantile(0.5), "v_med", ctx)
                    # rank: skip the last `end` rows per group — pandas'
                    # streaming skiplist emits STALE ranks where a
                    # lookahead frame clips (can exceed the window size;
                    # divergence documented on rolling_rank)
                    keep = grp["i"].iloc[: len(grp) - end if end > 0 else len(grp)]
                    _assert_series_match(
                        got, keep, roll.rank().iloc[: len(keep)], "v_rank", ctx
                    )


def test_rolling_quantile_interpolation_and_rank_methods_vs_pandas(spark):
    """Rolling.quantile interpolation variants + rank method/pct — the
    remaining ctor/kwarg surface the reference forwards to pandas."""
    rng = np.random.default_rng(71)
    n = 40
    v = rng.integers(0, 9, n).astype(float)
    pdf = pd.DataFrame({"i": range(n), "v": v})
    df = from_pandas(spark, pdf)
    w = 5

    for interp in ("linear", "lower", "higher", "nearest", "midpoint"):
        for q in (0.25, 0.5, 0.77):
            r = windows.rolling_quantile(
                df, "v", w, q, ["i"], min_periods=2, out_col="vq",
                interpolation=interp,
            )
            got = {row["i"]: row["vq"] for row in r.collect()}
            ref = pdf["v"].rolling(w, min_periods=2).quantile(q, interpolation=interp)
            for i in pdf["i"]:
                rv, gv = ref.iloc[i], got[i]
                if isinstance(rv, float) and math.isnan(rv):
                    assert gv is None, (interp, q, i)
                else:
                    assert gv == pytest.approx(rv, abs=1e-12), (interp, q, i, gv, rv)

    for method in ("average", "min", "max"):
        for pct in (False, True):
            r = windows.rolling_rank(
                df, "v", w, ["i"], min_periods=2, out_col="vr",
                method=method, pct=pct,
            )
            got = {row["i"]: row["vr"] for row in r.collect()}
            ref = pdf["v"].rolling(w, min_periods=2).rank(method=method, pct=pct)
            for i in pdf["i"]:
                rv, gv = ref.iloc[i], got[i]
                if isinstance(rv, float) and math.isnan(rv):
                    assert gv is None, (method, pct, i)
                else:
                    assert gv == pytest.approx(rv, abs=1e-12), (method, pct, i, gv, rv)


def test_rolling_expanding_agg_spec_vs_pandas(spark):
    """Rolling.agg / Expanding.agg dict specs (reference op set includes
    aggregate/agg, main.py:44-46) vs pandas."""
    from parallel_pandas_spark.api import ParallelFrame

    rng = np.random.default_rng(72)
    n = 40
    pdf = pd.DataFrame({"i": range(n), "v": rng.normal(5, 2, n).round(3),
                        "u": rng.integers(1, 9, n).astype(float)})
    df = from_pandas(spark, pdf)

    r = ParallelFrame(df).rolling(4, ["i"]).p_agg({"v": ["mean", "std"], "u": "sum"})
    got = {row["i"]: row.asDict() for row in r.collect()}
    roll = pdf.rolling(4)
    for name, ref in (("v_roll_mean", roll["v"].mean()), ("v_roll_std", roll["v"].std()),
                      ("u_roll_sum", roll["u"].sum())):
        _assert_series_match(got, pdf["i"], ref, name, name)

    e = ParallelFrame(df).expanding(["i"]).p_agg({"v": ["median", "var"]})
    got = {row["i"]: row.asDict() for row in e.collect()}
    exp = pdf.expanding()
    _assert_series_match(got, pdf["i"], exp["v"].median(), "v_exp_median", "em")
    _assert_series_match(got, pdf["i"], exp["v"].var(), "v_exp_var", "ev")

    # r7: bare-list specs are legal (pandas Rolling.agg(["mean"]) applies
    # to every numeric value column) — order keys excluded like the index
    r = ParallelFrame(df).rolling(4, ["i"]).p_agg(["mean"])
    got = {row["i"]: row.asDict() for row in r.collect()}
    _assert_series_match(got, pdf["i"], roll["v"].mean(), "v_roll_mean", "lv")
    _assert_series_match(got, pdf["i"], roll["u"].mean(), "u_roll_mean", "lu")

    with pytest.raises(TypeError):
        ParallelFrame(df).rolling(4, ["i"]).p_agg(42)


def test_expanding_full_op_set_vs_pandas(spark):
    """The reference applies the SAME op list to Expanding as Rolling
    (ROLL_AND_EXP_OPS, main.py:44-46): skew/kurt/sem/quantile/rank/apply
    now exist on the expanding surface too."""
    from parallel_pandas_spark.api import ParallelFrame

    rng = np.random.default_rng(73)
    n = 50
    pdf = pd.DataFrame({
        "g": rng.integers(0, 2, n), "i": range(n),
        "v": rng.normal(3, 2, n).round(3),
    })
    df = from_pandas(spark, pdf)
    pf = ParallelFrame(df)

    r = pf.expanding(["i"], ["g"]).p_skew(["v"])
    r = ParallelFrame(r).expanding(["i"], ["g"]).p_sem(["v"])
    r = windows.expanding_quantile(r, "v", 0.3, ["i"], ["g"], out_col="vq")
    r = windows.expanding_rank(r, "v", ["i"], ["g"], out_col="vr", method="min")
    r = windows.expanding_apply(
        r, "v", lambda a: float(np.ptp(a)), ["i"], ["g"], out_col="va"
    )
    got = {row["i"]: row.asDict() for row in r.collect()}
    for g, grp in pdf.groupby("g"):
        grp = grp.sort_values("i")
        exp = grp["v"].expanding()
        refs = {
            "v_exp_skew": exp.skew(), "v_exp_sem": exp.sem(),
            "vq": exp.quantile(0.3), "vr": exp.rank(method="min"),
            "va": grp["v"].expanding().apply(lambda a: float(np.ptp(a)), raw=True),
        }
        for name, series in refs.items():
            _assert_series_match(got, grp["i"], series, name, (g, name))


def test_vocab_topk_matches_python_counter(spark):
    """vocab_topk's (token, tf, df) agrees with a plain Python Counter on
    randomized multi-line unicode docs, including empty and
    whitespace-only documents (which contribute no tokens)."""
    from collections import Counter

    from parallel_pandas_spark.operators import text

    rng = np.random.default_rng(77)
    words = ["the", "cat", "sat", "Mat", "ümlaut", "汉字", "a", "b-b", "x1"]
    docs = []
    for i in range(60):
        n = int(rng.integers(0, 12))
        body = " ".join(rng.choice(words, n)) if n else rng.choice(["", "   ", "\t\n"])
        docs.append((i, body))
    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])

    tf, df_ = Counter(), Counter()
    for _, row in pdf.iterrows():
        toks = [t for t in row["text"].lower().split() if t]
        tf.update(toks)
        df_.update(set(toks))

    got = text.vocab_topk(from_pandas(spark, pdf), "doc_id", "text", k=5).collect()
    expected = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(r["token"], r["tf"], r["df"]) for r in got] == [
        (tok, cnt, df_[tok]) for tok, cnt in expected
    ]


def test_vocab_topk_is_heap_topk_not_global_sort(spark):
    """The top-k is planned as TakeOrderedAndProject (per-task k-row
    heap), never a full global Sort of the vocabulary."""
    from parallel_pandas_spark.operators import text
    from parallel_pandas_spark.plans import explain

    d = spark.read.parquet(SF + "/documents.parquet")
    plan = explain.explain_str(text.vocab_topk(d, "doc_id", "text", k=50))
    assert "TakeOrderedAndProject" in plan, plan


def test_write_shards_deterministic_layout_and_manifest(spark, tmp_path):
    """write_shards: membership is id % n_shards, every file respects
    maxRecordsPerFile, the file count per shard is the deterministic
    ceil(rows/max), and the read-back manifest checks against the
    source frame exactly."""
    from parallel_pandas_spark.sources import shard_manifest, write_shards

    pdf = pd.DataFrame({"doc_id": range(103), "payload": [f"p{i}" for i in range(103)]})
    path = str(tmp_path / "shards")
    write_shards(
        from_pandas(spark, pdf), path, "doc_id", n_shards=4,
        max_records_per_file=10, order_within=["doc_id"],
    )

    back = spark.read.parquet(path)
    rows = back.collect()
    assert len(rows) == 103
    assert all(r["doc_id"] % 4 == r["shard"] for r in rows)

    import pyspark.sql.functions as F
    per_file = (
        back.withColumn("f", F.input_file_name())
        .groupBy("shard", "f").count().collect()
    )
    assert all(r["count"] <= 10 for r in per_file)

    man = {r["shard"]: r for r in shard_manifest(spark, path, "doc_id").collect()}
    for s in range(4):
        ids = [i for i in range(103) if i % 4 == s]
        assert man[s]["n_rows"] == len(ids)
        assert man[s]["id_sum"] == sum(ids)
        assert man[s]["id_min"] == min(ids)
        assert man[s]["id_max"] == max(ids)
        assert man[s]["n_files"] == math.ceil(len(ids) / 10)


def test_diff_value_counts_clip_where_vs_pandas(spark):
    """Randomized differential of the r6 pandas-completeness surface:
    diff (positive and negative periods), value_counts (counts +
    normalize, dropna both ways), clip/abs/where/mask — all against
    real pandas on a NaN-bearing frame."""
    from parallel_pandas_spark.api import ParallelFrame
    from parallel_pandas_spark.operators import reductions

    rng = np.random.default_rng(11)
    n = 300
    pdf = pd.DataFrame({
        "i": range(n),
        "g": rng.integers(0, 4, n),
        "v": rng.normal(0, 10, n).round(3),
        "s": rng.choice(["a", "b", "c", None], n),
    })
    pdf.loc[rng.choice(n, 25, replace=False), "v"] = np.nan
    df = spark.createDataFrame(pdf)

    # diff within groups, periods 1 and -2
    for periods in (1, -2):
        got = {
            r["i"]: r["v_diff"]
            for r in ParallelFrame(df).p_diff(
                ["v"], ["i"], periods=periods, partition_by=["g"]
            ).collect()
        }
        for g, grp in pdf.groupby("g"):
            grp = grp.sort_values("i")
            ref = grp["v"].diff(periods)
            for pos, i in enumerate(grp["i"]):
                rv, gv = ref.iloc[pos], got[i]
                if isinstance(rv, float) and math.isnan(rv):
                    assert gv is None or math.isnan(gv), (periods, i)
                else:
                    assert gv == pytest.approx(rv), (periods, i)

    # value_counts: counts and normalized, dropna True/False
    for dropna in (True, False):
        got = [
            (r["value"], r["count"])
            for r in reductions.value_counts(df, "s", dropna=dropna).collect()
        ]
        ref = pdf["s"].value_counts(dropna=dropna)
        ref = sorted(
            ((k if not (isinstance(k, float) and math.isnan(k)) else None, int(c))
             for k, c in ref.items()),
            key=lambda kv: (-kv[1], str(kv[0])),
        )
        # engine emits NULL-last ordering differences only within tf ties;
        # compare as multisets plus the top element
        assert sorted(got, key=lambda kv: (-kv[1], str(kv[0]))) == ref
    norm = {
        r["value"]: r["proportion"]
        for r in reductions.value_counts(df, "s", normalize=True).collect()
    }
    ref_n = pdf["s"].value_counts(normalize=True)
    for k, p in ref_n.items():
        assert norm[k] == pytest.approx(p)

    # clip / abs / where / mask
    pf = ParallelFrame(df.select("i", "v", "g"))
    got_clip = {r["i"]: r["v"] for r in pf.p_clip(["v"], -5.0, 5.0).df.collect()}
    ref_clip = pdf.set_index("i")["v"].clip(-5.0, 5.0)
    got_where = {
        r["i"]: r["v"]
        for r in pf.p_where(["v"], "g < 2", other=-1.0).df.collect()
    }
    ref_where = pdf.set_index("i")["v"].where(pdf.set_index("i")["g"] < 2, -1.0)
    for i in pdf["i"]:
        for gv, rv in ((got_clip[i], ref_clip.loc[i]), (got_where[i], ref_where.loc[i])):
            if isinstance(rv, float) and math.isnan(rv):
                assert gv is None or math.isnan(gv), i
            else:
                assert gv == pytest.approx(rv), i


def test_drop_duplicates_keep_variants(spark):
    """drop_duplicates keep='first'/'last'/False against pandas on a
    frame sorted by the explicit order column."""
    from parallel_pandas_spark.operators import dedup

    rng = np.random.default_rng(5)
    pdf = pd.DataFrame({
        "i": range(120),
        "k": rng.integers(0, 10, 120),
        "v": rng.integers(0, 100, 120),
    })
    df = spark.createDataFrame(pdf)
    base = pdf.sort_values("i")
    for keep in ("first", "last", False):
        got = sorted(
            (r["k"], r["i"]) for r in dedup.drop_duplicates(
                df, ["k"], order_by=["i"], keep=keep
            ).collect()
        )
        want = sorted(
            (int(r["k"]), int(r["i"]))
            for _, r in base.drop_duplicates(subset=["k"], keep=keep).iterrows()
        )
        assert got == want, keep
    with pytest.raises(ValueError):
        dedup.drop_duplicates(df, ["k"], keep="first")  # no order_by


def test_nlargest_nsmallest_with_tiebreaker(spark):
    from parallel_pandas_spark.operators import reductions
    from parallel_pandas_spark.plans import explain

    pdf = pd.DataFrame({"i": range(200), "v": [x % 17 for x in range(200)]})
    df = spark.createDataFrame(pdf)
    nl = reductions.nlargest(df, 7, "v", tie_breaker=["i"])
    got = [(r["v"], r["i"]) for r in nl.collect()]
    want = list(
        pdf.sort_values(["v", "i"], ascending=[False, True]).head(7)[["v", "i"]]
        .itertuples(index=False, name=None)
    )
    assert got == want
    assert "TakeOrderedAndProject" in explain.explain_str(nl)
    ns = reductions.nsmallest(df, 7, "v", tie_breaker=["i"])
    got_s = [(r["v"], r["i"]) for r in ns.collect()]
    want_s = list(
        pdf.sort_values(["v", "i"]).head(7)[["v", "i"]]
        .itertuples(index=False, name=None)
    )
    assert got_s == want_s


def test_ngram_contamination_planted_overlaps(spark):
    """Decontamination finds exactly the planted train/eval overlaps with
    the right shared-gram counts, and the eval side broadcasts (one pass
    over the train corpus, no train-side shuffle for the gram join)."""
    from parallel_pandas_spark.operators import dedup
    from parallel_pandas_spark.plans import explain

    secret = "alpha beta gamma delta epsilon zeta eta theta"
    train = spark.createDataFrame(
        [
            (1, "completely unrelated text about weather patterns today"),
            (2, f"prefix words then {secret} and a suffix tail"),
            (3, f"{secret} appears right at the start here"),
            (4, "short doc"),
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(100, f"the benchmark question contains {secret} verbatim")],
        "doc_id long, text string",
    )
    out = dedup.ngram_contamination(train, eval_df, "doc_id", "text", n=5, min_shared=1)
    got = {(r["train_id"], r["eval_id"]): r["n_shared"] for r in out.collect()}

    def grams(s, n=5):
        t = s.split()
        return {" ".join(t[i:i + n]) for i in range(len(t) - n + 1)} if len(t) >= n else {s}

    eg = grams(eval_df.collect()[0]["text"])
    want = {}
    for r in train.collect():
        shared = len(grams(r["text"]) & eg)
        if shared:
            want[(r["doc_id"], 100)] = shared
    assert got == want and (2, 100) in got and (3, 100) in got
    assert explain.has_broadcast_join(out)


def test_window_kernels_treat_nonfinite_as_missing(spark):
    """pandas' windowed aggregation kernels treat NaN AND ±inf as missing
    observations (even rolling.max over a frame containing +inf returns
    the finite max; min_periods counts only finite values; count counts
    inf but not NaN), while pct_change produces IEEE ±inf/NaN on zero
    denominators. Differential vs pandas 2.2 with planted 0/±inf."""
    from parallel_pandas_spark.operators import ordered, windows

    rng = np.random.default_rng(99)
    n = 50
    v = rng.normal(0, 5, n).round(2)
    v[5] = 0.0; v[6] = 0.0; v[10] = np.inf; v[11] = -np.inf
    pdf = pd.DataFrame({"i": range(n), "g": rng.integers(0, 2, n), "v": v})
    df = from_pandas(spark, pdf)

    def check(got, ref, ctx):
        for pos, i in enumerate(ref.index):
            rv, gv = ref.iloc[pos], got[i]
            if isinstance(rv, float) and math.isnan(rv):
                assert gv is None or math.isnan(gv), (ctx, i, gv)
            elif isinstance(rv, float) and math.isinf(rv):
                assert isinstance(gv, float) and math.isinf(gv) and (gv > 0) == (rv > 0), (ctx, i, gv)
            else:
                assert gv == pytest.approx(rv), (ctx, i, gv, rv)

    r = ordered.pct_change(df, ["v"], ["i"], partition_by=["g"])
    got = {row["i"]: row["v_pct_change"] for row in r.collect()}
    for g, grp in pdf.groupby("g"):
        grp = grp.sort_values("i").set_index("i")
        check(got, grp["v"].pct_change(), ("pct", g))

    fns = ("mean", "sum", "count", "max", "std")
    r = windows.rolling(df, ["v"], 3, ["i"], funcs=fns, partition_by=["g"], min_periods=1)
    rows = {row["i"]: row for row in r.collect()}
    for g, grp in pdf.groupby("g"):
        grp = grp.sort_values("i").set_index("i")
        roll = grp["v"].rolling(3, min_periods=1)
        for fn in fns:
            check({i: rows[i][f"v_roll_{fn}"] for i in grp.index},
                  getattr(roll, fn)(), (fn, g))

    r = windows.rolling_rank(df, "v", 3, ["i"], partition_by=["g"], min_periods=1, out_col="rk")
    got = {row["i"]: row["rk"] for row in r.collect()}
    for g, grp in pdf.groupby("g"):
        grp = grp.sort_values("i").set_index("i")
        check(got, grp["v"].rolling(3, min_periods=1).rank(), ("rank", g))

    r = windows.expanding(df, ["v"], ["i"], funcs=("mean", "count"), partition_by=["g"])
    rows = {row["i"]: row for row in r.collect()}
    for g, grp in pdf.groupby("g"):
        grp = grp.sort_values("i").set_index("i")
        exp = grp["v"].expanding()
        for fn in ("mean", "count"):
            check({i: rows[i][f"v_exp_{fn}"] for i in grp.index},
                  getattr(exp, fn)(), ("exp_" + fn, g))


def test_reductions_skipna_true_nan(spark):
    """pandas skipna=True for TRUE NaN values (parquet-borne NaN is a
    VALUE to Spark): every reduction, grouped agg/transform, quantile,
    describe, mode, idxmax, nunique, value_counts, and pearson corr must
    exclude NaN, while propagating ±inf like pandas full-frame stats."""
    import pyspark.sql.functions as SF
    from parallel_pandas_spark.api import ParallelFrame
    from parallel_pandas_spark.operators import grouped, reductions

    rng = np.random.default_rng(4)
    v = rng.normal(10, 2, 40).round(3)
    pdf = pd.DataFrame({"i": range(40), "g": [i % 2 for i in range(40)], "v": v})
    pdf_nan = pdf.copy()
    pdf_nan.loc[3, "v"] = np.nan
    pdf_nan.loc[17, "v"] = np.nan
    df = spark.createDataFrame(pdf).withColumn(
        "v", SF.when(SF.col("i").isin(3, 17), SF.lit(float("nan"))).otherwise(SF.col("v"))
    )
    pn = pdf_nan["v"]
    pf = ParallelFrame(df)
    checks = {
        "p_mean": (pf.p_mean(["v"]), pn.mean()),
        "p_sum": (pf.p_sum(["v"]), pn.sum()),
        "p_std": (pf.p_std(["v"]), pn.std()),
        "p_max": (pf.p_max(["v"]), pn.max()),
        "p_median": (pf.p_median(["v"]), pn.median()),
        "p_nunique": (pf.p_nunique(["v"]), float(pn.nunique())),
        "p_skew": (pf.p_skew(["v"]), pn.skew()),
        "p_mad": (pf.p_mad(["v"]), (pn - pn.mean()).abs().mean()),
    }
    for name, (got_df, want) in checks.items():
        got = list(got_df.collect()[0].asDict().values())[0]
        assert got == pytest.approx(want), (name, got, want)

    ga = grouped.groupby_agg(df, ["g"], {"v": ["mean", "count"]})
    got = {r["g"]: (r["v_mean"], r["v_count"]) for r in ga.collect()}
    pg = pdf_nan.groupby("g")["v"]
    for g in (0, 1):
        assert got[g][0] == pytest.approx(pg.mean()[g]), g
        assert got[g][1] == pg.count()[g], g

    tr = grouped.groupby_transform(df, ["g"], ["v"], "mean")
    want = pdf_nan.groupby("g")["v"].transform("mean")
    got = {r["i"]: r["v_mean"] for r in tr.collect()}
    assert all(got[i] == pytest.approx(want.iloc[i]) for i in range(40))

    d = {r["summary"]: r["v"] for r in reductions.describe_exact(df, ["v"]).collect()}
    ref = pn.describe()
    for k in ("count", "mean", "std", "min", "25%", "50%", "max"):
        assert d[k] == pytest.approx(ref[k]), k

    df2 = df.withColumn(
        "u",
        SF.col("i").cast("double")
        + SF.when(SF.col("i") == 5, SF.lit(float("nan"))).otherwise(SF.lit(0.0)),
    )
    pdf2 = pdf_nan.assign(u=[float(i) if i != 5 else np.nan for i in range(40)])
    cm = reductions.corr_matrix(df2, ["v", "u"], "pearson")
    got = {(r["col_x"], r["col_y"]): r["corr"] for r in cm.collect()}
    assert got[("v", "u")] == pytest.approx(pdf2[["v", "u"]].corr().loc["v", "u"])

    # inf still PROPAGATES in full-frame stats (unlike window kernels)
    dfi = df.withColumn("v", SF.when(SF.col("i") == 7, SF.lit(float("inf"))).otherwise(SF.col("v")))
    got = ParallelFrame(dfi).p_mean(["v"]).collect()[0][0]
    assert math.isinf(got)


def test_cumulatives_and_rank_skip_true_nan(spark):
    """pandas cumulative skipna for TRUE NaN (the NaN row outputs NaN but
    does not poison the running state) and rank-treats-NaN-as-NA."""
    import pyspark.sql.functions as SF
    from parallel_pandas_spark.operators import ordered

    pdf = pd.DataFrame({"i": range(8), "g": [0] * 8,
                        "v": [1.0, np.nan, 2, 3, np.nan, 4, 5, 6]})
    df = spark.createDataFrame(pdf).withColumn(
        "v", SF.when(SF.col("i").isin(1, 4), SF.lit(float("nan"))).otherwise(SF.col("v"))
    )

    def check(got, ref, ctx):
        for a, b in zip(got, ref):
            if isinstance(b, float) and math.isnan(b):
                assert a is None or math.isnan(a), (ctx, got, ref)
            else:
                assert a == pytest.approx(b), (ctx, got, ref)

    for op, ref in [("cumsum", pdf["v"].cumsum()), ("cummax", pdf["v"].cummax()),
                    ("cumprod", pdf["v"].cumprod())]:
        r = getattr(ordered, op)(df, ["v"], ["i"], partition_by=["g"])
        check([row[f"v_{op}"] for row in r.orderBy("i").collect()], ref.tolist(), op)

    for na in ("keep", "top", "bottom"):
        r = ordered.rank(df, "v", partition_by=["g"], na_option=na, tie_break=["i"])
        check([row["v_rank"] for row in r.orderBy("i").collect()],
              pdf["v"].rank(na_option=na).tolist(), na)


def test_fillna_dropna_vs_pandas(spark):
    """fillna (scalar / dict / ffill / bfill / limit) and dropna
    (any / all / thresh) against pandas, with NULL and TRUE NaN mixed —
    both count as missing, like pandas."""
    import pyspark.sql.functions as SF
    from parallel_pandas_spark.operators import elementwise

    pdf = pd.DataFrame({
        "i": range(10),
        "a": [1.0, np.nan, np.nan, 4, np.nan, 6, np.nan, np.nan, 9, 10],
        "b": [np.nan, np.nan, 3.0, np.nan, 5, np.nan, 7, 8, np.nan, np.nan],
    })
    # half the missing as TRUE NaN, half as NULL: same answer required
    df = spark.createDataFrame(pdf.assign(a=pdf["a"].fillna(-999), b=pdf["b"].fillna(-999)))
    df = df.withColumn("a", SF.when(SF.col("a") == -999,
        SF.when(SF.col("i") % 2 == 0, SF.lit(float("nan"))).otherwise(SF.lit(None))
        ).otherwise(SF.col("a")))
    df = df.withColumn("b", SF.when(SF.col("b") == -999,
        SF.when(SF.col("i") % 2 == 1, SF.lit(float("nan"))).otherwise(SF.lit(None))
        ).otherwise(SF.col("b")))

    def vals(rdf, c):
        return [r[c] for r in rdf.orderBy("i").collect()]

    def check(got, ref, ctx):
        for g, r in zip(got, ref):
            if isinstance(r, float) and math.isnan(r):
                assert g is None or math.isnan(g), (ctx, got, ref)
            else:
                assert g == pytest.approx(r), (ctx, got, ref)

    check(vals(elementwise.fillna(df, value=0.0, cols=["a"]), "a"),
          pdf["a"].fillna(0.0).tolist(), "scalar")
    check(vals(elementwise.fillna(df, value={"a": 1.5, "b": -2.0}), "a"),
          pdf["a"].fillna(1.5).tolist(), "dict-a")
    check(vals(elementwise.fillna(df, value={"a": 1.5, "b": -2.0}), "b"),
          pdf["b"].fillna(-2.0).tolist(), "dict-b")
    for method, ref_m in [("ffill", pdf.ffill()), ("bfill", pdf.bfill())]:
        r = elementwise.fillna(df, method=method, cols=["a", "b"], order_by=["i"])
        check(vals(r, "a"), ref_m["a"].tolist(), method + "-a")
        check(vals(r, "b"), ref_m["b"].tolist(), method + "-b")
    r = elementwise.fillna(df, method="ffill", cols=["a"], order_by=["i"], limit=1)
    check(vals(r, "a"), pdf["a"].ffill(limit=1).tolist(), "ffill-limit")

    for how in ("any", "all"):
        got = sorted(r["i"] for r in elementwise.dropna(df, ["a", "b"], how=how).collect())
        want = sorted(pdf.dropna(subset=["a", "b"], how=how)["i"].tolist())
        assert got == want, how
    got = sorted(r["i"] for r in elementwise.dropna(df, ["a", "b"], thresh=2).collect())
    want = sorted(pdf.dropna(subset=["a", "b"], thresh=2)["i"].tolist())
    assert got == want
    with pytest.raises(ValueError):
        elementwise.fillna(df, method="ffill")  # no order_by
    with pytest.raises(ValueError):
        elementwise.fillna(df)  # neither value nor method


def test_det_moments_skip_true_nan_both_engines(spark):
    """det.* exact moments skip TRUE NaN like their quantized sums already
    did implicitly — and the count divisor now skips it too (it used to
    count NaN rows, inflating n). The SQL twins guard the quantizer with
    CASE isnan so DuckDB (which RAISES on CAST(NaN AS BIGINT), unlike
    Spark's non-ANSI NULL) computes the identical sums."""
    import duckdb
    import pyspark.sql.functions as SF
    from parallel_pandas_spark import det

    pn = pd.Series([0.0, 1, np.nan, 3, 4])
    df = spark.range(5).withColumn(
        "v", SF.when(SF.col("id") == 2, SF.lit(float("nan"))).otherwise(SF.col("id").cast("double"))
    )
    r = df.agg(
        det.dmean("v").alias("m"), det.dvar("v").alias("var"),
        det.dstd("v").alias("s"), det.dsem("v").alias("sem"),
        det.dskew("v").alias("sk"), det.dkurt("v").alias("k"),
    ).collect()[0]
    for got, want in [(r["m"], pn.mean()), (r["var"], pn.var()), (r["s"], pn.std()),
                      (r["sem"], pn.sem()), (r["sk"], pn.skew()), (r["k"], pn.kurt())]:
        assert got == pytest.approx(want)

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES (0.0),(1.0),('NaN'::DOUBLE),(3.0),(4.0)) v(x)"
    )
    got = con.execute(
        f"SELECT {det.dmean_sql('x')}, {det.dvar_sql('x')}, {det.dskew_sql('x')} FROM t"
    ).fetchone()
    for g, w in zip(got, (pn.mean(), pn.var(), pn.skew())):
        assert g == pytest.approx(w)
