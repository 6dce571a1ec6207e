"""Round-10 incremental rollup (operators/rollup.py): mergeable
fixed-point aggregate state whose chained merges are bit-identical to a
from-raw recompute."""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parallel_pandas_spark.operators import rollup  # noqa: E402

SPECS = {"x": (6, 4)}


def _rows(spark):
    data = []
    for g in range(3):
        for s in range(4):
            for i in range(25):
                data.append((g, s, float((g * 131 + s * 17 + i * 7) % 97) / 3.0))
    return spark.createDataFrame(data, "g int, s int, x double")


def test_merge_path_bit_equals_direct_state(spark):
    """finalize(merge(fine state)) must equal finalize(state built
    directly at the coarse grain) — integer state addition is
    associative, so the doubles match BIT-for-bit, not approximately."""
    df = _rows(spark)
    fine = rollup.agg_state(df, ["g", "s"], SPECS)
    merged = rollup.merge_state(fine, ["g"], ["x"])
    direct = rollup.agg_state(df, ["g"], SPECS)
    a = sorted(map(tuple, rollup.finalize(merged, ["g"], SPECS).collect()))
    b = sorted(map(tuple, rollup.finalize(direct, ["g"], SPECS).collect()))
    assert a == b  # exact equality, including every float bit


def test_merge_tree_shape_does_not_matter(spark):
    """Two different merge trees (fine->g directly vs fine->(g,s%2)->g)
    produce identical state."""
    df = _rows(spark)
    fine = rollup.agg_state(df, ["g", "s"], SPECS)
    one_step = rollup.merge_state(fine, ["g"], ["x"])
    from pyspark.sql import functions as F
    mid = rollup.merge_state(
        fine.withColumn("s2", F.pmod("s", F.lit(2))), ["g", "s2"], ["x"]
    )
    two_step = rollup.merge_state(mid, ["g"], ["x"])
    a = sorted(map(tuple, rollup.finalize(one_step, ["g"], SPECS).collect()))
    b = sorted(map(tuple, rollup.finalize(two_step, ["g"], SPECS).collect()))
    assert a == b


def test_finalize_values_match_pandas(spark):
    """The finalized statistics are the actual count/sum/mean/min/max/
    var/std of the data (sample ddof=1), to quantization precision."""
    import pandas as pd

    df = _rows(spark)
    pdf = df.toPandas()
    out = rollup.finalize(
        rollup.agg_state(df, ["g"], SPECS), ["g"], SPECS
    ).toPandas().set_index("g").sort_index()
    ref = pdf.groupby("g")["x"]
    for g in out.index:
        assert out.loc[g, "count_x"] == ref.count()[g]
        assert abs(out.loc[g, "sum_x"] - ref.sum()[g]) < 1e-5
        assert abs(out.loc[g, "mean_x"] - ref.mean()[g]) < 1e-7
        assert out.loc[g, "min_x"] == ref.min()[g]
        assert out.loc[g, "max_x"] == ref.max()[g]
        assert abs(out.loc[g, "var_x"] - ref.var(ddof=1)[g]) < 1e-4
        assert abs(out.loc[g, "std_x"] - ref.std(ddof=1)[g]) < 1e-4


def test_nan_rows_drop_from_sums_and_counts_together(spark):
    """NaN skipna semantics: a NaN row contributes to neither n nor the
    power sums (det._nobs contract), so mean/var stay finite and match
    the clean-subset recompute."""
    rows = [(0, 1.0), (0, 2.0), (0, float("nan")), (0, 3.0)]
    df = spark.createDataFrame(rows, "g int, x double")
    out = rollup.finalize(
        rollup.agg_state(df, ["g"], SPECS), ["g"], SPECS
    ).collect()[0]
    assert out["count_x"] == 3
    assert abs(out["sum_x"] - 6.0) < 1e-9
    assert abs(out["mean_x"] - 2.0) < 1e-9
    assert abs(out["var_x"] - 1.0) < 1e-6
    assert not math.isnan(out["std_x"])
    # min/max skip NaN too (pandas skipna), instead of Spark's bare
    # min/max where NaN ranks greatest and poisons the max
    assert out["min_x"] == 1.0 and out["max_x"] == 3.0


def test_hll_distinct_state_merges_like_a_recompute(spark):
    """The HLL sketch state must union across merges: the merged
    estimate equals the estimate of a sketch built directly at the
    coarse grain (same registers either way), and both are near the
    exact distinct count."""
    from parallel_pandas_spark.operators.rollup import distinct_estimate

    df = _rows(spark)
    fine = rollup.agg_state(df, ["g", "s"], SPECS, distinct_cols=["x"])
    merged = rollup.merge_state(fine, ["g"], ["x"], distinct_cols=["x"])
    direct = rollup.agg_state(df, ["g"], SPECS, distinct_cols=["x"])
    got = {r["g"]: r["nunique_x"]
           for r in distinct_estimate(merged, "x").collect()}
    ref = {r["g"]: r["nunique_x"]
           for r in distinct_estimate(direct, "x").collect()}
    assert got == ref  # same sketch registers -> same estimate
    exact = {r["g"]: r["n"] for r in
             df.groupBy("g").agg(
                 __import__("pyspark.sql.functions", fromlist=["F"])
                 .countDistinct("x").alias("n")).collect()}
    for g, est in got.items():
        assert abs(est - exact[g]) <= max(2, 0.05 * exact[g])


def test_histogram_state_merges_exactly_and_bounds_quantile_error(spark):
    """Histogram quantile state: (a) merge trees don't matter (integer
    bin vectors add exactly), (b) the quantile estimate is within one
    bin width of the exact quantile, (c) out-of-domain values clamp to
    edge bins instead of vanishing."""
    import numpy as np

    from parallel_pandas_spark.operators.rollup import (
        hist_state, merge_hist, quantile_estimate)

    df = _rows(spark)  # x in [0, 32); 300 rows per g
    LO, HI, B = 0.0, 33.0, 64
    fine = hist_state(df, ["g", "s"], "x", LO, HI, bins=B)
    merged = merge_hist(fine, ["g"], "x")
    direct = hist_state(df, ["g"], "x", LO, HI, bins=B)
    a = {r["g"]: r["hist_x"] for r in merged.collect()}
    b = {r["g"]: r["hist_x"] for r in direct.collect()}
    assert a == b  # exact state equality
    # counts conserve rows
    pdf = df.toPandas()
    for g, h in a.items():
        assert sum(h) == (pdf["g"] == g).sum()
    est = quantile_estimate(merged, "x", [0.25, 0.5, 0.9], LO, HI)
    width = (HI - LO) / B
    for r in est.collect():
        sub = np.sort(pdf.loc[pdf["g"] == r["g"], "x"].to_numpy())
        for q, cname in [(0.25, "q0_25_x"), (0.5, "q0_5_x"),
                         (0.9, "q0_9_x")]:
            # inverted_cdf = the first order statistic with cdf >= q —
            # the quantile definition the histogram read-out implements;
            # that order statistic lies INSIDE the elected bin, so the
            # left-edge estimate is within one bin width of it (a
            # linearly-interpolated type-7 quantile can legitimately sit
            # further away under heavy ties)
            exact = float(np.quantile(sub, q, method="inverted_cdf"))
            assert abs(r[cname] - exact) <= width + 1e-9, (q, r[cname], exact)
    # clamping: values beyond hi land in the last bin
    df2 = spark.createDataFrame([(0, 999.0), (0, -5.0)], "g int, x double")
    h2 = hist_state(df2, ["g"], "x", LO, HI, bins=B).collect()[0]["hist_x"]
    assert h2[-1] == 1 and h2[0] == 1


def test_hist_state_rejects_degenerate_domain(spark):
    """lo >= hi or bins < 1 raise a named ValueError at call time, not a
    ZeroDivisionError buried in expression build (ADVICE r10)."""
    import pytest

    from parallel_pandas_spark.operators.rollup import hist_state

    df = _rows(spark)
    with pytest.raises(ValueError, match="lo < hi"):
        hist_state(df, ["g"], "x", 5.0, 5.0, bins=8)
    with pytest.raises(ValueError, match="lo < hi"):
        hist_state(df, ["g"], "x", 9.0, 1.0, bins=8)
    with pytest.raises(ValueError, match="bins >= 1"):
        hist_state(df, ["g"], "x", 0.0, 1.0, bins=0)


def test_negate_hist_retraction_equals_rebuild(spark):
    """r11: histogram retraction — merge(state, negate(state(removed)))
    bit-equals a histogram built from the surviving rows, and the
    quantile read-out agrees exactly."""
    from parallel_pandas_spark.operators.rollup import (
        hist_state, merge_hist, negate_hist, quantile_estimate)

    df = _rows(spark)
    LO, HI, B = 0.0, 33.0, 64
    removed = df.where("x < 8")
    surviving = df.where("x >= 8")
    full = hist_state(df, ["g"], "x", LO, HI, bins=B)
    neg = negate_hist(hist_state(removed, ["g"], "x", LO, HI, bins=B), "x")
    retracted = merge_hist(full.unionByName(neg), ["g"], "x")
    direct = hist_state(surviving, ["g"], "x", LO, HI, bins=B)
    a = {r["g"]: list(r["hist_x"]) for r in retracted.collect()}
    b = {r["g"]: list(r["hist_x"]) for r in direct.collect()}
    assert a == b
    qa = quantile_estimate(retracted, "x", [0.5, 0.9], LO, HI)
    qb = quantile_estimate(direct, "x", [0.5, 0.9], LO, HI)
    assert sorted(map(tuple, qa.collect())) == sorted(map(tuple, qb.collect()))
