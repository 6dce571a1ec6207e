"""Round-13: bounded-memory exact order statistics (orderstats.py) —
the replacement for Spark's exact ``percentile`` aggregate, whose
unmanaged on-heap value→count map was the engine's one measured OOM
(SCALE.md r12; stats_quantile_describe red at a 1 GB heap). The
refinement must be BIT-IDENTICAL to F.percentile across NaN/NULL/±inf/
heavy duplicates, and the non-linear modes must pick exact data points.
"""

from __future__ import annotations

import math
import os
import random
import struct
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from parallel_pandas_spark.operators import orderstats, reductions  # noqa: E402

_NAN, _INF = float("nan"), float("inf")


def _bits(v):
    return None if v is None else struct.pack(">d", v).hex()


def test_exact_quantile_bitwise_vs_percentile(spark):
    random.seed(3)
    vals = [random.gauss(0, 1e6) for _ in range(20000)]
    vals += [5.0] * 3000 + [_NAN] * 500 + [_INF] * 40 + [-_INF] * 25
    vals += [None] * 100
    random.shuffle(vals)
    ys = [random.choice([1.5, 2.5, 97.0]) for _ in vals]  # 3 distinct values
    df = spark.createDataFrame(
        list(zip(vals, ys)), "x double, y double"
    ).repartition(16)
    qs = [0.0, 0.001, 0.25, 0.5, 0.75, 0.9, 0.995, 1.0]
    _, got = orderstats.exact_quantile_values(df, ["x", "y"], qs)
    exp = df.agg(
        F.percentile(F.when(~F.isnan("x"), F.col("x")),
                     F.array(*[F.lit(q) for q in qs])),
        F.percentile("y", F.array(*[F.lit(q) for q in qs])),
    ).first()
    for i, q in enumerate(qs):
        assert _bits(got["x"][i]) == _bits(exp[0][i]), ("x", q)
        assert _bits(got["y"][i]) == _bits(exp[1][i]), ("y", q)


def test_spark_interp_is_weighted_average_form(spark):
    """F.percentile uses (hi-pos)*lower + (pos-lo)*higher; the lerp
    form differs in the last ulp on adversarial magnitudes — pin the
    exact form so a refactor can't silently change hashes."""
    random.seed(11)
    vals = [random.uniform(-1e12, 1e12) * random.choice([1e-9, 1.0, 1e9])
            for _ in range(237)]
    qs = [i / 997 for i in range(1, 997, 31)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = df.agg(
        F.percentile("x", F.array(*[F.lit(q) for q in qs]))
    ).first()[0]
    s = sorted(vals)
    for q, g in zip(qs, got):
        pos = q * (len(s) - 1)
        mine = orderstats.spark_interp(
            s[math.floor(pos)], s[math.ceil(pos)], pos)
        assert _bits(mine) == _bits(g), q


def test_order_stats_empty_and_single(spark):
    e = spark.createDataFrame([(None,)], "z double")
    counts, vals = orderstats.exact_quantile_values(e, ["z"], [0.5])
    assert counts["z"] == 0 and vals["z"] == [None]
    one = spark.createDataFrame([(42.0,), (None,)], "z double")
    counts, vals = orderstats.exact_quantile_values(one, ["z"], [0.0, 0.5, 1.0])
    assert counts["z"] == 1 and vals["z"] == [42.0, 42.0, 42.0]


def test_interp_multi_picks_exact_data_points(spark):
    random.seed(5)
    vals = sorted(random.uniform(-50, 50) for _ in range(501))
    random.shuffle(vals)
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = {
        (r["mode"], r["q"]): r["v"]
        for r in reductions.quantile_interp_multi(
            df, ["v"], [0.25, 0.6], ("lower", "higher", "nearest", "midpoint")
        ).collect()
    }
    s = sorted(vals)
    n = len(s)
    for q in (0.25, 0.6):
        h = (n - 1) * q
        assert got[("lower", q)] == s[math.floor(h)]
        assert got[("higher", q)] == s[math.ceil(h)]
        assert got[("midpoint", q)] == (s[math.floor(h)] + s[math.ceil(h)]) / 2.0
    # rank bookkeeping stays exact when a quantile rides a duplicate run
    dup = spark.createDataFrame([(1.0,)] * 900 + [(2.0,)] * 100, "v double")
    _, v = orderstats.exact_quantile_values(dup, ["v"], [0.5, 0.95])
    assert v["v"] == [1.0, 2.0]


def test_full_double_range_refines_not_collects(spark):
    """(hi - lo) overflowing to inf must not skip refinement: half-space
    bucket arithmetic keeps the width finite for ANY finite bounds, so
    a full-double-range column still resolves through histograms (a
    degenerate-width shortcut here would value-pass-collect every
    distinct value — the exact OOM class this module exists to kill)."""
    vals = [-1.7e308, 1.7e308] + [float(i) * 1.000001 for i in range(3000)]
    df = spark.createDataFrame([(v,) for v in vals], "x double").repartition(8)
    qs = [0.0, 0.25, 0.5, 0.9, 1.0]
    _, got = orderstats.exact_quantile_values(df, ["x"], qs)
    exp = df.agg(
        F.percentile("x", F.array(*[F.lit(q) for q in qs]))
    ).first()[0]
    assert [_bits(g) for g in got["x"]] == [_bits(e) for e in exp]


def test_duplicate_heap_with_far_outliers_converges(spark):
    """> BINS duplicates of a tiny value beside huge outliers: range
    snapping (children take their members' true min/max) resolves in a
    couple of passes — the unsnapped crawl needed ~190 width-halvings
    and tripped the 64-pass guard."""
    vals = [1e-300] * 1100 + [1e200, -1e200]
    df = spark.createDataFrame([(v,) for v in vals], "x double").repartition(4)
    _, got = orderstats.exact_quantile_values(df, ["x"], [0.5])
    exp = df.agg(F.percentile("x", F.lit(0.5))).first()[0]
    assert _bits(got["x"][0]) == _bits(exp)
    # subnormal collisions in half-space resolve via the value pass
    sub = [5e-324 * i for i in range(1, 2000)] + [1e308]
    df2 = spark.createDataFrame([(v,) for v in sub], "x double")
    _, got2 = orderstats.exact_quantile_values(df2, ["x"], [0.1, 0.5, 0.99])
    exp2 = df2.agg(
        F.percentile("x", F.array(F.lit(0.1), F.lit(0.5), F.lit(0.99)))
    ).first()[0]
    assert [_bits(g) for g in got2["x"]] == [_bits(e) for e in exp2]


def test_order_stats_rejects_out_of_range_rank(spark):
    df = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    with pytest.raises(ValueError, match="out of range"):
        orderstats.order_stats(df, {"v": lambda n: [n]})
