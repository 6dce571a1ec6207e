"""Round-7 differential fuzzing of the r6 hand-written compilers
(r6 verdict queue #8): the pandas-``query()``-string → SQL compiler
(queryexpr.py — new parsing code, highest residual bug density) and the
resample binning grid (closed/label × edge timestamps).

Query strings are generated from a seeded grammar: operator-precedence
traps (``&``/``|``/``~`` vs comparisons), chained compares, signed ``%``,
``**``, ``in``/``not in``, ``@var`` host references, backtick-quoted
names with spaces — each compared against real ``DataFrame.query`` on
the same frame. Data is NaN-free by construction: pandas and SQL
genuinely diverge on ``~(NaN > x)`` (pandas: True, three-valued SQL:
NULL→drop), and that documented divergence is not what this fuzzer
hunts — parser/precedence bugs are.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd

from parallel_pandas_spark.functions.queryexpr import to_sql


def from_pandas(spark, pdf):
    return spark.createDataFrame(pdf)


def _frame(seed: int, n: int = 80) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "a": rng.integers(-6, 7, n),
            "b": rng.integers(-6, 7, n),
            "f": rng.integers(-20, 21, n) / 4.0,  # exact quarters, no NaN
            "s": rng.choice(list("abcxyz"), n),
            "x y": rng.integers(0, 5, n),  # backtick-only name
        }
    )


ENV = {"lo": -2, "hi": 3, "name": "x", "opts": ["a", "x", "z"]}


def _gen_num(r: random.Random, depth: int) -> str:
    if depth <= 0 or r.random() < 0.4:
        return r.choice(["a", "b", "f", "`x y`", "@lo", "@hi",
                         str(r.randint(-5, 5))])
    op = r.choice(["+", "-", "*", "%", "**"])
    left, right = _gen_num(r, depth - 1), _gen_num(r, depth - 1)
    if op == "%":
        # avoid a literal-0 or expression divisor that hits 0 (pandas
        # raises / yields inf; SQL NULLs) — fuzz the SIGN semantics with
        # nonzero literal divisors only
        right = str(r.choice([-4, -3, 3, 4, 5]))
    if op == "**":
        left, right = f"({left})", str(r.randint(0, 2))
    return f"({left} {op} {right})"


def _gen_cmp(r: random.Random, depth: int) -> str:
    kind = r.random()
    if kind < 0.15:
        rhs = r.choice(["'x'", "'c'", "@name"])
        return f"s {r.choice(['==', '!=', '<', '>='])} {rhs}"
    if kind < 0.3:
        return f"{r.choice(['a', 'b', '`x y`'])} {r.choice(['in', 'not in'])} [1, 2, 4]"
    if kind < 0.4:
        return "s in @opts"
    if kind < 0.55:  # chained comparison
        lo, hi = sorted((r.randint(-4, 0), r.randint(0, 4)))
        return f"{lo} {r.choice(['<', '<='])} {r.choice(['a', 'b', 'f'])} {r.choice(['<', '<='])} {hi}"
    op = r.choice(["<", "<=", ">", ">=", "==", "!="])
    return f"{_gen_num(r, depth)} {op} {_gen_num(r, depth)}"


def _gen_bool(r: random.Random, depth: int) -> str:
    if depth <= 0 or r.random() < 0.45:
        return _gen_cmp(r, depth)
    k = r.random()
    if k < 0.2:
        return f"~({_gen_bool(r, depth - 1)})"
    if k < 0.3:
        return f"not ({_gen_bool(r, depth - 1)})"
    a, b = _gen_bool(r, depth - 1), _gen_bool(r, depth - 1)
    return f"({a}) {r.choice(['&', '|', 'and', 'or'])} ({b})"


def test_query_compiler_fuzz_vs_pandas(spark):
    pdf = _frame(7)
    dfi = from_pandas(spark, pdf.reset_index())
    n_checked = 0
    for seed in range(160):
        r = random.Random(5000 + seed)
        expr = _gen_bool(r, 3)
        try:
            want = pdf.query(expr, local_dict=dict(ENV)).index.tolist()
        except Exception:
            continue  # grammar produced something pandas rejects; skip
        sql = to_sql(expr, env=ENV)
        # execute via an index column so row identity survives the filter
        got = sorted(row["index"] for row in dfi.where(sql).collect())
        assert got == sorted(want), (expr, sql)
        n_checked += 1
    # the grammar must actually produce mostly-valid pandas expressions
    assert n_checked >= 100, n_checked


def test_query_compiler_precedence_corpus(spark):
    """Hand-picked precedence traps, exact pandas twins."""
    pdf = _frame(11)
    dfi = from_pandas(spark, pdf.reset_index())
    corpus = [
        "a > 1 & b == 2",          # & binds LOOSER than > in pandas
        "a > 1 | b < -1 & f > 0",  # & binds tighter than |
        "~(a > 1) & b != 0",
        "-3 < a - b <= 2",
        "a % -4 == -1",            # Python sign-of-divisor semantics
        "-a % 3 == 2",
        "(a + b) ** 2 >= 9",
        "`x y` + 1 in [2, 3]",
        "s == 'x' or s == 'z' and a > 0",
        "a in [1, 2] | b in [3, 4]",
        "f * 2 != a",
        "not a > 0 and not b > 0",
    ]
    for expr in corpus:
        want = sorted(pdf.query(expr, local_dict=dict(ENV)).index.tolist())
        got = sorted(
            row["index"] for row in dfi.where(to_sql(expr, env=ENV)).collect()
        )
        assert got == want, expr


def test_resample_grid_fuzz_vs_pandas(spark):
    """Randomized closed/label grids over edge-hugging timestamps
    (bin-exact edges, sub-second offsets, pre-epoch) vs pandas
    resample().sum(min_count=1)."""
    from pyspark.sql import functions as F

    from parallel_pandas_spark.operators import resample as rs

    for seed in range(12):
        rng = np.random.default_rng(900 + seed)
        n = 60
        base = pd.Timestamp("2024-03-01")
        # offsets engineered to land ON bin edges often, plus sub-second
        secs = rng.choice(
            np.r_[
                np.arange(0, 3600, 300),          # exact 5-min edges
                rng.integers(0, 3600, 20),        # arbitrary
            ],
            n,
        ).astype("int64")
        micro = rng.choice([0, 0, 0, 1, 999_999], n)
        ts = base + pd.to_timedelta(secs, unit="s") + pd.to_timedelta(micro, unit="us")
        pdf = pd.DataFrame({"ts": ts, "v": rng.integers(-5, 10, n).astype(float)})
        freq = rng.choice(["5min", "10min", "1h"])
        closed = rng.choice(["left", "right"])
        label = rng.choice(["left", "right"])

        got = (
            rs.resample_agg(
                from_pandas(spark, pdf), "ts", freq,
                [F.sum("v").alias("v")], closed=closed, label=label,
            )
            .toPandas()
            .set_index("bin")["v"]
            .sort_index()
        )
        want = (
            pdf.set_index("ts")["v"]
            .resample(freq, closed=closed, label=label)
            .sum(min_count=1)
            .dropna()  # our agg emits only non-empty bins
        )
        assert got.index.tolist() == want.index.tolist(), (seed, freq, closed, label)
        assert got.tolist() == want.tolist(), (seed, freq, closed, label)


def test_crosstab_fuzz_vs_pandas(spark):
    """crosstab across normalize modes with NaN keys on both axes — the
    r7 advisor fix (NULL keys dropped like pandas) under random data."""
    from parallel_pandas_spark.operators import reshape

    for seed in range(8):
        rng = np.random.default_rng(300 + seed)
        n = 120
        r_keys = rng.choice(["x", "y", "z", None], n, p=[0.4, 0.3, 0.2, 0.1])
        c_keys = rng.choice(["a", "b", None], n, p=[0.5, 0.4, 0.1])
        pdf = pd.DataFrame({"r": r_keys, "c": c_keys})
        df = from_pandas(spark, pdf)
        for norm in (False, "index", "all"):
            got = (
                reshape.crosstab(df, "r", "c", normalize=norm)
                .toPandas()
                .set_index("r")
                .sort_index()
            )
            want = pd.crosstab(pdf["r"], pdf["c"], normalize=norm).sort_index()
            assert sorted(got.columns) == sorted(want.columns), (seed, norm)
            for col in want.columns:
                assert np.allclose(
                    got[col].to_numpy(dtype=float), want[col].to_numpy(dtype=float)
                ), (seed, norm, col)


def test_resample_asfreq_ffill_fuzz_vs_pandas(spark):
    """asfreq grid + forward fill across closed/label combos vs pandas
    resample().sum().ffill() (single global group, the pandas-equal
    case — per-group grids are the documented distributed contract)."""
    from pyspark.sql import functions as F

    from parallel_pandas_spark.operators import resample as rs

    for seed in range(8):
        rng = np.random.default_rng(600 + seed)
        n = 40
        ts = (
            pd.Timestamp("2024-06-01")
            + pd.to_timedelta(np.sort(rng.choice(7200, n, replace=False)) * 5, unit="s")
        )
        pdf = pd.DataFrame({"ts": ts, "v": rng.integers(1, 9, n).astype(float)})
        freq = rng.choice(["10min", "30min"])
        closed = rng.choice(["left", "right"])
        label = rng.choice(["left", "right"])
        got = (
            rs.resample_asfreq(
                from_pandas(spark, pdf), "ts", freq,
                [F.sum("v").alias("v")], ("v",),
                closed=closed, label=label,
            )
            .toPandas()
            .set_index("bin")["v"]
            .sort_index()
        )
        want = (
            pdf.set_index("ts")["v"]
            .resample(freq, closed=closed, label=label)
            .sum(min_count=1)
            .ffill()
        )
        assert got.index.tolist() == want.index.tolist(), (seed, freq, closed, label)
        assert got.tolist() == want.tolist(), (seed, freq, closed, label)
