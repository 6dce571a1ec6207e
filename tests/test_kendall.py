"""Distributed exact Kendall τ-b vs scipy-free brute force.

The reference exposes kendall through ``p_corr(method="kendall")`` backed by
an O(n²) numba kernel (/root/reference/parallel_pandas/_numba.py:7-158);
these tests pin our distributed decomposition (operators/kendall.py) to a
local quadratic reference on adversarial shapes: heavy ties, constant
columns, tiny partitions, and many-bucket vs few-bucket configs.
"""

from __future__ import annotations

import math
import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parallel_pandas_spark.operators.kendall import kendall_tau_exact  # noqa: E402


def _brute(x: np.ndarray, y: np.ndarray):
    n = len(x)
    conc = disc = 0
    for i in range(n):
        dx = x[i] - x[i + 1 :]
        dy = y[i] - y[i + 1 :]
        s = dx * dy
        conc += int((s > 0).sum())
        disc += int((s < 0).sum())
    n0 = n * (n - 1) // 2
    _, cx = np.unique(x, return_counts=True)
    _, cy = np.unique(y, return_counts=True)
    n1 = int((cx * (cx - 1) // 2).sum())
    n2 = int((cy * (cy - 1) // 2).sum())
    denom = math.sqrt(float(n0 - n1) * float(n0 - n2)) if n0 > n1 and n0 > n2 else 0.0
    tau = (conc - disc) / denom if denom else float("nan")
    return disc, tau


def _run(spark, x, y, **kw):
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, y)], "x double, y double"
    )
    row = kendall_tau_exact(df, "x", "y", **kw).first()
    return row["n"], row["d"], row["tau"]


def test_kendall_heavy_ties_matches_brute(spark):
    rng = np.random.default_rng(7)
    x = rng.integers(0, 12, 600).astype(float)  # heavy x-ties
    y = rng.integers(0, 5, 600).astype(float)  # heavier y-ties
    d_ref, tau_ref = _brute(x, y)
    n, d, tau = _run(spark, x, y, num_buckets=8, num_partitions=7)
    assert n == 600
    assert d == d_ref
    assert tau == tau_ref  # bit-exact: integer counts + identical final FP ops


def test_kendall_continuous_matches_brute(spark):
    rng = np.random.default_rng(11)
    x = rng.normal(size=400)
    y = 0.3 * x + rng.normal(size=400)
    d_ref, tau_ref = _brute(x, y)
    n, d, tau = _run(spark, x, y, num_buckets=16, num_partitions=5)
    assert (n, d) == (400, d_ref)
    assert tau == tau_ref


def test_kendall_constant_column_nan(spark):
    x = np.arange(50, dtype=float)
    y = np.zeros(50)
    n, d, tau = _run(spark, x, y, num_buckets=4, num_partitions=3)
    assert (n, d) == (50, 0)
    assert math.isnan(tau)


def test_kendall_tiny_and_bucket_invariance(spark):
    rng = np.random.default_rng(3)
    x = rng.integers(0, 4, 37).astype(float)
    y = rng.integers(0, 4, 37).astype(float)
    d_ref, tau_ref = _brute(x, y)
    for b, p in [(2, 1), (64, 16)]:
        n, d, tau = _run(spark, x, y, num_buckets=b, num_partitions=p)
        assert (n, d) == (37, d_ref)
        assert tau == tau_ref


def test_kendall_multi_randomized_matches_brute(spark):
    """Randomized battery for the keyed multi-pair kernel: several seeds ×
    mixed tie densities, every pair checked against the O(n^2) reference in
    ONE kernel invocation per frame (kendall_tau_exact_multi is the engine
    behind corr_matrix(method='kendall'))."""
    from parallel_pandas_spark.operators.reductions import corr_matrix

    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(40, 160))
        pdf = pd.DataFrame(
            {
                "a": rng.integers(0, max(2, n // 20), n).astype(float),
                "b": rng.normal(size=n).round(int(rng.integers(0, 3))),
                "c": np.resize(np.repeat(rng.normal(size=max(1, n // 8)), 8), n),
            }
        )
        got = {
            (r["col_x"], r["col_y"]): r["corr"]
            for r in corr_matrix(
                spark.createDataFrame(pdf), ["a", "b", "c"], method="kendall"
            ).collect()
        }
        for (x, y), v in got.items():
            _, ref = _brute(pdf[x].to_numpy(), pdf[y].to_numpy())
            if math.isnan(ref):
                assert v is None or math.isnan(v), (seed, x, y)
            else:
                assert v == pytest.approx(ref, abs=1e-12), (seed, x, y)
