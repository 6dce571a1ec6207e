"""EWM parameter variants vs pandas itself (reference test_window.py:23-27
checks span-based adjust=True; here alpha= and adjust=False too)."""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from parallel_pandas_spark.operators import windows  # noqa: E402
from parallel_pandas_spark.sources import from_pandas  # noqa: E402


def _check(spark, *, span=None, alpha=None, adjust=True):
    pdf = pd.DataFrame(
        {
            "g": [0] * 20 + [1] * 20,
            "i": list(range(20)) * 2,
            "x": [float((i * 13) % 7) for i in range(40)],
        }
    )
    df = from_pandas(spark, pdf)
    out = windows.ewm(
        df, ["x"], order_by=["i"], partition_by=["g"],
        funcs=("mean", "var"), span=span, alpha=alpha, adjust=adjust,
    )
    last = {
        r["g"]: (r["x_ewm_mean"], r["x_ewm_var"])
        for r in out.where(F.col("i") == 19).collect()
    }
    kw = {"span": span} if span is not None else {"alpha": alpha}
    for g in (0, 1):
        e = pdf[pdf.g == g].sort_values("i")["x"].ewm(adjust=adjust, **kw)
        assert abs(last[g][0] - e.mean().iloc[-1]) < 1e-12
        assert abs(last[g][1] - e.var().iloc[-1]) < 1e-12


def test_ewm_span_adjust_true(spark):
    _check(spark, span=5.0, adjust=True)


def test_ewm_alpha_adjust_false(spark):
    _check(spark, alpha=0.3, adjust=False)
