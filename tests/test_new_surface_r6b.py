"""Round-6b parity surface: quantile interpolation modes and the EWM
kwarg passthrough (min_periods / ignore_na / adjust across all four decay
parameterizations), each locked by a randomized differential twin against
real pandas — the QA technique that has caught every silent parity bug so
far (r5: 6 bugs; r6: 4 bugs)."""

import math

import numpy as np
import pandas as pd
import pytest

from parallel_pandas_spark.api import ParallelFrame
from parallel_pandas_spark.operators import reductions, windows


def _mk_frame(seed: int, n: int = 400) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    x = rng.normal(50.0, 12.0, n)
    y = rng.exponential(3.0, n)
    # inject TRUE NaN (parquet-representable, survives the Arrow transfer)
    x[rng.random(n) < 0.12] = np.nan
    y[rng.random(n) < 0.05] = np.nan
    return pd.DataFrame(
        {
            "ord": np.arange(n, dtype=np.int64),
            "grp": rng.integers(0, 7, n),
            "x": x,
            "y": y,
        }
    )


@pytest.mark.parametrize("seed", [11, 12, 13])
@pytest.mark.parametrize(
    "interp", ["linear", "lower", "higher", "nearest", "midpoint"]
)
def test_quantile_interpolation_randomized_vs_pandas(spark, seed, interp):
    """p_quantile(interpolation=) — all five numpy modes over NaN-bearing
    doubles match pandas Series.quantile exactly (ulp-level tolerance for
    the literal-probability re-expression of integer indices)."""
    pdf = _mk_frame(seed)
    sdf = spark.createDataFrame(pdf)
    qs = [0.0, 0.1, 0.25, 0.5, 0.6180339887, 0.75, 0.9, 1.0]
    got = (
        reductions.quantile(sdf, ["x", "y"], qs, interpolation=interp)
        .toPandas()
        .sort_values("q")
        .reset_index(drop=True)
    )
    for c in ("x", "y"):
        want = pdf[c].quantile(qs, interpolation=interp).to_numpy()
        np.testing.assert_allclose(
            got[c].to_numpy(), want, rtol=1e-9, atol=1e-9,
            err_msg=f"col={c} interp={interp} seed={seed}",
        )


def test_quantile_interpolation_all_nan_column(spark):
    """A column with zero non-NaN observations yields NULL per q (pandas
    returns NaN), and n==1 collapses every mode to the single point."""
    pdf = pd.DataFrame(
        {"allnan": [np.nan, np.nan, np.nan], "one": [np.nan, 7.5, np.nan]}
    )
    sdf = spark.createDataFrame(pdf)
    for interp in ("lower", "higher", "nearest", "midpoint"):
        got = reductions.quantile(
            sdf, ["allnan", "one"], [0.25, 0.75], interpolation=interp
        ).toPandas()
        assert got["allnan"].isna().all()
        assert (got["one"] == 7.5).all()


def test_quantile_interpolation_rejects_bad_args(spark):
    pdf = pd.DataFrame({"x": [1.0, 2.0]})
    sdf = spark.createDataFrame(pdf)
    with pytest.raises(ValueError, match="unknown interpolation"):
        reductions.quantile(sdf, ["x"], [0.5], interpolation="cubic")
    with pytest.raises(ValueError, match="linear"):
        reductions.quantile(sdf, ["x"], [0.5], exact=False, interpolation="lower")


@pytest.mark.parametrize("seed", [21, 22])
def test_ewm_kwargs_randomized_vs_pandas(spark, seed):
    """EWM min_periods / ignore_na / adjust forwarded through the
    partition-vectorized grouped path match pandas groupby().ewm() for
    every decay parameterization and every op — NaN-bearing input, so
    ignore_na=True vs False produce genuinely different weights."""
    pdf = _mk_frame(seed, n=300)
    sdf = spark.createDataFrame(pdf)
    cases = [
        (dict(span=5.0), dict(adjust=True, min_periods=3, ignore_na=False)),
        (dict(com=2.0), dict(adjust=False, min_periods=0, ignore_na=True)),
        (dict(alpha=0.35), dict(adjust=True, min_periods=5, ignore_na=True)),
        (dict(halflife=4.0), dict(adjust=False, min_periods=2, ignore_na=False)),
    ]
    for decay, extra in cases:
        # pandas itself raises NotImplementedError for ewm.sum(adjust=False)
        fns = ("mean", "std", "var") if not extra["adjust"] else (
            "mean", "std", "var", "sum")
        got = (
            windows.ewm(
                sdf, ["x"], ["ord"], ["grp"], funcs=fns,
                **decay, **extra,
            )
            .toPandas()
            .sort_values("ord")
            .reset_index(drop=True)
        )
        e = pdf.sort_values("ord").groupby("grp")["x"].ewm(**decay, **extra)
        for fn in fns:
            want = (
                getattr(e, fn)()
                .reset_index(level=0, drop=True)
                .sort_index()
                .to_numpy()
            )
            np.testing.assert_allclose(
                got[f"x_ewm_{fn}"].to_numpy(), want, rtol=1e-9, atol=1e-12,
                equal_nan=True,
                err_msg=f"decay={decay} extra={extra} fn={fn} seed={seed}",
            )


def test_api_ewm_forwards_kwargs(spark):
    """The ParallelFrame.ewm facade carries halflife/com/min_periods/
    ignore_na/adjust down to the kernel (previously span/alpha only)."""
    pdf = _mk_frame(31, n=120)
    pf = ParallelFrame(spark.createDataFrame(pdf))
    got = (
        pf.ewm(["ord"], ["grp"], com=3.0, min_periods=4,
               ignore_na=True, adjust=False)
        .p_mean(["x"])
        .toPandas()
        .sort_values("ord")
        .reset_index(drop=True)
    )
    want = (
        pdf.sort_values("ord")
        .groupby("grp")["x"]
        .ewm(com=3.0, min_periods=4, ignore_na=True, adjust=False)
        .mean()
        .reset_index(level=0, drop=True)
        .sort_index()
        .to_numpy()
    )
    np.testing.assert_allclose(
        got["x_ewm_mean"].to_numpy(), want, rtol=1e-9, atol=1e-12, equal_nan=True
    )
