"""THE canonical NaN / non-finite masking helpers.

Four local variants of these helpers used to coexist (windows._finite /
_non_nan, reductions.nan_safe / _floating, elementwise._missing, inline
``nanvl`` in ordered) and the duplication caused a real drift bug in r6
(pct_change's fill path missed its NaN mask). Every operator module now
imports from here; do NOT re-grow local copies.

Three distinct missing-ness contracts exist in pandas, and each gets one
helper — they are NOT interchangeable:

- :func:`nan_safe` — NaN → NULL, ±inf KEPT. pandas full-frame
  reductions (sum/mean/var/...) skip NaN by default but propagate inf
  by plain IEEE. Used by reductions, cumulatives, rank, fills.
- :func:`finite` — NaN AND ±inf → NULL. pandas *windowed* aggregation
  kernels treat every non-finite value as a missing observation
  (verified pandas 2.2: ``rolling.max`` over a frame containing +inf
  returns the finite max, and ``min_periods`` counts only finite
  values). Used by the rolling/expanding kernels only.
- :func:`non_nan` — NaN → NULL, inf KEPT; the one window exception:
  ``rolling.count`` counts inf but not NaN.
- :func:`missing_cond` — BOOLEAN "is missing" (NULL or NaN) for
  fillna/dropna-style predicates.

All helpers are plain column expressions (``nanvl`` / ``isnan`` /
comparisons), so they stay inside whole-stage codegen — no UDFs, no
extra pass over the data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def is_floating(df: DataFrame, col: str) -> bool:
    """True if ``col`` is float/double — the only types that can carry
    NaN/inf, so every mask below is a no-op (and skipped) otherwise."""
    try:
        return isinstance(df.schema[col].dataType, (T.DoubleType, T.FloatType))
    except Exception:
        return False


def nan_safe_col(c: Column) -> Column:
    """NaN → NULL on a KNOWN-floating column expression (inf kept)."""
    return F.nanvl(c, F.lit(None).cast("double"))


def nan_safe(df: DataFrame, col: str) -> Column:
    """pandas ``skipna=True`` shim for TRUE NaN values: parquet-borne NaN
    is a VALUE to Spark (it poisons sums, sorts above every double, and
    counts as an observation), but pandas treats it as missing in every
    reduction by default. Mask NaN → NULL at the aggregation input for
    floating columns. ±inf is KEPT: pandas full-frame stats propagate
    inf by IEEE, unlike its window kernels which drop non-finite
    entirely (:func:`finite`)."""
    c = F.col(col)
    if is_floating(df, col):
        return nan_safe_col(c)
    return c


def finite(c: Column) -> Column:
    """Non-finite → NULL, for the WINDOW kernels (see module docstring:
    pandas windowed aggregations treat NaN and ±inf alike as missing,
    including for ``min_periods``)."""
    return F.when(~(F.isnan(c) | (F.abs(c) == F.lit(float("inf")))), c)


def non_nan(c: Column) -> Column:
    """NaN → NULL, inf kept — ``rolling.count``'s contract."""
    return F.when(~F.isnan(c), c)


def missing_cond(df: DataFrame, col: str) -> Column:
    """Boolean "value is missing" (NULL, or NaN on floating columns) —
    the fillna/dropna predicate."""
    cond = F.col(col).isNull()
    if is_floating(df, col):
        cond = cond | F.isnan(F.col(col))
    return cond
