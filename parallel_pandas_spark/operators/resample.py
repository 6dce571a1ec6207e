"""Time-series resampling: downsample-aggregate and asfreq/ffill upsample.

pandas ``df.resample(freq).agg(...)`` re-expressed for a distributed
engine. The pandas resampler is index-driven; here the time column is
explicit (SURVEY.md §1.4) and the bin is computed arithmetically from
epoch seconds, so the whole downsample is ``groupBy(bucket)`` — one
shuffle with map-side partial aggregation, the same shape as any grouped
aggregation at 100 TB.

``resample_asfreq`` also materializes EMPTY bins (pandas emits NaN rows
for gaps, then ``ffill()`` fills them): the bin grid is generated per
group with ``sequence()`` + explode — grid size is (range/step) per
group, data-proportional, never a driver loop — left-joined to the
aggregates, then gap rows are forward-filled with one window pass.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_UNITS = {"s": 1, "min": 60, "t": 60, "h": 3600, "d": 86400}


def _freq_seconds(freq) -> int:
    """'15min' / '1h' / '2d' / plain int seconds -> bin width in seconds."""
    if isinstance(freq, (int, float)):
        return int(freq)
    s = str(freq).strip().lower()
    num = ""
    while s and (s[0].isdigit()):
        num, s = num + s[0], s[1:]
    if s not in _UNITS:
        raise ValueError(f"unsupported freq {freq!r}; use s/min/h/d or seconds")
    return int(num or 1) * _UNITS[s]


def bucket_expr(time_col: str, freq, closed: str = "left", label: str = "left") -> Column:
    """Timestamp -> bin-label timestamp. ``closed='left'`` (pandas default
    for these freqs): bins are [lo, hi); ``closed='right'``: (lo, hi], a
    timestamp exactly on an edge joins the bin it terminates.
    ``label='left'|'right'`` picks which edge names the bin."""
    k = _freq_seconds(freq)
    ku = k * 1_000_000
    # exact integer microseconds: unix_timestamp() TRUNCATES sub-second
    # components (mis-bins edge values under closed='right'), and float
    # epoch division can round across a bin edge at the ulp. FLOOR
    # division via pmod, not Spark's `div` — `div` truncates toward
    # zero, which mis-bins PRE-EPOCH (negative-micros) timestamps one
    # bucket high; pmod(x, k) is in [0, k) for every sign, so
    # x - pmod(x, k) is the floored bin start and x + pmod(-x, k) the
    # ceiled bin end, matching pandas (and DuckDB's floor `//`) exactly.
    ep = F.expr(f"unix_micros(CAST(`{time_col}` AS TIMESTAMP))")
    if closed == "left":
        lo_us = ep - F.pmod(ep, F.lit(ku))
    elif closed == "right":
        # (lo, hi]: an edge-exact value terminates its bin (hi = value)
        lo_us = ep + F.pmod(-ep, F.lit(ku)) - ku
    else:
        raise ValueError(f"closed must be 'left' or 'right', got {closed!r}")
    lo = (lo_us / F.lit(1_000_000)).cast("long")  # exact: lo_us % 1e6 == 0
    lab = lo if label == "left" else lo + k
    return F.timestamp_seconds(lab.cast("long"))


def resample_agg(
    df: DataFrame,
    time_col: str,
    freq,
    aggs: Sequence[Column],
    partition_by: Sequence[str] | None = None,
    closed: str = "left",
    label: str = "left",
    out_col: str = "bin",
) -> DataFrame:
    """Downsample: pandas ``resample(freq, closed=, label=).agg(...)``
    (optionally per group, pandas ``groupby(...).resample(...)``). One
    shuffle on (partition keys, bin)."""
    b = bucket_expr(time_col, freq, closed, label)
    return (
        df.withColumn("__bin", b)
        .groupBy(*(partition_by or []), "__bin")
        .agg(*aggs)
        .withColumnRenamed("__bin", out_col)
    )


def resample_asfreq(
    df: DataFrame,
    time_col: str,
    freq,
    aggs: Sequence[Column],
    fill_cols: Sequence[str],
    partition_by: Sequence[str] | None = None,
    method: str | None = "ffill",
    closed: str = "left",
    label: str = "left",
    out_col: str = "bin",
) -> DataFrame:
    """Downsample onto the FULL bin grid (empty bins present), then
    optionally forward-fill gap rows — pandas
    ``resample(freq).agg(...)`` followed by ``.ffill()``.

    The grid spans each group's own [min, max] bin range (pandas' grid is
    the global index range; per-group is the distributed-sane contract and
    equals pandas when groups share the range — documented). Grid rows
    come from ``sequence()``+explode over the per-group 2-row agg — data
    proportional; the join back is on (group, bin), one shuffle; ffill is
    one window pass with ``last(ignorenulls)``.
    """
    k = _freq_seconds(freq)
    # closed/label thread through to the binning; the grid arithmetic is
    # unchanged either way (labels stay k-spaced regardless of which edge
    # names the bin).
    agged = resample_agg(
        df, time_col, freq, aggs, partition_by,
        closed=closed, label=label, out_col="__b",
    )
    parts = list(partition_by or [])
    bounds = agged.groupBy(*parts).agg(
        F.min("__b").alias("__lo"), F.max("__b").alias("__hi")
    )
    grid = bounds.select(
        *parts,
        F.explode(
            F.sequence(
                F.col("__lo"), F.col("__hi"),
                F.expr(f"INTERVAL {k} SECONDS"),
            )
        ).alias("__b"),
    )
    full = grid.join(agged, [*parts, "__b"], "left")
    if method is None:
        return full.withColumnRenamed("__b", out_col)
    if method != "ffill":
        raise NotImplementedError(f"fill method {method!r}; use 'ffill' or None")
    w = (
        (Window.partitionBy(*parts) if parts else Window.partitionBy())
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = full
    for c in fill_cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out.withColumnRenamed("__b", out_col)
