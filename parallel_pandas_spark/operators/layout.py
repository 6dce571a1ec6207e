"""Data-layout optimization: Z-order (Morton-curve) clustering for
multi-dimensional data skipping.

A parquet scan prunes row groups whose min/max stats exclude the
predicate. Sorting by ONE column gives perfect pruning on that column
and none on any other; interleaving the bits of k columns' quantized
values (the Morton curve) keeps rows that are close in EVERY dimension
close in the file order, so min/max ranges stay tight on ALL k columns
at once — the layout trick behind Delta/Iceberg OPTIMIZE ZORDER BY,
re-expressed here as plain Spark expressions:

1. per column: an exact 1-row min/max aggregate (broadcast cross join —
   metadata-sized, the repo's standard pattern) scales the value to an
   unsigned ``bits``-wide integer grid;
2. the z-value interleaves those grids bit-by-bit with shiftleft/OR —
   pure JVM whole-stage-codegen expressions, no UDF;
3. ``repartitionByRange`` on the z-value (range exchange = contiguous
   curve segments per output file) + ``sortWithinPartitions`` orders
   rows inside each file.

The operator changes LAYOUT only — the row multiset is untouched
(pinned by tests), so correctness oracles are unaffected; the win is
measured directly in tests by counting parquet row groups whose
min/max stats survive a 2-d predicate (z-ordered layout prunes on both
dimensions; a 1-d sort only on its own).

At 100 TB: one range exchange over the data (the same cost as any
global sort), after which every future multi-dimension selective scan
reads a fraction of the files. NULLs sort to grid cell 0 (Spark casts
NULL arithmetic to NULL; coalesce pins them) so they cluster together
rather than scattering.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _grid(col: Column, mn: Column, mx: Column, bits: int) -> Column:
    """Scale col into [0, 2^bits) as a LONG; NULL -> 0; constant
    column -> 0 (mx == mn guard)."""
    width = F.lit(float((1 << bits) - 1))
    span = mx - mn
    scaled = F.when(
        span > 0, F.floor((col.cast("double") - mn) / span * width)
    ).otherwise(F.lit(0))
    clamped = F.least(
        F.greatest(scaled, F.lit(0)), F.lit((1 << bits) - 1)
    )
    return F.coalesce(clamped, F.lit(0)).cast("long")


def zvalue(
    df: DataFrame, cols: Sequence[str], bits: int = 16
) -> DataFrame:
    """Append a ``__z`` column: the Morton interleave of ``cols``
    quantized to ``bits`` each (k·bits total bits must fit a LONG:
    k·bits <= 63). Adds one metadata-sized min/max aggregate joined by
    a broadcast cross — the data itself is scanned once, narrowly."""
    k = len(cols)
    if k * bits > 63:
        raise ValueError(f"{k} cols x {bits} bits > 63 — shrink bits")
    aggs = []
    for c in cols:
        # nanvl: one NaN row would otherwise make max() return NaN
        # (Spark ranks NaN greatest), poisoning span for EVERY row and
        # silently collapsing the dimension to one grid cell; NaN rows
        # themselves pin to cell 0 like NULLs (self-review r10)
        cs = F.nanvl(F.col(c).cast("double"), F.lit(None).cast("double"))
        aggs.append(F.min(cs).alias(f"__mn_{c}"))
        aggs.append(F.max(cs).alias(f"__mx_{c}"))
    bounds = df.agg(*aggs)  # 1 row
    out = df.crossJoin(F.broadcast(bounds))
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        cv = F.nanvl(F.col(c).cast("double"), F.lit(None).cast("double"))
        g = _grid(cv, F.col(f"__mn_{c}"), F.col(f"__mx_{c}"), bits)
        for i in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(g, i).bitwiseAND(F.lit(1)), i * k + j
                )
            )
    return out.withColumn("__z", z).drop(
        *[f"__mn_{c}" for c in cols], *[f"__mx_{c}" for c in cols]
    )


def derived_file_count(
    df: DataFrame, target_file_bytes: int = 128 << 20
) -> int:
    """Output file count from the MEASURED input size (the shards/
    vecstore sizing rule applied to layout): Catalyst's plan statistics
    for a file-backed frame are the summed file sizes from the scan's
    file index — plan-time cheap, no job. ceil(bytes / target) with a
    floor of 1; when the plan cannot provide a real size (non-file
    sources report a conservative huge sentinel) fall back to 8 files
    rather than exploding the partition count."""
    size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    if size <= 0 or size >= 1 << 60:  # unknown / sentinel stats
        return 8
    return max(1, -(-size // int(target_file_bytes)))


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    num_files: int | None = None,
    bits: int = 16,
    target_file_bytes: int = 128 << 20,
) -> None:
    """Write ``df`` to parquet clustered by the Morton curve over
    ``cols``: range-partition on the z-value (contiguous curve segments
    per file) and sort within each file, then drop the helper column.
    One range exchange; every later scan filtering on ANY of ``cols``
    prunes files and row groups by min/max stats. ``num_files`` defaults
    to the MEASURED input bytes / ``target_file_bytes``
    (:func:`derived_file_count`) — a static count either under-splits a
    grown table into unprunable monoliths or sprays a small one into
    tiny files; pass an explicit count to override."""
    if num_files is None:
        num_files = derived_file_count(df, target_file_bytes)
    zdf = zvalue(df, cols, bits)
    (
        zdf.repartitionByRange(num_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
