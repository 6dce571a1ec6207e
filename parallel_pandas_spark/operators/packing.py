"""Token-budget sequence packing for LLM pretraining pipelines.

Packing concatenates documents into fixed-token-budget training sequences.
Exact greedy packing is inherently sequential — one running total over the
whole corpus — which no engine parallelizes at 100 TB. The scalable unit
here is a hash bucket (the same decomposition EWM uses for series): docs
are assigned to ``num_buckets`` buckets by content hash, ordered
deterministically within the bucket, and packed by offset — pack *p* of a
bucket holds the docs whose exclusive running-token-total lies in
[p·budget, (p+1)·budget). Buckets pack in parallel with one shuffle, the
whole assignment is window expressions (exact integer sums, no UDF), and
the result is layout-independent and oracle-replayable.

Semantics note (documented, not hidden): offset packing lets a pack
overrun ``budget`` by less than its last doc's tokens — the standard
approximation when the downstream loader truncates or wraps. Docs longer
than ``budget`` get a pack of their own. Exact non-overflowing greedy
would need a sequential scan per bucket (an ``applyInPandas`` the caller
can layer on); every published at-scale packer accepts one of these two
relaxations.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import md5_long


def pack_sequences(
    df: DataFrame,
    id_cols: Sequence[str],
    token_col: str,
    budget: int,
    num_buckets: int = 64,
    seed: int = 0,
    out_prefix: str = "pack",
) -> DataFrame:
    """Assign each doc a (bucket, pack_id, offset) for fixed-budget
    packing. Adds ``{out_prefix}_bucket``, ``{out_prefix}_id`` (pack index
    within the bucket) and ``{out_prefix}_offset`` (exclusive token start
    within the bucket stream)."""
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in id_cols])
    h = md5_long(key, seed=seed)
    bucket = F.pmod(h, F.lit(num_buckets))
    out = df.withColumn(f"{out_prefix}_bucket", bucket).withColumn("__ord", h)
    w = (
        Window.partitionBy(f"{out_prefix}_bucket")
        .orderBy("__ord", *id_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum(F.col(token_col).cast("long")).over(w), F.lit(0))
    return (
        out.withColumn(f"{out_prefix}_offset", offset)
        .withColumn(
            f"{out_prefix}_id",
            F.floor(F.col(f"{out_prefix}_offset") / F.lit(int(budget))),
        )
        .drop("__ord")
    )


def pack_sequences_sql(
    id_cols: Sequence[str],
    token_col: str,
    budget: int,
    num_buckets: int = 64,
    seed: int = 0,
    hexfold=None,
    out_prefix: str = "pack",
) -> str:
    """DuckDB twin emitting the same three packing columns as a SELECT
    suffix; caller embeds it over the source table. ``hexfold`` is the
    md5-hex → BIGINT folder shared with the dedup oracles."""
    key = " || chr(31) || ".join(f"CAST({c} AS VARCHAR)" for c in id_cols)
    seeded = f"md5('s{seed}:' || {key})"
    h = f"({hexfold(seeded)})"
    ordcols = ", ".join(id_cols)
    return f"""
SELECT *, CAST(FLOOR({out_prefix}_offset / {budget}) AS BIGINT) AS {out_prefix}_id
FROM (
  SELECT *,
    COALESCE(SUM(CAST({token_col} AS BIGINT)) OVER (
      PARTITION BY {out_prefix}_bucket ORDER BY __ord, {ordcols}
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS {out_prefix}_offset
  FROM (SELECT *, {h} % {num_buckets} AS {out_prefix}_bucket, {h} AS __ord FROM __SRC__)
)
"""
