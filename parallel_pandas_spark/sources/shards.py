"""Sharded training-data sink: deterministic shard assignment, size-bounded
parquet files, and a read-back manifest.

The terminal step of a corpus pipeline at 100 TB is not one parquet
directory — it is N shards of bounded file size that a data loader can
map to workers. This module writes that layout with Spark primitives
only (no custom commit protocol):

- shard assignment is a DETERMINISTIC function of the data
  (``id % n_shards``), never round-robin or task-id — so a re-run, a
  speculative task, or a different cluster produces byte-identical shard
  membership, and the manifest is oracle-checkable from the source table;
- ``repartition(n_shards, shard)`` gives one shuffle; each output shard
  is then written by the task(s) that own its hash bucket, and
  ``maxRecordsPerFile`` splits a shard into ``ceil(rows / max)`` files of
  bounded size — the knob that keeps any single file loadable;
- ``sortWithinPartitions`` (optional) lays rows out in key order inside
  each file for range-scan locality (zone-map/row-group pruning on read);
- the manifest is computed by READING BACK the written files — count,
  id-sum checksum, id range, file count per shard — so a manifest row is
  end-to-end evidence the sink lost nothing, not a pre-write estimate.

No counterpart in the reference (its sinks are pandas ``to_*``); the
shard/manifest design follows standard large-corpus practice (e.g. WebDataset
/ Parquet dataset layouts in public LLM-data pipelines).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int,
    max_records_per_file: int | None = None,
    order_within: Sequence[str] | None = None,
) -> None:
    """Write ``df`` as ``shard=<i>/part-*.parquet`` with deterministic
    membership ``pmod(id, n_shards)`` and at most ``max_records_per_file``
    rows per file."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    out = df.withColumn(
        "shard", F.pmod(F.col(id_col), F.lit(n_shards)).cast("int")
    )
    # one shuffle; a shard never spans tasks, so maxRecordsPerFile yields
    # exactly ceil(shard_rows / max) files per shard (deterministic)
    out = out.repartition(n_shards, "shard")
    if order_within:
        out = out.sortWithinPartitions("shard", *order_within)
    writer = out.write.mode("overwrite").partitionBy("shard")
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)


def shard_manifest(spark: SparkSession, path: str, id_col: str) -> DataFrame:
    """Read the shard layout back and emit one manifest row per shard:
    row count, id-sum checksum, id range, and file count. Aggregates are
    computed from the written files themselves (scan → groupBy shard),
    so a match against the source table proves the sink round-trip."""
    # input_file_name() is non-deterministic, so Spark rejects it inside
    # an aggregate — project it to a column first
    d = spark.read.parquet(path).withColumn("__file", F.input_file_name())
    return d.groupBy("shard").agg(
        F.count("*").alias("n_rows"),
        # DECIMAL(38,0) accumulator, DOUBLE surface: a shard of a 100 TB
        # corpus holds ~1e10 rows of up-to-1e12 ids — a raw SUM(BIGINT)
        # checksum wraps exactly when the manifest matters most
        F.sum(F.col(id_col).cast("decimal(38,0)")).cast("double").alias("id_sum"),
        F.min(id_col).cast("long").alias("id_min"),
        F.max(id_col).cast("long").alias("id_max"),
        F.countDistinct("__file").alias("n_files"),
    )
