"""Joins & set operations (SURVEY.md §2.5 #25, §2.8).

The reference's only join is the unregistered ``p_merge``
(/root/reference/parallel_pandas/parallel_dataframe.py:650-687): chunk the
left side, give every worker the whole right side — literally a
broadcast-hash join. Here Catalyst picks broadcast vs shuffled-hash vs
sort-merge from statistics (plus AQE at runtime); ``merge`` only adds the
pandas-semantics surface: how/on/left_on/right_on/suffixes/indicator.

Scale notes: dimension tables get ``F.broadcast`` hints; fact-fact joins
shuffle on the key — pre-bucketing or co-partitioning both sides on the
join key removes that exchange on repeated joins (see ``bucket_write``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_HOW_MAP = {
    "inner": "inner",
    "left": "left",
    "right": "right",
    "outer": "full",
    "full": "full",
    "cross": "cross",
    "semi": "left_semi",
    "anti": "left_anti",
}


def merge(
    left: DataFrame,
    right: DataFrame,
    how: str = "inner",
    on: Sequence[str] | None = None,
    left_on: Sequence[str] | None = None,
    right_on: Sequence[str] | None = None,
    suffixes: tuple[str, str] = ("_x", "_y"),
    indicator: bool = False,
    broadcast_right: bool = False,
) -> DataFrame:
    """pandas ``merge`` semantics over Spark joins (reference p_merge).

    Overlapping non-key columns get pandas-style suffixes. ``indicator=True``
    adds the pandas ``_merge`` column ('both'/'left_only'/'right_only').
    """
    if on is not None:
        left_on = right_on = list(on)
    if left_on is None or right_on is None:
        raise ValueError("pass on= or both left_on=/right_on=")
    left_on, right_on = list(left_on), list(right_on)

    lkeys = set(left_on)
    overlap = (set(left.columns) & set(right.columns)) - (
        set(left_on) & set(right_on) if left_on == right_on else set()
    )
    lren = {c: f"{c}{suffixes[0]}" for c in overlap if c in left.columns}
    rren = {c: f"{c}{suffixes[1]}" for c in overlap if c in right.columns}
    lkeys_renamed = [lren.get(k, k) for k in left_on]
    rkeys_renamed = [rren.get(k, k) for k in right_on]

    l = left.withColumnsRenamed(lren) if lren else left
    r = right.withColumnsRenamed(rren) if rren else right
    if indicator:
        l = l.withColumn("__l", F.lit(1))
        r = r.withColumn("__r", F.lit(1))
    if broadcast_right:
        r = F.broadcast(r)

    if left_on == right_on and not (set(left_on) & overlap):
        cond = list(left_on)  # USING-style: dedups key columns
    else:
        cond = None
        for lk, rk in zip(lkeys_renamed, rkeys_renamed):
            c = l[lk] == r[rk]
            cond = c if cond is None else (cond & c)

    out = l.join(r, cond, _HOW_MAP[how])
    if indicator:
        out = out.withColumn(
            "_merge",
            F.when(F.col("__l").isNotNull() & F.col("__r").isNotNull(), "both")
            .when(F.col("__l").isNotNull(), "left_only")
            .otherwise("right_only"),
        ).drop("__l", "__r")
    return out


def semi_join(left: DataFrame, right: DataFrame, on: Sequence[str]) -> DataFrame:
    """EXISTS — rows of left with a match in right; right is never widened,
    so Spark can broadcast just its distinct keys."""
    return left.join(right, list(on), "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: Sequence[str]) -> DataFrame:
    return left.join(right, list(on), "left_anti")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_left: str,
    ts_right: str,
    by_left: Sequence[str],
    by_right: Sequence[str],
    right_cols: Sequence[str],
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right.ts <= left.ts`` within the same key (direction='backward';
    'forward' = earliest right row with ts >= left ts).
    ``tolerance_seconds`` mirrors ``pandas.merge_asof(tolerance=)``: a
    match farther than the tolerance from the left timestamp yields NULLs.

    No Spark primitive exists (SURVEY.md §2.8). A naive range join is
    O(n·m) per key; instead we union both sides tagged, sort once per key,
    and carry the last-seen right values forward with
    ``last(..., ignorenulls=True)`` — one shuffle + one ordered scan,
    the same cost as a window aggregate, robust at any key cardinality.
    Ties (equal timestamps) match, as in ``pandas.merge_asof``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")

    key_cols = [f"__k{i}" for i in range(len(by_left))]
    # tag: right rows sort before left rows at equal ts for backward
    # (so an equal-ts right row is visible to the left row), after for forward
    l = left.select(
        *[F.col(c).alias(k) for c, k in zip(by_left, key_cols)],
        F.col(ts_left).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*left.columns).alias("__lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
    )
    r = right.select(
        *[F.col(c).alias(k) for c, k in zip(by_right, key_cols)],
        F.col(ts_right).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l.schema["__lrow"].dataType).alias("__lrow"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    unioned = l.unionByName(r)

    if direction == "backward":
        w = (
            Window.partitionBy(*key_cols)
            .orderBy(F.col("__ts").asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carry = {c: F.last(f"__r_{c}", ignorenulls=True).over(w) for c in right_cols}
        carry["__mts"] = F.last(F.when(F.col("__side") == 0, F.col("__ts")), ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy(*key_cols)
            .orderBy(F.col("__ts").asc(), F.col("__side").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carry = {c: F.first(f"__r_{c}", ignorenulls=True).over(w) for c in right_cols}
        carry["__mts"] = F.first(F.when(F.col("__side") == 0, F.col("__ts")), ignorenulls=True).over(w)

    out = unioned.select(
        F.col("__ts"),
        F.col("__lrow"), F.col("__side"), *[v.alias(f"__m_{c}") for c, v in carry.items()]
    ).where(F.col("__side") == 1)
    if tolerance_seconds is not None:
        within = (
            F.abs(
                F.col("__ts").cast("double") - F.col("__m___mts").cast("double")
            )
            <= F.lit(float(tolerance_seconds))
        )
        for c in right_cols:
            out = out.withColumn(f"__m_{c}", F.when(within, F.col(f"__m_{c}")))
    return out.select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"__m_{c}").alias(c) for c in right_cols],
    )


def union_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.unionByName(b)


def intersect_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersectAll(b)


def except_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.exceptAll(b)


def _managed_table_location(spark, table: str) -> str | None:
    """The path the catalog WOULD use for a managed table named ``table``,
    or None when the warehouse is not a local filesystem (hdfs/s3 — never
    delete there from the driver; let the catalog error surface instead).

    Handles qualified names: default-database tables live directly under
    the warehouse dir, any other database under ``<wh>/<db>.db/``.
    """
    import os

    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    if "://" in wh and not wh.startswith("file:"):
        return None
    for prefix in ("file://", "file:"):
        if wh.startswith(prefix):
            wh = wh[len(prefix):]
            break
    parts = [p for p in table.lower().split(".") if p]
    tbl = parts[-1]
    db = parts[-2] if len(parts) >= 2 else "default"  # ignore catalog part
    if db == "default":
        return os.path.join(wh, tbl)
    return os.path.join(wh, f"{db}.db", tbl)


def bucket_write(df: DataFrame, path_table: str, keys: Sequence[str], num_buckets: int) -> None:
    """Persist bucketed by join/group key: repeated joins & aggs on ``keys``
    skip the exchange entirely (co-located scan). The 100 TB answer to
    'this join shuffles every night'."""
    import os
    import shutil

    spark = df.sparkSession
    if spark.catalog.tableExists(path_table):
        # registered: DROP TABLE lets the catalog remove managed data at
        # its true resolved location
        spark.sql(f"DROP TABLE {path_table}")
    # a managed-table dir from a previous session can survive the
    # in-memory catalog, and saveAsTable refuses an unregistered existing
    # location (LOCATION_ALREADY_EXISTS). Clear ONLY the exact managed
    # location the catalog derives for this name (db.db-aware), and only
    # on a local-filesystem warehouse.
    loc = _managed_table_location(spark, path_table)
    if loc and os.path.isdir(loc):
        shutil.rmtree(loc, ignore_errors=True)
    (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, *keys)
        .sortBy(*keys)
        .saveAsTable(path_table)
    )
