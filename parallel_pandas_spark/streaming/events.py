"""Structured Streaming over the ``events`` table (SURVEY.md §2.9).

The reference is batch-only; streaming is net-new capability. Each windowed
aggregation has a *batch-equivalent* form (same ``F.window`` expressions on
a static frame) so the correctness oracle can check it in SQL, and a true
``readStream`` form with watermarking for production late-data handling.
``applyInPandasWithState`` provides the custom-stateful-operator path
(per-key running state with timeout eviction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: on-disk schema — the testdata parquet stores ts as TIMESTAMP(MICROS)
#: (verified with pyarrow at sf0.001/0.01/0.1), which is Spark's native
#: timestamp precision, so the stream declares TimestampType directly and
#: reads the same values as the batch loader (loaders.py dtype-gates the
#: same way).
EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


# --- batch-equivalent windowed aggregations (oracle-checkable) -----------


def tumbling_window_agg(events: DataFrame, duration: str = "1 day") -> DataFrame:
    """Tumbling event-time windows: count + sum(value) per (window, type)."""
    return (
        events.groupBy(F.window("ts", duration).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_window_counts(
    events: DataFrame, duration: str = "1 day", slide: str = "12 hours"
) -> DataFrame:
    """Sliding windows — each event lands in duration/slide windows."""
    return (
        events.groupBy(F.window("ts", duration, slide).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
            "n_events",
        )
    )


def session_window_agg(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user: sessions close after ``gap`` inactivity."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
    )


# --- true streaming forms -------------------------------------------------


def stream_events(spark: SparkSession, path_dir: str, max_files: int = 1) -> DataFrame:
    """File-source stream over events parquet (file, glob, or directory).
    ``ts`` is TIMESTAMP(MICROS) on disk — Spark-native — so the declared
    schema reads identical values to the batch loader."""
    if path_dir.endswith(".parquet"):
        # Spark's file stream source needs a directory or a glob — turn a
        # literal file path into the narrowest glob matching it by escaping
        # the filename's own first character as a character class
        slash = path_dir.rfind("/")
        fname = path_dir[slash + 1 :]
        path_dir = path_dir[: slash + 1] + "[" + fname[0] + "]" + fname[1:]
    return (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path_dir)
    )


def stream_tumbling_counts(
    stream: DataFrame, duration: str = "1 day", watermark: str = "2 days"
) -> DataFrame:
    """Streaming tumbling counts with a watermark: late rows beyond
    ``watermark`` are dropped and state for closed windows is evicted —
    bounded state on an unbounded stream."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", duration), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
    )


def stream_dedup(
    stream: DataFrame, keys, watermark: str = "2 days"
) -> DataFrame:
    """Streaming exact deduplication — the ingestion-time form of the
    batch exact-dedup operator (operators/dedup.py): emit the first
    arrival per key, drop repeats. ``dropDuplicatesWithinWatermark``
    keeps per-key state only inside the watermark horizon, so state is
    BOUNDED on an unbounded stream (a plain ``dropDuplicates`` on a
    stream retains every key forever — the thing that falls over at
    100 TB/day). Contract: duplicates arriving further apart than the
    watermark can re-emit; size the watermark to the real dedup horizon.
    Batch equivalent for verification: ``df.select(keys).distinct()``."""
    return (
        stream.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(list(keys))
    )


def user_running_totals_stateful(stream: DataFrame):
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running event count + value total, state times out after 1h idle
    (processing time). The reference's closest concept is a stateful
    per-group UDF; streaming state is the scalable generalization."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, n_events long, total_value double"
    state_schema = "n long, total double"

    def update(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        state.setTimeoutDuration(3600 * 1000)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def run_stream_to_memory(
    spark: SparkSession,
    stream_df: DataFrame,
    table: str,
    mode: str = "update",
    idle_polls: int = 8,
    poll_secs: float = 0.5,
    timeout_secs: float = 180.0,
):
    """Drive a streaming query to a memory sink until the finite source is
    drained, then stop (test/debug harness; production writes a real sink).

    Quiescence is detected by POLLING lastProgress, not by
    ``processAllAvailable``/``availableNow`` + ``awaitTermination``: for
    ``applyInPandasWithState`` queries both of those block indefinitely
    (pending state timers keep the query alive, and processAllAvailable's
    no-new-data latch never fires for the stateful commit path observed on
    this Spark build)."""
    import time

    q = (
        stream_df.writeStream.format("memory")
        .queryName(table)
        .outputMode(mode)
        .trigger(processingTime="1 second")
        .start()
    )
    deadline = time.time() + timeout_secs
    quiet = 0
    last_data_batch = -1
    last_dur_secs = 0.0
    while q.isActive and time.time() < deadline:
        p = q.lastProgress
        if p is not None:
            if p["numInputRows"] > 0 and p["batchId"] > last_data_batch:
                # a data-carrying batch landed — whatever quiet streak was
                # accumulating was premature (r8: under heavy machine load
                # a starved trigger thread can surface a stale flag
                # reading; the batch id advancing with data is ground
                # truth that the source was NOT drained)
                last_data_batch = p["batchId"]
                last_dur_secs = (
                    float(p.get("durationMs", {}).get("triggerExecution", 0)) / 1000.0
                )
                quiet = 0
            if p["batchId"] > 0 and p["numInputRows"] == 0:
                break  # an empty batch ran — the finite source is drained
            # slow path: the query's own readiness flags. "Progress
            # stopped changing for N polls" (the pre-r7 heuristic) races
            # under machine load — a queued batch can take longer than
            # the stability window to start, and stopping then drops
            # files. isDataAvailable=False AND isTriggerActive=False,
            # held for a full idle window, means the source is drained
            # and nothing is mid-flight. The window is LOAD-ADAPTIVE
            # (r8): at least idle_polls polls AND 2x the last observed
            # batch duration, so a box where batches take seconds to
            # schedule gets a proportionally longer quiet requirement.
            st = q.status
            if not st["isDataAvailable"] and not st["isTriggerActive"]:
                quiet += 1
                need = max(idle_polls, int(2.0 * last_dur_secs / poll_secs) + 1)
                if quiet >= need:
                    break
            else:
                quiet = 0
        time.sleep(poll_secs)
    if q.isActive:
        q.stop()
    q.awaitTermination()
    return spark.table(table)
