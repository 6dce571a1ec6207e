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

EVENTS_SCHEMA = T.StructType(
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
    """File-source stream over a directory of events parquet."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
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
    spark: SparkSession, stream_df: DataFrame, table: str, mode: str = "update"
):
    """Drive a streaming query to a memory sink until all available data is
    processed (test/debug harness; production writes to a real sink)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(table)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table)
