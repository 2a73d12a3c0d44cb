"""Structured Streaming over the events fixture — SURVEY.md §2.9.

The reference's closest analog to a stream is the append-only notifications
feed (index.js:53-60 write, index.js:226-238 consumer-filtered time-desc
read). Here the same data shape is processed as a true stream: parquet files as
a file-stream source, event-time windows with watermarks for late data, and
the native `session_window` stateful aggregation.

In production the source line is the only thing that changes
(`readStream.format("kafka")...`); the transformations are identical —
that's the point of the unified batch/streaming DataFrame API. Memory sinks
below are for deterministic local verification; real sinks would be
`writeStream.format("parquet").option("checkpointLocation", ...)` with
exactly-once file commits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Explicit schema — a streaming source never infers (each micro-batch must
# agree). ts arrives as int64 nanoseconds (see catalog._read_events).
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-stream source over the events parquet, ts normalized to µs."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    # the file-stream source requires a directory: stream the fixture dir
    # with a glob pinned to the events file
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def hourly_windowed_counts(events: DataFrame) -> DataFrame:
    """Watermarked tumbling-window aggregation (the streaming twin of the
    batch `events_tumbling_hourly` query — same logical plan modulo the
    watermark operator)."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def session_window_counts(events: DataFrame) -> DataFrame:
    """Native stateful sessionization: `session_window(ts, gap)` merges
    events within a 30-minute inactivity gap per user."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("sw.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
    )


def run_to_memory(
    agg: DataFrame, query_name: str, output_mode: str = "complete"
) -> None:
    """Drive a streaming aggregation to completion over the static fixture
    (processAllAvailable = deterministic local run), results in the
    `query_name` in-memory table."""
    q = (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
