"""Structured Streaming operators (greenfield vs the reference, which
lists streaming ingest as unrealized future work — README.rst:493-494;
SURVEY.md §2.10).

Batch/stream unification: each builder takes ANY DataFrame — the same
plan runs over `spark.read.parquet(...)` (batch, used by the oracle
gate) and `spark.readStream` (incremental). Watermarks bound state so
a window aggregation over an unbounded 100 TB/day stream holds steady
memory: state for windows older than the watermark is dropped.
"""
from __future__ import annotations

import os

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


def read_event_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a directory of parquet event files.
    (The synthetic events table ships nanosecond timestamps, which the
    streaming parquet source reads as long under nanosAsLong — convert
    like session.load_table does.)"""
    # Self-provision the nanos conf so a caller-supplied session (not
    # built by get_spark()) can read the TIMESTAMP(NANOS) files too.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.readStream.schema(
        # ts arrives as long nanos under nanosAsLong
        T.StructType(
            [
                T.StructField("event_id", T.LongType()),
                T.StructField("ts", T.LongType()),
                T.StructField("user_id", T.LongType()),
                T.StructField("event_type", T.StringType()),
                T.StructField("value", T.DoubleType()),
                T.StructField("props", T.StringType()),
            ]
        )
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    # The streaming file source monitors a DIRECTORY; accept a single
    # file path by watching its parent with a glob filter.
    if path.endswith(".parquet") and os.path.isfile(path):
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    df = reader.parquet(path)
    return df.withColumn(
        "ts", F.timestamp_micros(F.expr("ts div 1000"))
    )


def tumbling_counts(
    events: DataFrame,
    window_size: str = "1 hour",
    watermark: str = "2 hours",
    streaming: bool = True,
) -> DataFrame:
    """Per-(window, event_type) counts and sums. With the watermark,
    state is bounded to ~(watermark / window_size) open windows per
    key — late events beyond it are dropped, on a cluster this is the
    knob that keeps an unbounded stream's state finite."""
    src = events.withWatermark("ts", watermark) if streaming else events
    return src.groupBy(
        F.window("ts", window_size).start.alias("window_start"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("sum_value"),
    )


def sliding_rates(
    events: DataFrame,
    window_size: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
    streaming: bool = True,
) -> DataFrame:
    """Sliding-window event rates (each event lands in
    window_size/slide windows)."""
    src = events.withWatermark("ts", watermark) if streaming else events
    return src.groupBy(
        F.window("ts", window_size, slide).start.alias("window_start"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n_events"))


def sessionize(
    events: DataFrame,
    gap: str = "10 minutes",
    watermark: str = "2 hours",
    streaming: bool = True,
) -> DataFrame:
    """Per-user sessions: events closer than `gap` merge into one
    session (Spark session_window — state closes once the watermark
    passes the gap, so sessions finalize incrementally)."""
    src = events.withWatermark("ts", watermark) if streaming else events
    sw = F.session_window("ts", gap)
    return src.groupBy(sw, "user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    ).select(
        "user_id",
        F.col("session_window.start").alias("session_start"),
        "n_events",
        "first_ts",
        "last_ts",
    )


def run_to_memory_sink(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "complete",
) -> None:
    """Drain an availableNow stream into an in-memory table (test &
    backfill path: processes everything currently in the source then
    stops — the batch-parity mode of a streaming job)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_to_parquet_sink(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    available_now: bool = True,
) -> None:
    """Drain a stream into parquet files — the PRODUCTION sink (the
    memory sink above is a test/driver device; pipeline output lands
    in the lake). Exactly-once via the checkpoint + file-sink commit
    log: a restarted query resumes from the checkpoint and never
    double-writes a batch, which is the property that makes a
    100 TB/day ingest restartable. Parquet sinks are append-only;
    aggregations must be watermarked so closed windows finalize."""
    writer = (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    q.awaitTermination()
