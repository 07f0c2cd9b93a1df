"""Kafka-shaped streaming source (VERDICT r2 advice #8 / r4 item 8).

A 100 TB/day production feed is Kafka-shaped: the parquet-directory
source (windows.read_event_stream) is the backfill/test path, this
module is the live-ingest path. Same downstream contract — both yield
frames the window/dedup/enrich builders accept unchanged, with the
engine-canonical TIMESTAMP_NTZ event time.

Scale model:
- source parallelism = topic partitions (one Spark input partition
  per Kafka partition); no repartition needed before per-key state
  ops, which shuffle on their own keys anyway.
- backpressure via maxOffsetsPerTrigger: bounds each micro-batch so a
  backlogged restart cannot OOM the first trigger.
- offsets + checkpoint give exactly-once into the parquet/Delta sink
  (same checkpoint discipline as windows.run_to_parquet_sink).

The Kafka connector jar (spark-sql-kafka) is NOT in this sandbox, so
`read_kafka_stream` cannot be driven end-to-end here; everything
around the broker handshake is factored to be testable without it:
`kafka_reader_options` (option-dict construction + validation) and
`parse_kafka_events` (wire-record -> typed events, a pure DataFrame
transform over Kafka's fixed, public wire schema) carry the logic and
are pytest-gated on batch frames.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .windows import EVENTS_SCHEMA

# Kafka source wire schema — fixed by the Spark Kafka connector
# (structured-streaming-kafka-integration docs); what .load() yields
# and what parse_kafka_events consumes.
KAFKA_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ]
)


def kafka_reader_options(
    bootstrap_servers: str,
    topic: str | None = None,
    subscribe_pattern: str | None = None,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    extra: dict[str, str] | None = None,
) -> dict[str, str]:
    """Validated option dict for the Kafka reader — exactly one of
    `topic` (comma-separated list ok) or `subscribe_pattern`."""
    if not bootstrap_servers:
        raise ValueError("bootstrap_servers is required")
    if (topic is None) == (subscribe_pattern is None):
        raise ValueError("exactly one of topic / subscribe_pattern is required")
    if starting_offsets not in ("earliest", "latest") and not (
        starting_offsets.startswith("{")
    ):
        raise ValueError(
            "starting_offsets must be 'earliest', 'latest', or a JSON "
            f"per-partition offset map, got {starting_offsets!r}"
        )
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "startingOffsets": starting_offsets,
        # a compacted/expired topic segment must not kill a 24/7 query
        "failOnDataLoss": "false",
    }
    if topic is not None:
        opts["subscribe"] = topic
    else:
        opts["subscribePattern"] = subscribe_pattern  # type: ignore[assignment]
    if max_offsets_per_trigger is not None:
        if max_offsets_per_trigger <= 0:
            raise ValueError("max_offsets_per_trigger must be positive")
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    opts.update(extra or {})
    return opts


def parse_kafka_events(
    raw: DataFrame,
    value_schema: T.StructType = EVENTS_SCHEMA,
    include_kafka_meta: bool = False,
) -> DataFrame:
    """Kafka wire records -> typed event rows.

    `value` carries one JSON document per record (the reference's JSON
    record shape, SURVEY §2.1, applied to a stream). from_json runs
    JVM-side (codegen, no Python), so the parse keeps up with the
    scan. Rows whose payload fails to parse get NULL fields rather
    than killing the query — count them downstream with
    `F.count_if(F.col("event_id").isNull())` on a dead-letter branch.

    With include_kafka_meta the (topic, partition, offset) triple rides
    along — the exactly-once bookkeeping columns."""
    cols = [
        F.from_json(F.col("value").cast("string"), value_schema).alias("_ev")
    ]
    if include_kafka_meta:
        cols += [F.col("topic"), F.col("partition"), F.col("offset")]
    parsed = raw.select(*cols)
    return parsed.select(
        *[F.col(f"_ev.{f.name}").alias(f.name) for f in value_schema.fields],
        *([F.col("topic"), F.col("partition"), F.col("offset")] if include_kafka_meta else []),
    )


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str | None = None,
    subscribe_pattern: str | None = None,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    value_schema: T.StructType = EVENTS_SCHEMA,
    include_kafka_meta: bool = False,
) -> DataFrame:
    """Live-ingest twin of windows.read_event_stream: returns a
    streaming DataFrame of typed events from a Kafka topic. Requires
    the spark-sql-kafka connector on the classpath (ship with
    `--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>`);
    absent the connector, .load() raises AnalysisException at plan
    construction — there is no silent fallback."""
    opts = kafka_reader_options(
        bootstrap_servers,
        topic,
        subscribe_pattern,
        starting_offsets,
        max_offsets_per_trigger,
    )
    reader = spark.readStream.format("kafka")
    for k, v in opts.items():
        reader = reader.option(k, v)
    return parse_kafka_events(reader.load(), value_schema, include_kafka_meta)
