"""SparkSession factory tuned for the engine.

Local-mode settings mirror what we would set on a real cluster:
AQE on (runtime re-planning, skew-join handling, partition coalescing),
Arrow on (fast pandas interchange for ingest and Pandas UDFs), and a
shuffle-partition count sized to the parallelism at hand rather than
the 200 default. On a 1000-executor cluster the same builder is used
with `master` unset and `spark.sql.shuffle.partitions` sized to
~2-3x total cores (or left to AQE's coalescing with a high initial
value).
"""
from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "qcache-spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    # Python workers (Pandas UDF / mapInPandas) must be able to import
    # this package regardless of the driver's cwd. Local mode spawns
    # workers with the driver's environment → extend PYTHONPATH. On a
    # real cluster, ship a wheel via spark-submit --py-files instead.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{existing}" if existing else pkg_root
        )
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Parquet TIMESTAMP(NANOS) (e.g. pandas-written event streams) is
        # otherwise an illegal type for the Spark reader; read as long
        # and convert in load_table.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one synthetic table. Parquet scan → Catalyst gets column
    pruning + predicate pushdown for free on every query we compile."""
    if name == "events":
        # The caller may hand us a session that was NOT built by
        # get_spark() (e.g. an external harness); nanosAsLong is
        # runtime-settable, so set it here so the TIMESTAMP(NANOS)
        # column is readable on any session.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS) → read as long nanos
        # (nanosAsLong), truncate to microseconds for a proper
        # timestamp column.
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}
