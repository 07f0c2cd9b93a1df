"""Distributed file connectors (beyond the reference's HTTP-body-only
ingest — SURVEY.md §2.1 "no file/object-store connectors").

These are thin wrappers over `spark.read` that pin down the engine's
ingest contract (the reference's CSV null semantics, schema inference)
while keeping the scan fully distributed: at 100 TB, data enters here
— the HTTP store endpoint is for small interactive tables.
"""
from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession


def read_csv(
    spark: SparkSession,
    path: str,
    schema: Optional[str] = None,
    infer_schema: bool = True,
) -> DataFrame:
    """CSV directory/file scan with the engine's null contract: ONLY
    the empty string is null (reference: `na_values=['']`,
    `keep_default_na=False` — "N/A"/"nan"/"null" stay strings)."""
    reader = (
        spark.read.option("header", True)
        .option("nullValue", "")
        .option("emptyValue", "")
    )
    if schema:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", infer_schema)
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema: Optional[str] = None) -> DataFrame:
    """JSON-lines scan (one object per line; distributed)."""
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    return reader.json(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Optional[list[str]] = None,
) -> None:
    """Parquet sink; `partition_by` turns downstream equality filters
    on those columns into partition PRUNES (e.g. IVF cluster_id,
    dedup shard keys)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan (columnar like parquet: predicate pushdown + column
    pruning apply; common in Hive-era lakes)."""
    return spark.read.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Optional[list[str]] = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)
