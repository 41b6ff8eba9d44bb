"""Stream source/sink builders (SURVEY §2.1).

The reference ships four runner apps (Kinesis/Kafka/PubSub/NSQ,
modules/*/…App.scala) around one shared pipeline. Our equivalents are
builders over Structured Streaming:

* Kafka — native ``format("kafka")`` both directions (the container has
  no broker, so these builders are exercised by unit tests only up to
  plan construction; the option plumbing is the standard public API).
* Files — parquet/binary directory streams; doubles as the test harness
  (the reference's integration tests use localstack the same way).
* Kinesis / PubSub — reachable through their public Spark connectors via
  ``format(...)``; we expose the same builder signature so a deployment
  can pass the connector name + options.

All sources normalize to a DataFrame with a ``value BINARY`` column
(collector payload bytes) plus optional transport metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_source(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
    **options,
) -> DataFrame:
    """Collector payloads from Kafka. `value` arrives as BINARY natively."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "false")
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load().select("value", "topic", "partition", "offset", "timestamp")


def kafka_sink(
    df: DataFrame,
    brokers: str,
    topic: str,
    checkpoint: str,
    value_col: str = "value",
    key_col: str | None = None,
    **options,
):
    """Write a string/binary column to Kafka (enriched TSV / bad JSON)."""
    cols = [F.col(value_col).cast("binary").alias("value")]
    if key_col is not None:
        cols.append(F.col(key_col).cast("binary").alias("key"))
    writer = (
        df.select(*cols)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    return writer


def generic_source(
    spark: SparkSession, fmt: str, options: dict, value_col: str = "value"
) -> DataFrame:
    """Kinesis/PubSub/etc via their public connector name + options."""
    reader = spark.readStream.format(fmt)
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.load()
    if value_col != "value":
        df = df.withColumnRenamed(value_col, "value")
    return df


def file_binary_source(spark: SparkSession, path: str, **options) -> DataFrame:
    """Directory of files, one collector payload per file (binaryFile)."""
    reader = spark.readStream.format("binaryFile")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path).select(F.col("content").alias("value"))


def file_parquet_source(spark: SparkSession, path: str, schema=None, **options) -> DataFrame:
    """Directory stream of parquet files carrying a `value BINARY` column —
    the unit-test transport (mirrors the reference's MockEnvironment)."""
    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.parquet(path)
