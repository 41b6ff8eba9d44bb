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


# ---------------------------------------------------------------------------
# Kinesis / PubSub config surfaces (SURVEY §2.1)
#
# Maps the reference's HOCON config shapes
# (config/config.kinesis.reference.hocon:7-128,
#  config/config.pubsub.reference.hocon:7-90) onto Structured Streaming
# reader options and foreachBatch sink writers. The container has no AWS
# or GCP endpoint, so the source builders stop at option wiring (the
# connector format name is injectable — any public Spark Kinesis/PubSub
# connector slots in) and the sinks take an injectable `send` callable;
# the batching / limits / partition-key / retry logic — the actual meat
# of the reference's sinks — is real and unit-tested.

import time as _time
import uuid as _uuid
from dataclasses import dataclass as _dataclass, field as _field


@_dataclass
class InitialPosition:
    # TRIM_HORIZON | LATEST | AT_TIMESTAMP (+ ISO timestamp)
    type: str = "TRIM_HORIZON"
    timestamp: str | None = None


@_dataclass
class KinesisSourceConf:
    stream_name: str = ""
    app_name: str = "snowplow-enrich"
    region: str | None = None
    initial_position: InitialPosition = _field(default_factory=InitialPosition)
    retrieval_mode: str = "Polling"          # Polling | FanOut
    max_records: int = 750                   # Polling only
    endpoint_url: str | None = None          # localstack override
    connector: str = "aws-kinesis"           # injectable format name


@_dataclass
class StreamSinkConf:
    """One output stream (good/failed/bad share the shape)."""
    stream_name: str = ""
    record_limit: int = 500                  # records per PutRecords call
    byte_limit: int = 5 * 1024 * 1024        # bytes per PutRecords call
    partition_key: str | None = None         # atomic column; None = random
    max_retries: int = 10
    min_backoff_s: float = 0.1
    max_backoff_s: float = 1.0


def kinesis_conf_from_dict(d: dict) -> KinesisSourceConf:
    """`input` section of config.kinesis.reference.hocon → conf."""
    pos = d.get("initialPosition", {})
    mode = d.get("retrievalMode", {})
    return KinesisSourceConf(
        stream_name=d.get("streamName", ""),
        app_name=d.get("appName", "snowplow-enrich"),
        region=d.get("region"),
        initial_position=InitialPosition(
            type=pos.get("type", "TRIM_HORIZON"), timestamp=pos.get("timestamp")
        ),
        retrieval_mode=mode.get("type", "Polling"),
        max_records=int(mode.get("maxRecords", 750)),
        endpoint_url=d.get("customEndpoint"),
    )


def sink_conf_from_dict(d: dict) -> StreamSinkConf:
    """`output.good|failed|bad` section → conf (Kinesis field names)."""
    backoff = d.get("throttledBackoffPolicy", {})

    def _secs(v, default):
        """HOCON duration → seconds. Bare numbers (int/float/numeric
        string) mean MILLISECONDS per HOCON duration semantics — a config
        ported verbatim with `minBackoff: 100` must yield 0.1 s, not
        100 s. Unit-suffixed strings are scaled by their unit."""
        if v is None:
            return default
        s = str(v).strip()
        try:
            return float(s) / 1000.0  # unitless → milliseconds
        except ValueError:
            pass
        if not s or not s[0].isdigit():
            return default
        head = s.split()[0]
        try:
            num = float(head)
            unit = s[len(head):]
        except ValueError:
            i = 0
            while i < len(head) and (head[i].isdigit() or head[i] == "."):
                i += 1
            num, unit = float(head[:i]), head[i:]
        unit = unit.strip().lower()
        if "nano" in unit or unit == "ns":
            return num / 1e9
        if "micro" in unit or unit == "us":
            return num / 1e6
        if "milli" in unit or unit == "ms":
            return num / 1000.0
        if "minute" in unit or unit == "m":
            return num * 60.0
        if "hour" in unit or unit == "h":
            return num * 3600.0
        if "day" in unit or unit == "d":
            return num * 86400.0
        return num  # seconds

    return StreamSinkConf(
        stream_name=d.get("streamName", d.get("topic", "")),
        record_limit=int(d.get("recordLimit", d.get("batchSize", 500))),
        byte_limit=int(d.get("byteLimit", d.get("requestByteThreshold", 5 * 1024 * 1024))),
        partition_key=d.get("partitionKey"),
        max_retries=int(d.get("maxRetries", 10)),
        min_backoff_s=_secs(backoff.get("minBackoff"), 0.1),
        max_backoff_s=_secs(backoff.get("maxBackoff"), 1.0),
    )


def kinesis_source_options(conf: KinesisSourceConf) -> dict:
    """Conf → Structured Streaming reader options (public connector
    option names: streamName / region / startingPosition / consumerType)."""
    opts = {"streamName": conf.stream_name}
    if conf.region:
        opts["region"] = conf.region
    if conf.endpoint_url:
        opts["endpointUrl"] = conf.endpoint_url
    pos = conf.initial_position
    if pos.type == "AT_TIMESTAMP":
        opts["startingPosition"] = f"AT_TIMESTAMP:{pos.timestamp}"
    else:
        opts["startingPosition"] = pos.type
    if conf.retrieval_mode == "FanOut":
        opts["consumerType"] = "EFO"
        opts["consumerName"] = conf.app_name
    else:
        opts["consumerType"] = "GetRecords"
        opts["maxFetchRecordsPerShard"] = str(conf.max_records)
    return opts


def kinesis_source(spark: SparkSession, conf: KinesisSourceConf) -> DataFrame:
    """Collector payloads from Kinesis via the configured public connector."""
    return generic_source(spark, conf.connector, kinesis_source_options(conf),
                          value_col="data")


@_dataclass
class PubSubSourceConf:
    subscription: str = ""
    connector: str = "pubsub"


def pubsub_source(spark: SparkSession, conf: PubSubSourceConf) -> DataFrame:
    return generic_source(
        spark, conf.connector, {"subscription": conf.subscription},
        value_col="data",
    )


def batch_records(
    rows: list[tuple[str, bytes]],
    record_limit: int,
    byte_limit: int,
) -> list[list[tuple[str, bytes]]]:
    """Split (partition_key, payload) rows into PutRecords-shaped batches
    honouring both the record-count and byte limits (Kinesis: 500 recs /
    5 MiB per request; PubSub: batchSize / requestByteThreshold). A
    single oversize record still ships alone — the serializer's
    max-record-size guard has already size-violated anything truly huge."""
    batches: list[list[tuple[str, bytes]]] = []
    cur: list[tuple[str, bytes]] = []
    cur_bytes = 0
    for key, payload in rows:
        size = len(payload) + len(key.encode("utf-8"))
        if cur and (len(cur) >= record_limit or cur_bytes + size > byte_limit):
            batches.append(cur)
            cur, cur_bytes = [], 0
        cur.append((key, payload))
        cur_bytes += size
    if cur:
        batches.append(cur)
    return batches


def ship_rows(rows, conf: StreamSinkConf, send, sleep=_time.sleep) -> int:
    """Send (key, bytes) rows in limit-honouring batches with
    partial-failure retry + exponential backoff. Returns batches sent."""
    n = 0
    for batch in batch_records(rows, conf.record_limit, conf.byte_limit):
        pending = batch
        backoff = conf.min_backoff_s
        for attempt in range(conf.max_retries + 1):
            failed_idx = send(conf.stream_name, pending)
            n += 1
            if not failed_idx:
                break
            if attempt == conf.max_retries:
                raise RuntimeError(
                    f"{conf.stream_name}: {len(failed_idx)} records still "
                    f"throttled after {conf.max_retries} retries"
                )
            pending = [pending[i] for i in failed_idx]
            sleep(backoff)
            backoff = min(backoff * 2, conf.max_backoff_s)
    return n


def stream_sink_writer(
    df: DataFrame,
    conf: StreamSinkConf,
    send,
    value_col: str = "value",
    checkpoint: str | None = None,
    sleep=_time.sleep,
):
    """foreachBatch writer shipping rows to a PutRecords-style `send`.

    `send(stream_name, batch)` with batch = [(partition_key, bytes)];
    it returns the list of indices that were throttled (AWS partial
    failure semantics) — those are retried with exponential backoff up
    to max_retries, then raised (the reference crashes and lets the
    runner restart, Retries.scala semantics)."""

    def _ship(batch_df, _batch_id):
        if conf.partition_key and conf.partition_key in batch_df.columns:
            rows_df = batch_df.select(
                F.coalesce(F.col(conf.partition_key).cast("string"),
                           F.lit("")).alias("k"),
                F.col(value_col).cast("binary").alias("v"),
            )
        else:
            rows_df = batch_df.select(
                F.expr("uuid()").alias("k"),
                F.col(value_col).cast("binary").alias("v"),
            )

        def ship_partition(it):
            rows = [(r.k if r.k else str(_uuid.uuid4()), bytes(r.v)) for r in it]
            ship_rows(rows, conf, send, sleep)
            return iter(())

        rows_df.rdd.mapPartitions(ship_partition).count()

    writer = df.writeStream.foreachBatch(_ship)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer
