"""Streaming shell — the engine's equivalent of core/Processing.stream
(core/Processing.scala:42-58):

    source → decompress/debatch → thrift load → enrich plan →
    serialize → {good TSV, bad JSON, failed TSV} sinks
    + per-batch metadata aggregation (the system's only true agg)

Spark-first shape: the whole per-event pipeline is ONE stateless
streaming projection (no watermark needed — the reference is explicitly
``NoWindowing``, "1 in → 1 out", Processing.scala:44). The 3-way output
split runs inside ``foreachBatch`` so one pass over each micro-batch
feeds all sinks and the metadata aggregation, and checkpointing gives
the same at-least-once contract the reference implements with ack
tokens (Processing.scala:321-322).

At scale: parallelism = source partitions (Kafka partitions / file
splits); there is NO shuffle anywhere in the hot path — the only
exchange is the metadata groupBy over a batch-local aggregate whose
cardinality is tiny (distinct event schemas × app ids).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import EnrichmentsConfig
from ..loaders.thrift import load_thrift
from ..plans.pipeline import enrich
from ..plans.serialize import bad_rows_json, to_tsv
from ..sources.decompress import explode_messages


@dataclass
class StreamSinks:
    good_path: str
    bad_path: str
    failed_path: str | None = None       # reference: optional failed stream
    metadata_path: str | None = None     # per-batch metadata aggregates
    good_format: str = "text"            # TSV lines
    bad_format: str = "text"             # JSON lines


@dataclass
class StreamConfig:
    enrichments: EnrichmentsConfig = field(default_factory=EnrichmentsConfig.default)
    max_bytes_single_payload: int = 1 << 20
    sink_max_bytes: int = 1 << 20        # oversize record guard → SizeViolation
    checkpoint: str | None = None
    trigger_seconds: int | None = None
    # asset hot-swap (reference AssetRefresher + ManagedEnrichmentRegistry):
    # checked at each micro-batch boundary; when an asset's content hash
    # changes, `rebuild(assets)` recompiles the enrichment config/plan from
    # the new local files — in-flight batches finish on the old snapshot
    assets: object | None = None         # sources.assets.AssetManager
    rebuild: object | None = None        # Callable[[AssetManager], EnrichmentsConfig]
    # observability floor (streaming/observability.py): metrics + health
    # probe + metadata reporter updated per micro-batch; None = zero cost
    observers: object | None = None      # observability.BatchObservers


def collect_metadata(good: DataFrame) -> DataFrame:
    """The system's only true aggregation (core/Metadata.scala:50-65):
    distinct (event schema, app_id, tracker, platform) → counts + the set
    of entity schemas seen.

    collect_set, not collect_list (r15, guide §2.3 "shuffle fewer
    bytes"): the partial aggregate then dedupes the per-event schema
    ARRAYS map-side, so the group-keyed exchange carries one copy of
    each distinct derived-entity array per (group, map partition) —
    bounded by schema-registry cardinality — instead of every event's
    array (one string column of the corpus). Equivalence is exact:
    dropping duplicate arrays cannot change the flattened element SET,
    array_distinct sees the same set either way, and the final
    array_sort normalizes order; NULL handling is identical
    (collect_set and collect_list both skip NULL inputs)."""
    return (
        good.groupBy(
            "event_vendor", "event_name", "event_format", "event_version",
            "app_id", "v_tracker", "platform",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_set(
                    F.transform(F.col("_derived"), lambda c: c.getField("schema"))
                )))
            ).alias("entity_schemas"),
        )
    )


def windowed_metadata_stream(
    good: DataFrame,
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
    time_col: str = "collector_tstamp",
) -> DataFrame:
    """Streaming-native metadata rollup: the event-time-windowed variant
    of ``collect_metadata`` (core/Metadata.scala:50-96 — the reference
    flushes its observed-schema aggregate on a period; the batch shell
    aggregates per micro-batch in foreachBatch). This variant is the
    always-on Structured Streaming form: tumbling event-time windows
    with a watermark bounding both state and late-data tolerance, so a
    window's row finalizes (append mode) once the watermark passes its
    end.

    At scale: state per window = distinct (schema, app, tracker,
    platform) combos — tiny; the shuffle is the same single keyed
    exchange the batch aggregation pays.
    """
    return (
        good.withWatermark(time_col, watermark)
        .groupBy(
            F.window(F.col(time_col), window_duration).alias("window"),
            "event_vendor", "event_name", "event_format", "event_version",
            "app_id", "v_tracker", "platform",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list(
                    F.transform(F.col("_derived"), lambda c: c.getField("schema"))
                )))
            ).alias("entity_schemas"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_vendor", "event_name", "event_format", "event_version",
            "app_id", "v_tracker", "platform", "n_events", "entity_schemas",
        )
    )


def enrich_batch(batch_df: DataFrame, cfg: StreamConfig, spark: SparkSession,
                 observation=None):
    """One micro-batch through the full pipeline. Returns (good_tsv, bad_json,
    failed_tsv, metadata, annotated) DataFrames — shared by the streaming and
    batch entry points. All four outputs are filters over `annotated`;
    persisting it makes the multi-sink fan-out a single enrichment pass."""
    payloads = explode_messages(batch_df, max_bytes_single_payload=cfg.max_bytes_single_payload)
    loaded = load_thrift(payloads)
    # decompression errors become loader-level bad rows
    loaded = loaded.withColumn(
        "loader_error", F.coalesce(F.col("loader_error"), F.col("decompress_error"))
    )
    res = enrich(loaded, cfg.enrichments, spark, observation=observation)

    good_tsv = to_tsv(res.good, max_bytes=cfg.sink_max_bytes)
    # OptionIor.Both: failed events → failed TSV sink AND an
    # enrichment_failures bad row (Processing.scala:227-244)
    failed_tsv = to_tsv(res.failed, max_bytes=cfg.sink_max_bytes)
    # oversize enriched records → SizeViolation bad rows (Processing.scala:203-225)
    oversize = good_tsv.where(F.col("oversized")).select(
        F.to_json(
            F.struct(
                F.lit("size_violation").alias("type"),
                F.octet_length("tsv").alias("actual_bytes"),
                F.lit(cfg.sink_max_bytes).alias("max_bytes"),
                F.substring("tsv", 1, 256).alias("payload_prefix"),
            )
        ).alias("bad_row")
    )
    bad = (
        bad_rows_json(res.bad)
        .unionByName(bad_rows_json(res.failed))
        .unionByName(oversize)
    )
    meta = collect_metadata(res.good)
    return (
        good_tsv.where(~F.col("oversized")).select("tsv"),
        bad,
        failed_tsv.where(~F.col("oversized")).select("tsv"),
        meta,
        res.all,
    )


def make_batch_processor(spark: SparkSession, sinks: StreamSinks,
                         cfg: StreamConfig):
    """The foreachBatch body, exposed for direct (job-countable) tests."""

    def process(batch_df: DataFrame, batch_id: int):
        from pyspark.sql import Observation

        if cfg.observers is not None and cfg.observers.health is not None:
            cfg.observers.health.batch_started()
        if cfg.assets is not None:
            changed = cfg.assets.maybe_refresh()
            if changed and cfg.rebuild is not None:
                cfg.enrichments = cfg.rebuild(cfg.assets)
        # per-batch counters ride the sink writes as observe() metrics
        # (CollectMetrics plan nodes) — ZERO extra jobs, and no re-read
        # of the raw source just to count it (a Kafka/NSQ micro-batch
        # re-pull is not free the way a parquet re-scan is)
        want_obs = cfg.observers is not None
        raw_obs = ann_obs = good_obs = bad_obs = failed_obs = None
        if want_obs:
            raw_obs = Observation()
            batch_df = batch_df.observe(
                raw_obs, F.count(F.lit(1)).alias("n"))
            # ann_obs rides the annotated frame BELOW the tri-state
            # split (pipeline.enrich_raw) — oldest collector_tstamp and
            # the failed-count fallback come out of the same job that
            # materializes the annotated cache, not an aggregate of
            # their own
            ann_obs = Observation()
        good, bad, failed, meta, annotated = enrich_batch(
            batch_df, cfg, spark, observation=ann_obs)
        if want_obs:
            good_obs, bad_obs, failed_obs = (
                Observation(), Observation(), Observation())
            good = good.observe(good_obs, F.count(F.lit(1)).alias("n"))
            bad = bad.observe(bad_obs, F.count(F.lit(1)).alias("n"))
            failed = failed.observe(failed_obs, F.count(F.lit(1)).alias("n"))
        # every sink is a filter over `annotated` — cache it so the enrichment
        # chain runs ONCE per micro-batch, not once per sink (the reference is
        # single-pass by construction, Processing.scala:47-58; Spark's plan-
        # fragment cache substitutes the persisted subtree into each write)
        annotated.persist()
        try:
            good.write.mode("append").text(sinks.good_path)
            bad.withColumnRenamed("bad_row", "value").write.mode("append").text(sinks.bad_path)
            if sinks.failed_path is not None:
                failed.write.mode("append").text(sinks.failed_path)
            if sinks.metadata_path is not None:
                meta.withColumn("batch_id", F.lit(batch_id)).write.mode("append").json(
                    sinks.metadata_path
                )
            if want_obs:
                from .observability import attach_observers

                obs = cfg.observers
                ann = ann_obs.get
                # failed: the sink-level observe when the failed sink
                # ran (matches what was written, post-oversize filter);
                # otherwise the annotated-level count from ann_obs —
                # either way, zero extra jobs
                n_failed = (int(failed_obs.get["n"])
                            if sinks.failed_path is not None
                            else int(ann["n_failed"] or 0))
                counts = {"raw": int(raw_obs.get["n"]),
                          "good": int(good_obs.get["n"]),
                          "bad": int(bad_obs.get["n"]),
                          "failed": n_failed}
                # e2e latency = now − OLDEST collector_tstamp in the
                # batch (Processing.scala:281-291)
                meta_rows = (meta.collect()
                             if obs.metadata is not None else None)
                attach_observers(obs, counts,
                                 oldest_collector_ts=ann["oldest"],
                                 meta_rows=meta_rows)
        finally:
            annotated.unpersist()

    return process


def run_stream(
    spark: SparkSession,
    source: DataFrame,
    sinks: StreamSinks,
    cfg: StreamConfig | None = None,
):
    """Wire the pipeline into a foreachBatch streaming query and start it."""
    cfg = cfg or StreamConfig()
    process = make_batch_processor(spark, sinks, cfg)

    writer = source.writeStream.foreachBatch(process).outputMode("append")
    if cfg.checkpoint:
        writer = writer.option("checkpointLocation", cfg.checkpoint)
    if cfg.trigger_seconds:
        writer = writer.trigger(processingTime=f"{cfg.trigger_seconds} seconds")
    return writer.start()


def run_batch(
    spark: SparkSession,
    messages: DataFrame,
    cfg: StreamConfig | None = None,
):
    """Same pipeline in batch mode (golden runs / reprocessing jobs)."""
    cfg = cfg or StreamConfig()
    return enrich_batch(messages, cfg, spark)
