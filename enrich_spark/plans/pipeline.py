"""The enrichment pipeline assembler — the engine's "physical plan".

`enrich(payloads, cfg, spark)` composes the full chain in the reference's
fixed operator order (common/enrichments/EnrichmentManager.scala:342-393,
EtlPipeline.processEvents common/EtlPipeline.scala:53-94):

    adapt (1→N explode) → transform → pure-SQL enrichments →
    asset-backed lookups (broadcast joins) → validation → 3-way split

Enabled-ness is decided at PLAN-BUILD time (an unconfigured enrichment
contributes zero operators — better than the reference's per-row Option
checks, and Catalyst fuses whatever remains into one or two codegen
stages with NO shuffle on the event stream; the only joins are broadcast).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..adapters import registry as adapters
from ..config import EnrichmentsConfig
from ..operators import currency as currency_op
from ..operators import geo as geo_op
from ..operators import referer as referer_op
from ..operators import sql_enrichments as sql_ops
from ..operators import ua as ua_op
from ..operators.script import script_enrichment
from ..schema import ATOMIC_FIELD_NAMES, ATOMIC_FIELD_LIMITS, ATOMIC_FIELDS
from .stagecut import stage_boundary
from .transform import transform_params

UE_ENVELOPE_RE = "^iglu:com\\.snowplowanalytics\\.snowplow/unstruct_event/jsonschema/1-"
CO_ENVELOPE_RE = "^iglu:com\\.snowplowanalytics\\.snowplow/contexts/jsonschema/1-"


FAILURE_ENTITY_SCHEMA = "iglu:com.snowplowanalytics.snowplow/failure/jsonschema/1-0-0"

_stage_boundary = stage_boundary


@dataclass
class EnrichResult:
    """Tri-state output (reference OptionIor, core/Processing.scala:139-147):
    Left(bad) = phase-1 violations, the event was never valid; Both =
    `failed` — fully-enriched events whose enrichment phase failed, emitted
    as TSV to the failed sink with failure entities in derived_contexts AND
    as an EnrichmentFailures bad row; None (JS drop) vanishes upstream."""

    good: DataFrame
    bad: DataFrame
    failed: DataFrame
    all: DataFrame  # annotated superset, for tests/metrics


def enrich(payloads: DataFrame, cfg: EnrichmentsConfig, spark: SparkSession,
           observation=None) -> EnrichResult:
    """Full pipeline: CollectorPayload rows → adapter explode → enrich_raw."""
    return enrich_raw(
        adapters.adapt(payloads, remote_adapters=cfg.remote_adapters), cfg,
        spark, observation=observation
    )


_CONTEXT_DEFAULTS = {
    "loader_error": "string", "_adapter_error": "string", "ip_address": "string",
    "useragent": "string", "referer_uri": "string", "headers": "array<string>",
    "network_user_id": "string", "collector_name": "string", "hostname": "string",
    "encoding": "string", "content_type": "string", "body": "string",
    "api_vendor": "string", "api_version": "string",
}


def enrich_raw(df: DataFrame, cfg: EnrichmentsConfig, spark: SparkSession,
               observation=None) -> EnrichResult:
    """Pipeline from RawEvent rows (`parameters MAP<STRING,STRING>` +
    payload context columns; missing context columns default to NULL)."""
    df = df.withColumns({
        name: F.lit(None).cast(t)
        for name, t in _CONTEXT_DEFAULTS.items()
        if name not in df.columns
    })

    # ---- tracker-protocol transform (atomic columns + _errors)
    df = transform_params(df, v_collector_default=cfg.v_collector_default)

    # ---- collectorVersionSet guard (EnrichmentManager.scala:446-463):
    # an EnrichmentFailure, so the event lands on the failed stream with
    # a failure entity (never silently dropped)
    df = sql_ops.ensure_enrich_errors(df)
    df = df.withColumn(
        sql_ops.ENRICH_ERRORS_COL,
        F.when(
            F.col("v_collector").isNull() | (F.col("v_collector") == ""),
            F.array_append(
                F.col(sql_ops.ENRICH_ERRORS_COL),
                F.lit("v_collector\tshould be set\t"),
            ),
        ).otherwise(F.col(sql_ops.ENRICH_ERRORS_COL)),
    )

    # ---- structural validation of SDJ envelopes (full Iglu validation is
    # a UDF stage, see functions/iglu.py; envelope checks are native)
    ue_schema = F.get_json_object(F.col("ue_json"), "$.schema")
    co_schema = F.get_json_object(F.col("co_json"), "$.schema")
    df = df.withColumn(
        "_errors",
        F.concat(
            F.col("_errors"),
            F.array_compact(
                F.array(
                    F.when(
                        F.col("ue_json").isNotNull()
                        & (ue_schema.isNull() | ~ue_schema.rlike(UE_ENVELOPE_RE)),
                        F.lit("ue_pr\tnot a valid unstruct_event self-describing payload\t"),
                    ),
                    F.when(
                        F.col("co_json").isNotNull()
                        & (co_schema.isNull() | ~co_schema.rlike(CO_ENVELOPE_RE)),
                        F.lit("co\tnot a valid contexts self-describing payload\t"),
                    ),
                )
            ),
        ),
    )

    # ---- enrichment sequence (order mirrors accState :342-393)
    df = sql_ops.ensure_derived(df)
    df = sql_ops.page_uri(df)
    df = sql_ops.derived_tstamp(df)
    df = _stage_boundary(df)
    if cfg.iab:
        if cfg.iab.ip_file or cfg.iab.exclude_ua_file or cfg.iab.include_ua_file:
            from ..operators.iab import iab_context, load_lists

            df = iab_context(df, load_lists(
                cfg.iab.ip_file, cfg.iab.exclude_ua_file, cfg.iab.include_ua_file,
                cfg.iab.exclude_useragents, cfg.iab.include_useragents,
            ))
        else:
            df = ua_op.iab_spiders_robots(df, cfg.iab.bot_ua_patterns)
    if cfg.user_agent_utils:
        df = ua_op.user_agent_utils(df)
    if cfg.ua_parser:
        df = ua_op.ua_parser_context(df)
    df = _stage_boundary(df)
    if cfg.currency_conversion:
        rates = (
            currency_op.load_rates_table(spark, cfg.currency_conversion.rates_path)
            if cfg.currency_conversion.rates_path
            else currency_op.demo_rates_table(spark)
        )
        df = currency_op.currency_conversion(df, cfg.currency_conversion, rates)
    df = sql_ops.referer_uri(df)
    if cfg.referer_parser:
        db = referer_op.referer_db(spark)
        df = referer_op.referer_parser(df, cfg.referer_parser, db)
    if cfg.campaign_attribution:
        df = sql_ops.campaign_attribution(df, cfg.campaign_attribution)
    if cfg.cross_navigation:
        df = sql_ops.cross_navigation(df, cfg.cross_navigation)
    if cfg.event_fingerprint:
        df = sql_ops.event_fingerprint(df, cfg.event_fingerprint)
    df = _stage_boundary(df)
    if cfg.cookie_extractor:
        df = sql_ops.cookie_contexts(df, cfg.cookie_extractor)
    if cfg.http_header_extractor:
        df = sql_ops.http_header_contexts(df, cfg.http_header_extractor)
    if cfg.yauaa:
        df = ua_op.yauaa_context(df)
    df = sql_ops.schema_fields(df)
    df = _stage_boundary(df)
    if cfg.ip_lookups:
        geo_table = (
            geo_op.load_geo_table(spark, cfg.ip_lookups.geo_path)
            if cfg.ip_lookups.geo_path
            else geo_op.demo_geo_table(spark)
        )
        df = geo_op.ip_lookups(df, geo_table)
    else:
        # unconfigured lookups leave the atomic columns NULL
        missing = {c: F.lit(None).cast("string") for c in geo_op.GEO_COLS
                   if c not in df.columns and "lat" not in c and "lon" not in c}
        missing.update({c: F.lit(None).cast("float") for c in ("geo_latitude", "geo_longitude")
                        if c not in df.columns})
        df = df.withColumns(missing)
    if cfg.weather:
        from ..operators.lookups import weather_context

        df = weather_context(df, cfg.weather)
    if cfg.asn_lookups:
        from ..operators.asn import demo_asn_table, load_asn_table

        asn_table = (
            load_asn_table(spark, cfg.asn_lookups.ranges_path)
            if cfg.asn_lookups.ranges_path
            else demo_asn_table(spark)
        )
        df = ua_op.asn_lookups(df, asn_table, cfg.asn_lookups.datacenter_asns)
    if cfg.bot_detection:
        df = ua_op.bot_detection_context(df)
    if cfg.javascript_script and cfg.javascript_script.function:
        df = script_enrichment(df, cfg.javascript_script)
    if cfg.sql_query and cfg.sql_query_table is not None:
        from ..operators.lookups import sql_query_enrichment

        df = sql_query_enrichment(df, cfg.sql_query, cfg.sql_query_table(spark))
    elif cfg.sql_query and cfg.sql_query_fn is not None:
        from ..operators.lookups import sql_query_enrichment_udf

        df = sql_query_enrichment_udf(df, cfg.sql_query, cfg.sql_query_fn)
    if cfg.api_request:
        from ..operators.lookups import api_request_enrichment

        df = api_request_enrichment(df, cfg.api_request)
    # anonIp runs AFTER every IP-consuming lookup (EnrichmentManager:365)
    if cfg.anon_ip:
        df = sql_ops.anon_ip(df, cfg.anon_ip)
    if cfg.pii_pseudonymizer:
        df = sql_ops.pii_pseudonymizer(df, cfg.pii_pseudonymizer)
    if cfg.event_spec:
        from ..operators.eventspec import event_spec_contexts

        df = event_spec_contexts(df, cfg.event_spec)
    if cfg.identity:
        from ..operators.identity import add_identity_contexts

        df = add_identity_contexts(df, cfg.identity)

    # ---- output validation (EnrichmentManager.scala:209-257)
    if cfg.iglu:
        from ..functions.iglu import (
            SchemaRegistry, http_registry_loader, validate_sdjs,
        )

        registry = SchemaRegistry(dict(cfg.iglu.schemas))
        for d in cfg.iglu.registry_dirs:
            registry.load_dir(d)
        if cfg.iglu.http_registries:
            registry.loader = http_registry_loader(
                list(cfg.iglu.http_registries),
                transport=cfg.iglu.http_transport,
            )
        df = validate_sdjs(df, registry, strict=cfg.iglu.strict)

    # ---- atomic length validation (AtomicFieldsLengthValidator.scala:34-86)
    df = _stage_boundary(df)
    df = validate_atomic_lengths(df, accept_invalid=cfg.accept_invalid_atomic)

    # the shared UA classification struct is internal-only
    df = df.drop(ua_op.UA_STRUCT_COL)

    # ---- fill any never-set atomic columns with typed NULLs
    kinds = dict(ATOMIC_FIELDS)
    fills = {}
    for name in ATOMIC_FIELD_NAMES:
        if name not in df.columns and name not in ("contexts", "unstruct_event", "derived_contexts"):
            k = kinds[name]
            t = {"s": "string", "i": "int", "f": "float", "d": "decimal(18,2)",
                 "b": "byte", "t": "timestamp", "j": "string"}[k]
            fills[name] = F.lit(None).cast(t)
    df = df.withColumns(fills)

    df = sql_ops.ensure_enrich_errors(sql_ops.ensure_derived(df))
    bad_cond = (
        F.col("loader_error").isNotNull()
        | F.col("_adapter_error").isNotNull()
        | (F.size(F.col("_errors")) > 0)
    )
    failed_cond = ~bad_cond & (F.size(F.col(sql_ops.ENRICH_ERRORS_COL)) > 0)
    annotated = df.withColumn("_is_bad", bad_cond).withColumn("_is_failed", failed_cond)
    # failed events carry their failures as a derived context
    # (Failure.scala:33-63, attach at EnrichmentManager.scala:139-147)
    failure_entity = F.struct(
        F.lit(FAILURE_ENTITY_SCHEMA).alias("schema"),
        F.to_json(
            F.struct(
                F.lit("EnrichmentError").alias("failureType"),
                F.transform(
                    F.col(sql_ops.ENRICH_ERRORS_COL),
                    lambda m: F.struct(m.alias("message")),
                ).alias("errors"),
            )
        ).alias("data"),
    )
    annotated = annotated.withColumn(
        sql_ops.DERIVED_COL,
        F.when(
            F.col("_is_failed"),
            F.array_append(F.col(sql_ops.DERIVED_COL), failure_entity),
        ).otherwise(F.col(sql_ops.DERIVED_COL)),
    )
    if observation is not None:
        # batch-level metrics (oldest event, failed count) ride the
        # annotated frame as a CollectMetrics node BELOW the tri-state
        # split, so a caller that persists `all` and writes the three
        # sinks gets them for free from the cache-materializing job —
        # and cache-fragment substitution still matches, because the
        # sink filters are built OVER the observed plan
        annotated = annotated.observe(
            observation,
            F.min("collector_tstamp").alias("oldest"),
            F.sum(F.col("_is_failed").cast("long")).alias("n_failed"))
    return EnrichResult(
        good=annotated.where(~F.col("_is_bad") & ~F.col("_is_failed")),
        bad=annotated.where(F.col("_is_bad")),
        failed=annotated.where(F.col("_is_failed")),
        all=annotated,
    )


def validate_atomic_lengths(df: DataFrame, accept_invalid: bool = True) -> DataFrame:
    """AtomicFieldsLengthValidator.scala:34-86 semantics.

    accept_invalid=True (the v6 default): oversize values are accepted
    UNCHANGED — the reference only bumps an invalid-count metric and
    logs, it does not truncate (validateField keeps the value when
    acceptInvalid).

    accept_invalid=False: each oversize field records a FieldLengthError
    and is nullified on the event (emitFailed nullify,
    AtomicFieldsLengthValidator.scala:62-72) — the event then rides the
    failed stream with a failure entity, mirroring the reference's
    bad-row + failed-copy pair."""
    if accept_invalid:
        return df
    present = [(n, l) for n, l in ATOMIC_FIELD_LIMITS.items() if n in df.columns]
    checks = [
        F.when(
            F.length(F.col(name)) > limit,
            F.concat_ws(
                "\t", F.lit(name),
                F.lit(f"Field is longer than maximum allowed size {limit}"),
                F.col(name),
            ),
        )
        for name, limit in present
    ]
    from ..operators.sql_enrichments import ENRICH_ERRORS_COL, ensure_enrich_errors

    df = ensure_enrich_errors(df)
    df = df.withColumn(
        ENRICH_ERRORS_COL,
        F.concat(F.col(ENRICH_ERRORS_COL), F.array_compact(F.array(*checks))),
    )
    nullified = {
        name: F.when(F.length(F.col(name)) > limit, F.lit(None)).otherwise(F.col(name))
        for name, limit in present
    }
    return df.withColumns(nullified)
