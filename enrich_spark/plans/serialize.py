"""Sink serialization — enriched TSV + bad-row JSON.

Mirrors core/Processing.scala:203-260 + ConversionUtils.scala:562-710:
131 columns tab-joined, NULL→'', bytes as 0/1, timestamps
'yyyy-MM-dd HH:mm:ss.SSS', SDJ envelope JSON for the 3 JSON columns;
oversize records become SizeViolation bad rows. Pure Spark SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.conversions import format_timestamp
from ..schema import ATOMIC_FIELDS

_ATOMIC = list(ATOMIC_FIELDS)

CONTEXTS_ENVELOPE = "iglu:com.snowplowanalytics.snowplow/contexts/jsonschema/1-0-1"


def _sdj_array_to_envelope(arr: Column) -> Column:
    """ARRAY<STRUCT<schema,data-json>> → contexts envelope JSON string,
    embedding the raw data JSON (so we can't use to_json, which would
    re-quote it)."""
    items = F.transform(
        arr,
        lambda c: F.concat(
            F.lit('{"schema":"'), c.getField("schema"), F.lit('","data":'),
            c.getField("data"), F.lit("}"),
        ),
    )
    return F.when(
        F.size(arr) > 0,
        F.concat(F.lit('{"schema":"%s","data":[' % CONTEXTS_ENVELOPE),
                 F.array_join(items, ","), F.lit("]}")),
    )


def _rendered(name: str, kind: str, df: DataFrame) -> Column:
    if name == "contexts":
        return F.col("co_json")  # already the SDJ envelope from the tracker
    if name == "unstruct_event":
        return F.col("ue_json")
    if name == "derived_contexts":
        return _sdj_array_to_envelope(F.col("_derived"))
    col = F.col(name)
    if kind == "t":
        return format_timestamp(col)
    if kind == "d":
        return F.when(col.isNotNull(), col.cast("string"))
    if kind in ("i", "f", "b"):
        return col.cast("string")
    return col


def to_tsv(
    df: DataFrame, max_bytes: int | None = None, keep: tuple[str, ...] = ()
) -> DataFrame:
    """One `tsv STRING` column in exact atomic order (+ `oversized` flag).

    `keep` carries pass-through columns (e.g. a source row id) alongside
    the serialized line for correlation in tests/queries."""
    from .stagecut import stage_boundary

    # boundary: without it CollapseProject folds the 131-column concat_ws
    # (each column's full enrichment expression re-inlined) into the
    # upstream chain projection and the fused method blows Janino's 64KB
    # limit — whole-stage codegen then silently falls back to interpreted
    # eval on the hottest full-width path
    df = stage_boundary(df)
    rendered = [F.coalesce(_rendered(n, k, df), F.lit("")) for n, k in ATOMIC_FIELDS]
    out = df.select(*keep, F.concat_ws("\t", *rendered).alias("tsv"))
    if max_bytes is not None:
        out = out.withColumn("oversized", F.octet_length("tsv") > max_bytes)
    return out


_BADROWS = "iglu:com.snowplowanalytics.snowplow.badrows/"

# failure class → (badrows schema name, schema version) — the public
# snowplow-badrows schema registry used by the reference throughout
# (ThriftLoader.scala:71-78 CPFormatViolation, AdapterRegistry.scala:116-135
# AdapterFailures, EnrichmentManager.scala:117-137 SchemaViolations /
# EnrichmentFailures, core/Processing.scala:352-368 SizeViolation)
_BADROW_SCHEMAS = {
    "collector_payload_format_violation": "1-0-0",
    "adapter_failures": "1-0-0",
    "schema_violations": "2-0-0",
    "enrichment_failures": "2-0-0",
    "size_violation": "1-0-0",
}


def _structured_messages(errs: Column) -> Column:
    """Internal '<field>\\t<message>\\t<value>' error strings → the
    badrows message object shape {field, message, value}."""
    return F.transform(
        errs,
        lambda e: F.struct(
            F.split_part(e, F.lit("\t"), F.lit(1)).alias("field"),
            F.split_part(e, F.lit("\t"), F.lit(2)).alias("message"),
            F.nullif(F.split_part(e, F.lit("\t"), F.lit(3)), F.lit("")).alias("value"),
        ),
    )


def bad_rows_json(df: DataFrame, processor: str = "enrich-spark", version: str = "0.1.0",
                  keep: tuple[str, ...] = ()) -> DataFrame:
    """BadRow as the snowplow-badrows self-describing JSON envelope:

        {"schema": "iglu:com.snowplowanalytics.snowplow.badrows/<type>/jsonschema/<ver>",
         "data": {"processor": {...}, "failure": {...}, "payload": {...}}}

    Field-for-field with the public badrows schemas at the envelope /
    processor / failure.timestamp+messages / payload level. Payload shape
    follows the per-class badrows contract: collector-payload
    {vendor,version,contentType,body} for CPFormatViolation /
    AdapterFailures, and the EnrichmentPayload {enriched, raw} pair for
    the 2-0-0 schema_violations / enrichment_failures classes (enriched =
    the partially-enriched atomic fields present at failure time, raw =
    the collector-payload echo). Message bodies carry our structured
    {field, message, value} triples (the reference's per-subtype message
    unions collapse onto this shape — documented divergence, byte-parity
    is not claimed for message internals)."""
    from .stagecut import stage_boundary

    # boundary before the envelope projection: the to_json over the full
    # partially-enriched atomic struct re-inlines every enrichment
    # expression otherwise (same 64KB fallback as to_tsv above)
    df = stage_boundary(df)
    has_schema_violations = F.size(F.col("_errors")) > 0
    failure_type = (
        F.when(F.col("loader_error").isNotNull(), F.lit("collector_payload_format_violation"))
        .when(F.col("_adapter_error").isNotNull(), F.lit("adapter_failures"))
        .when(has_schema_violations, F.lit("schema_violations"))
        .otherwise(F.lit("enrichment_failures"))
    )
    schema_uri = F.concat(
        F.lit(_BADROWS), failure_type, F.lit("/jsonschema/"),
        failure_type_version(failure_type),
    )
    # failure section per type (loader: single message + loader name;
    # adapter: vendor/version + messages; schema/enrichment: messages)
    failure = (
        F.when(F.col("loader_error").isNotNull(), F.to_json(F.struct(
            format_timestamp(F.current_timestamp()).alias("timestamp"),
            F.lit("thrift").alias("loader"),
            F.col("loader_error").alias("message"),
        )))
        .when(F.col("_adapter_error").isNotNull(), F.to_json(F.struct(
            format_timestamp(F.current_timestamp()).alias("timestamp"),
            F.col("api_vendor").alias("vendor"),
            F.col("api_version").alias("version"),
            F.array(F.struct(F.col("_adapter_error").alias("message"))).alias("messages"),
        )))
        .otherwise(F.to_json(F.struct(
            format_timestamp(F.current_timestamp()).alias("timestamp"),
            F.when(has_schema_violations, _structured_messages(F.col("_errors")))
            .otherwise(_structured_messages(F.col("_enrich_errors"))).alias("messages"),
        )))
    )
    cp_payload = F.to_json(F.struct(
        F.col("api_vendor").alias("vendor"),
        F.col("api_version").alias("version"),
        F.col("content_type").alias("contentType"),
        F.col("body").alias("body"),
    ))
    # schema_violations / enrichment_failures 2-0-0 carry the
    # EnrichmentPayload pair: the partially-enriched event (whatever
    # atomic fields exist at this point in the plan) + the raw echo
    raw_fields = [
        F.col("api_vendor").alias("vendor"),
        F.col("api_version").alias("version"),
        F.col("content_type").alias("contentType"),
        F.col("body").alias("body"),
    ]
    if "parameters" in df.columns:
        raw_fields.append(F.col("parameters").alias("parameters"))
    present = [c for c, _ in _ATOMIC if c in df.columns]
    enriched_json = (
        F.to_json(F.struct(*[F.col(c) for c in present]))
        if present else F.lit("{}")
    )
    ep_payload = F.concat(
        F.lit('{"enriched":'), F.coalesce(enriched_json, F.lit("{}")),
        F.lit(',"raw":'), F.to_json(F.struct(*raw_fields)), F.lit("}"),
    )
    payload = F.when(
        F.col("loader_error").isNotNull() | F.col("_adapter_error").isNotNull(),
        cp_payload,
    ).otherwise(ep_payload)
    return df.select(
        *keep,
        F.concat(
            F.lit('{"schema":"'), schema_uri,
            F.lit('","data":{"processor":'),
            F.to_json(F.struct(F.lit(processor).alias("artifact"),
                               F.lit(version).alias("version"))),
            F.lit(',"failure":'), failure,
            F.lit(',"payload":'), payload,
            F.lit("}}"),
        ).alias("bad_row")
    )


def failure_type_version(failure_type: Column) -> Column:
    expr = None
    for name, ver in _BADROW_SCHEMAS.items():
        cond = F.when(failure_type == name, F.lit(ver))
        expr = cond if expr is None else expr.when(failure_type == name, F.lit(ver))
    return expr.otherwise(F.lit("1-0-0"))


def size_violation_json(
    df: DataFrame,
    max_bytes: int,
    processor: str = "enrich-spark",
    version: str = "0.1.0",
    line_col: str = "tsv",
) -> DataFrame:
    """SizeViolation bad row for oversize serialized records
    (core/Processing.scala:352-368): the payload carries a truncated
    prefix of the offending line, never the full record."""
    return df.select(
        F.to_json(F.struct(
            F.lit(f"{_BADROWS}size_violation/jsonschema/1-0-0").alias("schema"),
            F.struct(
                F.struct(F.lit(processor).alias("artifact"),
                         F.lit(version).alias("version")).alias("processor"),
                F.struct(
                    format_timestamp(F.current_timestamp()).alias("timestamp"),
                    F.octet_length(F.col(line_col)).alias("actualSizeBytes"),
                    F.lit(max_bytes).alias("maximumAllowedSizeBytes"),
                    F.lit("oversized enriched event").alias("expectation"),
                ).alias("failure"),
                F.substring(F.col(line_col), 1, 256).alias("payload"),
            ).alias("data"),
        )).alias("bad_row")
    )
