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
    rendered = [F.coalesce(_rendered(n, k, df), F.lit("")) for n, k in ATOMIC_FIELDS]
    out = df.select(*keep, F.concat_ws("\t", *rendered).alias("tsv"))
    if max_bytes is not None:
        out = out.withColumn("oversized", F.octet_length("tsv") > max_bytes)
    return out


def bad_rows_json(df: DataFrame, processor: str = "enrich-spark", version: str = "0.1.0") -> DataFrame:
    """BadRow JSON (semantic parity with the snowplow-badrows shapes,
    SURVEY §1.4 — schema violations / adapter failures / loader format
    violations carried with processor + failure + payload)."""
    has_schema_violations = F.size(F.col("_errors")) > 0
    failure_type = (
        F.when(F.col("loader_error").isNotNull(), F.lit("collector_payload_format_violation"))
        .when(F.col("_adapter_error").isNotNull(), F.lit("adapter_failures"))
        .when(has_schema_violations, F.lit("schema_violations"))
        .otherwise(F.lit("enrichment_failures"))
    )
    messages = (
        F.when(F.col("loader_error").isNotNull(), F.array(F.col("loader_error")))
        .when(F.col("_adapter_error").isNotNull(), F.array(F.col("_adapter_error")))
        .when(has_schema_violations, F.col("_errors"))
        .otherwise(F.col("_enrich_errors"))
    )
    return df.select(
        F.to_json(
            F.struct(
                failure_type.alias("type"),
                F.struct(
                    F.lit(processor).alias("artifact"), F.lit(version).alias("version")
                ).alias("processor"),
                F.struct(
                    format_timestamp(F.current_timestamp()).alias("timestamp"),
                    messages.alias("messages"),
                ).alias("failure"),
                F.to_json(F.struct(
                    F.col("api_vendor"), F.col("api_version"),
                    F.col("content_type"), F.col("body"),
                )).alias("payload"),
            )
        ).alias("bad_row")
    )
