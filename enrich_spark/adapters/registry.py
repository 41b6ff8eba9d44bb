"""Adapter registry — CollectorPayload → 1..N RawEvents (the explode stage).

Mirrors common/adapters/AdapterRegistry.scala:38-114 keyed on
(vendor, version). Two execution tiers, chosen at plan-build time:

* **Snowplow hot path** (tp1 / tp2 / redirect — the overwhelming share of
  traffic): pure Spark SQL. The querystring is already an
  ARRAY<STRUCT<name,value>>; tp2 bodies are parsed with `from_json` and
  exploded natively. Zero Python on the hot path.
* **Webhook long tail** (~17 vendor adapters, SURVEY §2.3): a single
  dispatching Python UDF returning ARRAY<MAP<STRING,STRING>> + errors.
  These are low-volume control-plane streams; row-at-a-time cost is
  acceptable and keeps each vendor translator a small pure function
  (see vendors.py).

Output schema: one row per RawEvent with
  parameters MAP<STRING,STRING>, plus the payload context columns, plus
  `_adapter_error STRING` (NULL when OK) for AdapterFailures bad rows.
"""

from __future__ import annotations

import json

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import vendors

SNOWPLOW_VENDOR = "com.snowplowanalytics.snowplow"
REDIRECT_VENDOR = "r"
IGLU_VENDOR = "com.snowplowanalytics.iglu"

PAYLOAD_DATA_SCHEMA = "iglu:com.snowplowanalytics.snowplow/payload_data/jsonschema/"
UE_ENVELOPE_SCHEMA = "iglu:com.snowplowanalytics.snowplow/unstruct_event/jsonschema/1-0-0"
URI_REDIRECT_SCHEMA = "iglu:com.snowplowanalytics.snowplow/uri_redirect/jsonschema/1-0-0"

# tp2 body: {"schema": "...payload_data...", "data": [{k: v, ...}, ...]}
_TP2_BODY_TYPE = "STRUCT<schema: STRING, data: ARRAY<MAP<STRING,STRING>>>"


def _qs_pairs_to_map(qs: Column) -> Column:
    """ARRAY<STRUCT<name,value>> → MAP, last-wins on duplicate names."""
    return F.map_from_entries(
        F.transform(qs, lambda e: F.struct(e.getField("name").alias("key"),
                                           e.getField("value").alias("value")))
    )


def adapt(df: DataFrame, remote_adapters: dict | None = None) -> DataFrame:
    """Fan every CollectorPayload out into RawEvents (1..N rows).

    remote_adapters: {(vendor, version): transport} — config-registered
    HTTP sidecar translators (RemoteAdapter.scala:48-117). Passed at
    plan-build time so the transports ship inside the UDF closure to
    executors (a driver-side REGISTRY mutation would not propagate to
    executor Python workers).
    """
    vendor, version = F.col("api_vendor"), F.col("api_version")
    qs = F.coalesce(
        F.col("querystring"),
        F.array().cast("array<struct<name:string,value:string>>"),
    )
    qs_map = _qs_pairs_to_map(qs)
    body_parsed = F.from_json(F.col("body"), _TP2_BODY_TYPE)

    is_snowplow = vendor == SNOWPLOW_VENDOR
    is_tp1 = is_snowplow & (version == "tp1")
    is_tp2 = is_snowplow & (version == "tp2")
    is_redirect = (vendor == REDIRECT_VENDOR) & (version == "tp2")
    is_iglu = (vendor == IGLU_VENDOR) & (version == "v1")
    is_webhook = ~(is_tp1 | is_tp2 | is_redirect | is_iglu)

    # ---- tp2: explode body events, merge qs over each (qs wins,
    # Tp2Adapter.scala:135-188); GET-only tp2 (no body) = 1 event from qs
    body_ok = (
        body_parsed.isNotNull()
        & body_parsed.getField("schema").startswith(PAYLOAD_DATA_SCHEMA)
        & body_parsed.getField("data").isNotNull()
    )
    tp2_event_maps = (
        F.when(F.col("body").isNotNull() & body_ok,
               F.transform(body_parsed.getField("data"),
                           lambda ev: _merge_qs_wins(ev, qs_map)))
        .when(F.col("body").isNull() & (F.size(qs) > 0), F.array(qs_map))
    )
    tp2_error = F.when(
        is_tp2 & F.col("body").isNotNull() & ~body_ok,
        F.lit("tp2 body is not a valid payload_data self-describing JSON"),
    ).when(
        is_tp2 & F.col("body").isNull() & (F.size(qs) == 0),
        F.lit("empty tp2 payload: no body and no querystring"),
    )

    # ---- tp1: single event from the querystring (Tp1Adapter.scala)
    tp1_event_maps = F.when(F.size(qs) > 0, F.array(qs_map))
    tp1_error = F.when(is_tp1 & (F.size(qs) == 0),
                       F.lit("empty querystring: cannot be empty for tp1"))

    # ---- redirect r/tp2: `u` param → uri_redirect unstruct event
    # (RedirectAdapter.scala — when no `e` param, synthesize e=ue + ue_pr)
    u_param = qs_map[F.lit("u")]
    redirect_ue = F.to_json(
        F.struct(
            F.lit(UE_ENVELOPE_SCHEMA).alias("schema"),
            F.struct(
                F.lit(URI_REDIRECT_SCHEMA).alias("schema"),
                F.struct(u_param.alias("uri")).alias("data"),
            ).alias("data"),
        )
    )
    base_redirect = F.map_filter(qs_map, lambda k, v: k != "u")
    with_event = F.when(
        F.map_contains_key(qs_map, F.lit("e")),
        base_redirect,
    ).otherwise(
        F.map_concat(
            base_redirect,
            F.create_map(F.lit("e"), F.lit("ue"), F.lit("ue_pr"), redirect_ue),
        )
    )
    redirect_event_maps = F.when(u_param.isNotNull(), F.array(with_event))
    redirect_error = F.when(
        is_redirect & u_param.isNull(),
        F.lit("missing `u` parameter: not a valid URI redirect"),
    )

    # ---- iglu v1: explicit `schema` param wraps remaining qs params
    # (IgluAdapter.scala GET path)
    schema_param = qs_map[F.lit("schema")]
    iglu_data = F.map_filter(
        qs_map, lambda k, v: ~k.isin("schema", "aid", "cv", "nuid", "eid", "url", "p")
    )
    iglu_ue = F.to_json(
        F.struct(
            F.lit(UE_ENVELOPE_SCHEMA).alias("schema"),
            F.struct(
                schema_param.alias("schema"),
                iglu_data.alias("data"),
            ).alias("data"),
        )
    )
    iglu_keep = F.map_filter(qs_map, lambda k, v: k.isin("aid", "cv", "nuid", "eid", "url", "p"))
    iglu_event = F.map_concat(
        iglu_keep, F.create_map(F.lit("e"), F.lit("ue"), F.lit("ue_pr"), iglu_ue)
    )
    iglu_event_maps = F.when(
        schema_param.isNotNull() & schema_param.rlike("^iglu:"), F.array(iglu_event)
    )
    iglu_error = F.when(
        is_iglu & (schema_param.isNull() | ~schema_param.rlike("^iglu:")),
        F.lit("missing or invalid `schema` parameter for Iglu adapter"),
    )

    # ---- webhook tail: python dispatch UDF
    webhook_result = _make_webhook_udf(remote_adapters)(
        vendor, version, F.to_json(qs_map), F.col("content_type"), F.col("body")
    )

    events = (
        F.when(is_tp2, tp2_event_maps)
        .when(is_tp1, tp1_event_maps)
        .when(is_redirect, redirect_event_maps)
        .when(is_iglu, iglu_event_maps)
        .otherwise(webhook_result.getField("events"))
    )
    error = (
        F.when(is_tp2, tp2_error)
        .when(is_tp1, tp1_error)
        .when(is_redirect, redirect_error)
        .when(is_iglu, iglu_error)
        .otherwise(webhook_result.getField("error"))
    )

    with_events = df.withColumns({"_raw_events": events, "_adapter_error": error})
    # explode preserving error rows (error rows have NULL events → keep one row)
    exploded = with_events.withColumn(
        "parameters",
        F.explode_outer(F.col("_raw_events")),
    ).drop("_raw_events")
    return exploded


def _merge_qs_wins(ev: Column, qs_map: Column) -> Column:
    """Merge the event map with the querystring map, qs winning on
    conflicts (Tp2Adapter.scala:135-188)."""
    return F.map_zip_with(ev, qs_map, lambda k, ev_v, qs_v: F.coalesce(qs_v, ev_v))


# --- webhook dispatch UDF ---------------------------------------------------

_WEBHOOK_RESULT_TYPE = T.StructType([
    T.StructField("events", T.ArrayType(T.MapType(T.StringType(), T.StringType()))),
    T.StructField("error", T.StringType()),
])


def _dispatch_one(remotes, vendor, version, qs_json, content_type, body):
    try:
        qs = json.loads(qs_json) if qs_json else {}
        fn = remotes.get((vendor, version)) or vendors.REGISTRY.get((vendor, version))
        if fn is None:
            return (None, f"Adapter not found for vendor [{vendor}] version [{version}]")
        events = fn(qs, content_type, body)
        return (events, None)
    except vendors.AdapterError as e:
        return (None, str(e))
    except Exception as e:  # noqa: BLE001 — never throw from the pipeline
        return (None, f"adapter crash: {type(e).__name__}: {e}")


def _make_webhook_udf(remote_adapters: dict | None = None):
    """Arrow-batched webhook dispatcher. One Python invocation per Arrow
    batch amortizes the serialization cost that dominates row-at-a-time
    `F.udf` — GA measurement protocol is a high-volume vendor on this
    path, so the batching matters (measured: SCALE.md §6)."""
    remotes = {
        key: vendors.make_remote_adapter(transport)
        for key, transport in (remote_adapters or {}).items()
    }

    @F.pandas_udf(_WEBHOOK_RESULT_TYPE)
    def _webhook_udf(vendor: pd.Series, version: pd.Series, qs_json: pd.Series,
                     content_type: pd.Series, body: pd.Series) -> pd.DataFrame:
        rows = [
            _dispatch_one(remotes, v, ver, qsj, ct, b)
            for v, ver, qsj, ct, b in zip(vendor, version, qs_json, content_type, body)
        ]
        return pd.DataFrame(rows, columns=["events", "error"])

    return _webhook_udf
