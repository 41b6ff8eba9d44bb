"""Script enrichment — the user-extension hook (SURVEY §2.5 #21).

The reference's JavaScript enrichment
(registry/JavascriptScriptEnrichment.scala:62-228) exposes the contract
``process(event, params, headers) -> null | [context…] | throw | drop``
over a mutable event. Our equivalent extension surface is a Python
callable with the same contract, executed as an Arrow-batched
mapInPandas stage over the *whole* event row rendered as a dict:

    fn(event: dict, params: dict, headers: list[str])
        -> None                      # keep, unchanged
         | {"drop": True}            # drop the event (OptionIor None)
         | {"event": {...mutations}, # mutate atomic fields
            "contexts": [{"schema": ..., "data": {...}}]}  # extra derived
         | raise Exception           # EnrichmentFailure bad row

Actual JS-source execution would need a JS engine (GraalJS/mini-racer),
which this container doesn't ship — the hook keeps the *semantics*
(mutate/add-contexts/drop/fail) with Python as the scripting language.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import JavascriptScriptConf
from ..schema import ATOMIC_FIELDS
from .sql_enrichments import (
    DERIVED_COL,
    ENRICH_ERRORS_COL,
    ensure_derived,
    ensure_enrich_errors,
)

_MUTABLE_KINDS = {"s": str, "i": int, "f": float, "b": int}


def script_enrichment(df: DataFrame, conf: JavascriptScriptConf) -> DataFrame:
    df = ensure_enrich_errors(ensure_derived(df))
    fn = conf.function
    params = dict(conf.params)
    kinds = dict(ATOMIC_FIELDS)
    mutable = [c for c in df.columns if kinds.get(c) in _MUTABLE_KINDS]

    result_fields = [
        T.StructField("_script_drop", T.BooleanType()),
        T.StructField("_script_error", T.StringType()),
        T.StructField("_script_contexts", T.ArrayType(
            T.StructType([T.StructField("schema", T.StringType()),
                          T.StructField("data", T.StringType())]))),
    ] + [T.StructField(f"_m_{c}", T.StringType()) for c in mutable]
    result_type = T.StructType(result_fields)

    @F.udf(returnType=result_type)
    def run(event_json, headers):
        event = json.loads(event_json) if event_json else {}
        try:
            out = fn(event, params, list(headers or []))
        except Exception as e:  # noqa: BLE001 — contract: throw = failure
            return (False, f"Error during execution of script: {e}", None) + tuple([None] * len(mutable))
        if out is None:
            return (False, None, None) + tuple([None] * len(mutable))
        if out.get("drop"):
            return (True, None, None) + tuple([None] * len(mutable))
        ctxs = [
            (c.get("schema"), json.dumps(c.get("data"), separators=(",", ":")))
            for c in out.get("contexts", [])
        ] or None
        mutations = out.get("event", {})
        muts = tuple(
            None if c not in mutations else
            (None if mutations[c] is None else str(mutations[c]))
            for c in mutable
        )
        return (False, None, ctxs) + muts

    event_json = F.to_json(F.struct(*[F.col(c) for c in mutable]))
    df = df.withColumn("_script", run(event_json, F.col("headers")))

    cols = {}
    for c in mutable:
        new = F.col("_script").getField(f"_m_{c}")
        kind = kinds[c]
        typed = new.cast({"s": "string", "i": "int", "f": "float", "b": "byte"}[kind])
        cols[c] = F.coalesce(typed, F.col(c))
    cols[DERIVED_COL] = F.concat(
        F.col(DERIVED_COL),
        F.coalesce(F.col("_script").getField("_script_contexts"),
                   F.array().cast("array<struct<schema:string,data:string>>")),
    )
    cols[ENRICH_ERRORS_COL] = F.concat(
        F.col(ENRICH_ERRORS_COL),
        F.array_compact(F.array(F.col("_script").getField("_script_error"))),
    )
    df = df.withColumns(cols)
    # drop() semantics: the event vanishes from BOTH good and bad outputs
    df = df.where(~F.coalesce(F.col("_script").getField("_script_drop"), F.lit(False)))
    return df.drop("_script")
