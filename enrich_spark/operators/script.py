"""Script enrichment — the user-extension hook (SURVEY §2.5 #21).

The reference's JavaScript enrichment
(registry/JavascriptScriptEnrichment.scala:62-228) exposes the contract
``process(event, params, headers) -> null | [context…] | throw | drop``
over a mutable event. Our equivalent extension surface is a Python
callable with the same contract, executed as an Arrow-batched pandas-UDF
stage over the mutable-field struct rendered as a dict (the whole
per-row JSON serialization is amortized across Arrow record batches;
``batched=False`` falls back to a row-at-a-time udf):

    fn(event: dict, params: dict, headers: list[str])
        -> None                      # keep, unchanged
         | {"drop": True}            # drop the event (OptionIor None)
         | {"event": {...mutations}, # mutate atomic fields
            "contexts": [{"schema": ..., "data": {...}}]}  # extra derived
         | raise Exception           # EnrichmentFailure bad row

Actual JS-source execution needs a JS engine. ``javascript_config_to_hook``
below adapts the reference's base64-script config shape onto this hook:
it discovers an embeddable engine (quickjs / py_mini_racer / dukpy) at
runtime and wraps the user's ``process()`` in the hook contract. THIS
CONTAINER SHIPS NONE OF THEM (verified: all three fail to import and
pip install is unavailable), so in this sandbox the adapter raises a
documented NotImplementedError and the Python hook remains the supported
scripting surface; the adapter layer itself (config parsing, entry-point
validation, engine wiring, result translation) is real and unit-tested
via an injected engine.
"""

from __future__ import annotations

import base64
import json

import pandas as pd

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


def _script_run_one(fn, params, mutable, event_json, headers):
    """Per-event hook invocation → result tuple (drop, error, contexts,
    *mutations). Shared by the Arrow-batched and row-at-a-time wrappers."""
    event = json.loads(event_json) if event_json else {}
    hs = [] if headers is None else list(headers)
    nil = tuple([None] * len(mutable))
    try:
        out = fn(event, params, hs)
    except Exception as e:  # noqa: BLE001 — contract: throw = failure
        return (False, f"Error during execution of script: {e}", None) + nil
    if out is None:
        return (False, None, None) + nil
    if out.get("drop"):
        return (True, None, None) + nil
    ctxs = [
        {"schema": c.get("schema"),
         "data": json.dumps(c.get("data"), separators=(",", ":"))}
        for c in out.get("contexts", [])
    ] or None
    mutations = out.get("event", {})
    muts = tuple(
        None if c not in mutations else
        (None if mutations[c] is None else str(mutations[c]))
        for c in mutable
    )
    return (False, None, ctxs) + muts


def script_enrichment(df: DataFrame, conf: JavascriptScriptConf,
                      batched: bool = True) -> DataFrame:
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
    out_cols = ["_script_drop", "_script_error", "_script_contexts"] + [
        f"_m_{c}" for c in mutable
    ]

    if batched:
        @F.pandas_udf(result_type)
        def run(ev: pd.Series, hdr: pd.Series) -> pd.DataFrame:
            return pd.DataFrame(
                [_script_run_one(fn, params, mutable, e, h)
                 for e, h in zip(ev, hdr)],
                columns=out_cols,
            )
    else:
        @F.udf(returnType=result_type)
        def run(event_json, headers):
            return _script_run_one(fn, params, mutable, event_json, headers)

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


# ---------------------------------------------------------------------------
# JavaScript-config adapter (JavascriptScriptEnrichment.scala:62-228)


def _js_call_snippet(source: str, event: dict, params: dict, headers: list) -> str:
    """One self-contained JS expression: run the user script, call
    process() on a JSON round-tripped event, return {event, contexts}."""
    return (
        source + ";\n"
        + "JSON.stringify((function(){"
        + f"var e = {json.dumps(event)};"
        + f"var r = process(e, {json.dumps(params)}, {json.dumps(headers)});"
        + "return {event: e, contexts: r || []};})())"
    )


def _quickjs_engine():
    import quickjs

    def call(source, event, params, headers):
        ctx = quickjs.Context()
        out = json.loads(ctx.eval(_js_call_snippet(source, event, params, headers)))
        return {"event": out["event"], "contexts": out["contexts"]}

    return call


def _mini_racer_engine():
    from py_mini_racer import MiniRacer

    def call(source, event, params, headers):
        out = json.loads(MiniRacer().eval(
            _js_call_snippet(source, event, params, headers)))
        return {"event": out["event"], "contexts": out["contexts"]}

    return call


def _dukpy_engine():
    import dukpy

    def call(source, event, params, headers):
        out = json.loads(dukpy.evaljs(
            _js_call_snippet(source, event, params, headers)))
        return {"event": out["event"], "contexts": out["contexts"]}

    return call


_JS_ENGINES = (
    ("quickjs", _quickjs_engine),
    ("py_mini_racer", _mini_racer_engine),
    ("dukpy", _dukpy_engine),
)


def discover_js_engine():
    """First importable embeddable JS engine, else None."""
    for mod, factory in _JS_ENGINES:
        try:
            __import__(mod)
        except ImportError:
            continue
        return factory()
    return None


def javascript_config_to_hook(config: dict, engine=None) -> JavascriptScriptConf:
    """Reference javascript_script_config → a JavascriptScriptConf hook.

    Parses the SDJ config shape ({data: {parameters: {script: <base64>,
    config: {...}}}}), validates the decoded source declares the
    ``process`` entry point (the reference compiles + requires it at
    init, JavascriptScriptEnrichment.scala:71-96), then wires the first
    available JS engine into the hook contract. ``engine`` is injectable
    for tests / custom runtimes: a callable
    ``(source, event, params, headers) -> hook-result-dict``.

    Raises NotImplementedError when no engine exists — in this sandbox
    none of quickjs / py_mini_racer / dukpy is installed and installing
    packages is unavailable, so users must port their script body to the
    equivalent Python hook (same mutate/contexts/drop/throw contract).
    """
    data = config.get("data", config)
    params = data.get("parameters") or {}
    b64 = params.get("script") or ""
    try:
        source = base64.b64decode(b64, validate=True).decode("utf-8")
    except Exception as e:
        raise ValueError(f"javascript_script_config: script is not valid base64: {e}") from e
    if "function process" not in source:
        raise ValueError(
            "javascript_script_config: script must declare "
            "`function process(event, params, headers)`"
        )
    extra = params.get("config") or {}
    engine = engine or discover_js_engine()
    if engine is None:
        raise NotImplementedError(
            "JavaScript execution requires an embeddable JS engine "
            "(quickjs, py_mini_racer, or dukpy); none is installed in this "
            "environment and package installation is unavailable. Port the "
            "script body to a Python hook with the same contract "
            "(JavascriptScriptConf.function; see module docstring)."
        )

    def fn(event, p, headers):
        return engine(source, event, {**extra, **p}, headers)

    return JavascriptScriptConf(function=fn, params=extra)
