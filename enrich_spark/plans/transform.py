"""Tracker-protocol → atomic-column transform stage.

Mirrors common/enrichments/Transform.scala:94-223 (the ~70-key
transformMap) and the event setup in
common/enrichments/EnrichmentManager.scala:396-426, re-expressed as ONE
declarative Spark select so Catalyst fuses the whole stage into a single
whole-stage-codegen projection (no shuffle, no Python).

Input contract: a DataFrame of raw events with
  - ``parameters MAP<STRING,STRING>``       (from the adapter stage)
  - payload context columns: ``collector_tstamp TIMESTAMP``,
    ``ip_address``, ``useragent``, ``referer_uri``, ``headers ARRAY<STRING>``,
    ``network_user_id``, ``collector_name``, ``hostname``, ``encoding``
Output: input columns plus every atomic column the transform can set,
``ue_json`` / ``co_json`` (raw SDJ envelope strings), and
``_errors ARRAY<STRING>`` of accumulated ParseErrors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import conversions as C
from .stagecut import stage_boundary

V_ETL = "enrich-spark-0.1.0"


def _p(key: str) -> Column:
    return F.col("parameters").getItem(key)


def _pc(key: str) -> Column:
    """Read from the pre-cleaned map (tsv-safe keys already cleaned +
    ''→NULL applied) — a tiny element_at, not an inlined regexp tree."""
    return F.col("_pclean").getItem(key)


# the transform-map keys the reference passes through toTsvSafe
# (Transform.scala simpleTransform list + the legacy se_*/ev_*/ti_*
# pairs + ua/tnuid/nuid/cv) — cleaned ONCE at the map level below
_TSV_SAFE_KEYS = [
    "aid", "uid", "duid", "fp", "tna", "tv", "lang", "cd", "tz", "refr",
    "url", "page", "cs", "tr_id", "tr_af", "tr_ci", "tr_st", "tr_co",
    "ti_id", "ti_sk", "ti_ca", "tr_cu", "ti_cu",
    "se_ca", "ev_ca", "se_ac", "ev_ac", "se_la", "ev_la", "se_pr", "ev_pr",
    "ti_nm", "ti_na", "ua", "tnuid", "nuid", "cv",
]


def transform_params(df: DataFrame, v_collector_default: str | None = "unknown") -> DataFrame:
    """Apply the full transform map. Pure column expressions.

    The ~37 toTsvSafe fields are cleaned ONCE at the map level
    (transform_values behind a stage boundary): inlining the double
    regexp_replace per atomic column made the fused transform projection
    exceed Janino's 64KB method limit (whole-stage codegen then silently
    fell back to interpreted eval for the full-width stage), and it also
    re-ran each regexp 2-4× per column reference. One pass over ~30 map
    entries replaces ~74 inlined regexp trees — smaller code AND less
    per-row work at 100 TB."""
    cols: dict[str, Column] = {}
    errs: list[Column] = []

    cleaned = F.transform_values(
        "parameters",
        lambda k, v: F.when(
            k.isin(_TSV_SAFE_KEYS),
            F.nullif(C.fix_tabs_strip_ctrl(v), F.lit("")),
        ).otherwise(v),
    )
    # boundary: without it CollapseProject re-inlines the map transform
    # into every consuming column, recreating the blow-up it removes
    df = stage_boundary(df.withColumn("_pclean", cleaned))

    def fallible(name: str, pair):
        val, err = pair
        cols[name] = val
        errs.append(err)

    # --- simple TSV-safe string fields (Transform.scala simpleTransform + toTsvSafe)
    for key, field in [
        ("aid", "app_id"), ("uid", "user_id"), ("duid", "domain_userid"),
        ("fp", "user_fingerprint"), ("tna", "name_tracker"), ("tv", "v_tracker"),
        ("lang", "br_lang"), ("cd", "br_colordepth"),
        ("tz", "os_timezone"), ("refr", "page_referrer"), ("url", "page_url"),
        ("page", "page_title"), ("cs", "doc_charset"),
        ("tr_id", "tr_orderid"), ("tr_af", "tr_affiliation"), ("tr_ci", "tr_city"),
        ("tr_st", "tr_state"), ("tr_co", "tr_country"),
        ("ti_id", "ti_orderid"), ("ti_sk", "ti_sku"), ("ti_ca", "ti_category"),
        ("tr_cu", "tr_currency"), ("ti_cu", "ti_currency"),
    ]:
        cols[field] = _pc(key)

    # legacy pairs: se_* wins over ev_*, ti_nm over ti_na (Transform.scala:186-207)
    for se_key, ev_key, field in [
        ("se_ca", "ev_ca", "se_category"), ("se_ac", "ev_ac", "se_action"),
        ("se_la", "ev_la", "se_label"), ("se_pr", "ev_pr", "se_property"),
    ]:
        cols[field] = F.coalesce(_pc(se_key), _pc(ev_key))
    cols["ti_name"] = F.coalesce(_pc("ti_nm"), _pc("ti_na"))

    # --- typed casts
    fallible("event", C.extract_event_type(_p("e")))
    fallible("platform", C.extract_platform(_p("p")))
    fallible("txn_id", C.to_int(_p("tid"), "tid"))
    fallible("domain_sessionidx", C.to_int(_p("vid"), "vid"))
    fallible("domain_sessionid", C.validate_uuid(_p("sid"), "sid"))
    fallible("dvce_created_tstamp", C.extract_timestamp(_p("dtm"), "dtm"))
    fallible("true_tstamp", C.extract_timestamp(_p("ttm"), "ttm"))
    fallible("dvce_sent_tstamp", C.extract_timestamp(_p("stm"), "stm"))
    fallible("se_value", C.to_decimal(F.coalesce(_p("se_va"), _p("ev_va")), "se_va"))
    fallible("tr_total", C.to_decimal(_p("tr_tt"), "tr_tt"))
    fallible("tr_tax", C.to_decimal(_p("tr_tx"), "tr_tx"))
    fallible("tr_shipping", C.to_decimal(_p("tr_sh"), "tr_sh"))
    fallible("ti_price", C.to_decimal(_p("ti_pr"), "ti_pr"))
    fallible("ti_quantity", C.to_int(_p("ti_qu"), "ti_qu"))
    fallible("pp_xoffset_min", C.to_int(_p("pp_mix"), "pp_mix"))
    fallible("pp_xoffset_max", C.to_int(_p("pp_max"), "pp_max"))
    fallible("pp_yoffset_min", C.to_int(_p("pp_miy"), "pp_miy"))
    fallible("pp_yoffset_max", C.to_int(_p("pp_may"), "pp_may"))

    # boolean-like bytes (f_* features + cookie)
    for key, field in [
        ("f_pdf", "br_features_pdf"), ("f_fla", "br_features_flash"),
        ("f_java", "br_features_java"), ("f_dir", "br_features_director"),
        ("f_qt", "br_features_quicktime"), ("f_realp", "br_features_realplayer"),
        ("f_wma", "br_features_windowsmedia"), ("f_gears", "br_features_gears"),
        ("f_ag", "br_features_silverlight"), ("cookie", "br_cookies"),
    ]:
        fallible(field, C.to_boolean_like_byte(_p(key), key))

    # packed WxH dimension pairs
    (w, h), e = C.extract_view_dimensions(_p("res"), "res")
    cols["dvce_screenwidth"], cols["dvce_screenheight"] = w, h
    errs.append(e)
    (w, h), e = C.extract_view_dimensions(_p("ds"), "ds")
    cols["doc_width"], cols["doc_height"] = w, h
    errs.append(e)
    (w, h), e = C.extract_view_dimensions(_p("vp"), "vp")
    cols["br_viewwidth"], cols["br_viewheight"] = w, h
    errs.append(e)

    # eid: valid uuid wins, else generated UUID4 (EnrichmentManager.scala:399,
    # EventEnrichments.generateEventId:169)
    eid_val, eid_err = C.validate_uuid(_p("eid"), "eid")
    cols["event_id"] = F.coalesce(eid_val, F.expr("uuid()"))
    errs.append(eid_err)

    # ip param overrides collector ip; both XFF-split (Transform 'ip' +
    # EnrichmentManager.scala:414 user_ipaddress setup)
    cols["user_ipaddress"] = F.coalesce(
        C.extract_ip(_p("ip")), C.extract_ip(F.col("ip_address"))
    )

    # ua param overrides payload useragent (Transform 'ua' + setup :417-419)
    cols["useragent"] = F.coalesce(
        _pc("ua"), C.make_tsv_safe(F.col("useragent"))
    )

    # network_userid: tnuid > nuid > payload networkUserId (Transform.scala:52-54)
    cols["network_userid"] = F.coalesce(
        _pc("tnuid"), _pc("nuid"),
        F.col("network_user_id"),
    )

    # special accumulator fields: unstruct event + contexts, plain or base64
    ue_px, ue_px_err = C.decode_base64_url(_p("ue_px"), "ue_px")
    cx, cx_err = C.decode_base64_url(_p("cx"), "cx")
    cols["ue_json"] = F.coalesce(_p("ue_pr"), ue_px)
    cols["co_json"] = F.coalesce(_p("co"), cx)
    errs.extend([ue_px_err, cx_err])

    # --- event setup (EnrichmentManager.setupEnrichedEvent:396-426)
    # cv param wins over the payload's collector name (transform map 'cv'
    # runs after setupEnrichedEvent seeds it from source.name)
    cols["v_collector"] = F.coalesce(
        _pc("cv"), F.col("collector_name"),
        F.lit(v_collector_default).cast("string"),
    )
    cols["v_etl"] = F.lit(V_ETL)
    cols["etl_tstamp"] = F.current_timestamp()
    # collector_tstamp arrives as a real timestamp from the loader; Redshift
    # year guard (EventEnrichments.formatCollectorTstamp:52-59)
    ct_ok = F.col("collector_tstamp").isNotNull() & F.year("collector_tstamp").between(0, 9999)
    cols["collector_tstamp"] = F.when(ct_ok, F.col("collector_tstamp"))
    errs.append(
        F.when(
            F.col("collector_tstamp").isNotNull() & ~ct_ok,
            C.parse_error("collector_tstamp", "Not Redshift-compatible",
                          F.col("collector_tstamp").cast("string")),
        )
    )

    # Materialize each per-field error tree as its own projection output
    # (one subexpression method each, so whole-stage codegen compiles)
    # instead of inlining ~40 parse trees into a single giant array()
    # expression — that one expression was a 766KB generated method,
    # blowing Janino's 64KB limit and dropping the whole transform stage
    # out of codegen. The stage boundary stops CollapseProject from
    # re-inlining the temps into the combine below.
    err_cols = {f"_err_{i}": e for i, e in enumerate(e for e in errs if e is not None)}
    out = df.withColumns({**cols, **err_cols})
    out = stage_boundary(out)
    # opaque(): keep the error tree out of pushed-down predicates — see
    # functions/conversions.opaque docstring
    out = out.withColumn(
        "_errors",
        C.opaque(F.array_compact(F.array(*[F.col(c) for c in err_cols]))),
    )
    return out.drop("_pclean", *err_cols)
