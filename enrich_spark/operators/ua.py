"""User-agent enrichments — user_agent_utils fields + ua_parser context.

Covers SURVEY §2.5 #5 (UserAgentUtilsEnrichment.scala:72-111 → br_*/os_*/
dvce_* atomic fields) and #6 (UaParserEnrichment.scala:96-190 →
ua_parser_context derived context), re-expressed as a single native
CASE-WHEN/regexp expression chain.

DIVERGENCE NOTE (documented per SURVEY §7): the reference binds the Java
`user-agent-utils` and `ua-parser` libraries. We re-derive the same
output *fields* with a deterministic regex ruleset covering the major
browser/OS/device families; exotic UA strings may classify differently
than the Java libs. The ruleset is ordered most-specific-first, like
ua-parser's regexes.yaml.

Everything is JVM-side regexp — no Python in the hot path; at 100 TB the
UA classification is part of the same codegen projection as the rest of
the chain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sql_enrichments import DERIVED_COL, ensure_derived

# ordered (family, detect_regex, version_regex) — first match wins
_BROWSERS: list[tuple[str, str, str]] = [
    ("Edge", "(?i)edga?e?/", "Edga?e?/(\\d+[\\.\\d]*)"),
    ("Opera", "(?i)(opr/|opera)", "(?:OPR|Version|Opera)[/ ](\\d+[\\.\\d]*)"),
    ("Samsung Internet", "SamsungBrowser/", "SamsungBrowser/(\\d+[\\.\\d]*)"),
    ("Chrome Mobile", "(?=.*Chrome/)(?=.*Mobile)", "Chrome/(\\d+[\\.\\d]*)"),
    ("Chrome", "Chrome/", "Chrome/(\\d+[\\.\\d]*)"),
    ("Firefox Mobile", "(?=.*Firefox/)(?=.*(Mobile|Android))", "Firefox/(\\d+[\\.\\d]*)"),
    ("Firefox", "Firefox/", "Firefox/(\\d+[\\.\\d]*)"),
    ("Mobile Safari", "(?=.*Safari/)(?=.*(iPhone|iPad|Mobile))", "Version/(\\d+[\\.\\d]*)"),
    ("Safari", "(?=.*Safari/)(?=.*Version/)", "Version/(\\d+[\\.\\d]*)"),
    ("Internet Explorer", "(MSIE |Trident/)", "(?:MSIE |rv:)(\\d+[\\.\\d]*)"),
]

_RENDER_ENGINES: list[tuple[str, str]] = [
    ("GECKO", "Gecko/"),
    ("WEBKIT", "AppleWebKit/"),
    ("TRIDENT", "(MSIE |Trident/)"),
    ("PRESTO", "Presto/"),
]

# (os_name, os_family, manufacturer, regex)
_OSES: list[tuple[str, str, str, str]] = [
    ("Android", "Android", "Google Inc.", "Android"),
    ("iOS", "iOS", "Apple Inc.", "(iPhone|iPad|iPod)"),
    ("Windows 10", "Windows", "Microsoft Corporation.", "Windows NT 10"),
    ("Windows 7", "Windows", "Microsoft Corporation.", "Windows NT 6\\.1"),
    ("Windows", "Windows", "Microsoft Corporation.", "Windows"),
    ("Mac OS X", "Mac OS X", "Apple Inc.", "Mac OS X"),
    ("Chrome OS", "Chrome OS", "Google Inc.", "CrOS"),
    ("Linux", "Linux", "Other", "(Linux|X11)"),
]

_MOBILE_RE = "(?i)(mobile|iphone|ipad|ipod|android|blackberry|windows phone)"
_TABLET_RE = "(?i)(ipad|tablet|kindle|silk)"
_BOT_RE = "(?i)(bot|crawler|spider|slurp|archiver|facebookexternalhit|curl/|wget/|python-requests)"


def _first_match(ua: Column, rules: list[tuple[str, str]], default=None) -> Column:
    out = F.lit(default).cast("string")
    for name, pattern in reversed(rules):
        out = F.when(ua.rlike(pattern), F.lit(name)).otherwise(out)
    return out


def classify_ua(ua: Column) -> dict[str, Column]:
    """All derived UA columns from one useragent Column."""
    family = _first_match(ua, [(n, p) for n, p, _ in _BROWSERS], "Other")
    version = F.lit(None).cast("string")
    for name, detect, ver in reversed(_BROWSERS):
        version = F.when(ua.rlike(detect), F.regexp_extract(ua, ver, 1)).otherwise(version)
    version = F.when(version == "", F.lit(None)).otherwise(version)

    os_name = F.lit("Other").cast("string")
    os_family = F.lit("Other").cast("string")
    os_mfr = F.lit("Other").cast("string")
    for name, fam, mfr, pattern in reversed(_OSES):
        hit = ua.rlike(pattern)
        os_name = F.when(hit, F.lit(name)).otherwise(os_name)
        os_family = F.when(hit, F.lit(fam)).otherwise(os_family)
        os_mfr = F.when(hit, F.lit(mfr)).otherwise(os_mfr)

    is_bot = ua.rlike(_BOT_RE)
    is_tablet = ua.rlike(_TABLET_RE)
    is_mobile = ua.rlike(_MOBILE_RE)
    dvce_type = (
        F.when(is_bot, "Robot/Spider")
        .when(is_tablet, "Tablet")
        .when(is_mobile, "Mobile")
        .otherwise("Computer")
    )
    return {
        "br_name": F.when(version.isNotNull(),
                          F.concat_ws(" ", family, F.split(version, "\\.")[0])).otherwise(family),
        "br_family": family,
        "br_version": version,
        "br_type": F.when(is_bot, "Robot/Spider").otherwise(F.lit("Browser")),
        "br_renderengine": _first_match(ua, _RENDER_ENGINES, "OTHER"),
        "os_name": os_name,
        "os_family": os_family,
        "os_manufacturer": os_mfr,
        "dvce_type": dvce_type,
        "dvce_ismobile": (is_mobile & ~is_bot).cast("byte"),
    }


def user_agent_utils(df: DataFrame) -> DataFrame:
    """§2.5 #5 — set the br_*/os_*/dvce_* atomic fields."""
    ua = F.col("useragent")
    cols = classify_ua(ua)
    guarded = {k: F.when(ua.isNotNull(), v) for k, v in cols.items()}
    return df.withColumns(guarded)


def ua_parser_context(df: DataFrame) -> DataFrame:
    """§2.5 #6 — attach the ua_parser_context derived context."""
    df = ensure_derived(df)
    ua = F.col("useragent")
    cols = classify_ua(ua)
    ver_parts = F.split(F.coalesce(cols["br_version"], F.lit("")), "\\.")
    data = F.to_json(
        F.struct(
            cols["br_family"].alias("useragentFamily"),
            ver_parts[0].alias("useragentMajor"),
            F.when(F.size(ver_parts) > 1, ver_parts[1]).alias("useragentMinor"),
            F.when(F.size(ver_parts) > 2, ver_parts[2]).alias("useragentPatch"),
            cols["os_family"].alias("osFamily"),
            cols["dvce_type"].alias("deviceFamily"),
        )
    )
    ctx = F.struct(
        F.lit("iglu:com.snowplowanalytics.snowplow/ua_parser_context/jsonschema/1-0-0").alias("schema"),
        data.alias("data"),
    )
    return df.withColumn(
        DERIVED_COL,
        F.when(ua.isNotNull(), F.array_append(F.col(DERIVED_COL), ctx)).otherwise(F.col(DERIVED_COL)),
    )


def iab_spiders_robots(df: DataFrame, bot_patterns: list[str]) -> DataFrame:
    """§2.5 #4 — IAB spiders & robots flag as a derived context.
    (IabEnrichment.scala:137-199; list-based category simplified to the
    UA-pattern + flag contract.)"""
    df = ensure_derived(df)
    ua = F.col("useragent")
    spider = ua.rlike("|".join(f"({p})" for p in bot_patterns))
    data = F.to_json(
        F.struct(
            spider.alias("spiderOrRobot"),
            F.when(spider, F.lit("UNKNOWN_BOT")).otherwise(F.lit("BROWSER")).alias("category"),
            F.lit("UNKNOWN").alias("reason"),
            F.lit("UNKNOWN").alias("primaryImpact"),
        )
    )
    ctx = F.struct(
        F.lit("iglu:com.iab.snowplow/spiders_and_robots/jsonschema/1-0-0").alias("schema"),
        data.alias("data"),
    )
    return df.withColumn(
        DERIVED_COL,
        F.when(ua.isNotNull(), F.array_append(F.col(DERIVED_COL), ctx)).otherwise(F.col(DERIVED_COL)),
    )
