"""IAB Spiders & Robots enrichment — real list-file semantics.

Mirrors registry/IabEnrichment.scala:100-199, whose checks live in the
public ``iab-spiders-and-robots-client`` Java library. Three input files
(config/enrichments/iab_spiders_and_robots_enrichment.json):

* **ip file** (``ip_exclude_current_cidr.txt``) — one IPv4 CIDR per
  line (``#`` comments / blank lines skipped)
* **exclude file** (``exclude_current.txt``) — pipe-delimited UA records
  of known spiders/robots
* **include file** (``include_current.txt``) — pipe-delimited UA records
  of legitimate browsers

UA record layout (pipe-delimited, one per line)::

    pattern|active|exceptions|start_of_string|inactive_date|impact

  pattern          literal substring, matched case-insensitively
  active           1/0 (0 = retired list entry)
  exceptions       comma-separated substrings that veto the match
  start_of_string  1 = pattern must match at position 0
  inactive_date    YYYY-MM-DD after which the entry is retired
  impact           P=PAGE_IMPRESSIONS A=AD_IMPRESSIONS
                   B=PAGE_AND_AD_IMPRESSIONS N=NONE U=UNKNOWN

Decision order (IabEnrichmentSpec.scala expectation rows):

1. IP inside a CIDR range      → FAILED_IP_EXCLUDE, SPIDER_OR_ROBOT, UNKNOWN
2. UA matches no include record → FAILED_UA_INCLUDE, SPIDER_OR_ROBOT, UNKNOWN
3. UA matches an exclude record → FAILED_UA_EXCLUDE; ACTIVE_/INACTIVE_
   SPIDER_OR_ROBOT by the record's active flag + inactive_date vs the
   event date (the ``accurateAt`` argument of checkAt); impact from record
4. else                         → BROWSER, PASSED_ALL, NONE

Scale: every check compiles to native column expressions over
plan-literal record arrays. The production lists are O(2k) records — a
few hundred KB of plan constants, shipped once per executor with the
task binary, evaluated JVM-side per row (no shuffle, no Python, no
per-row regex compilation). If a list ever outgrew plan-literal size the
CIDR check drops into the bucketized broadcast range join used by
ip_lookups (operators/geo.py) unchanged.
"""

from __future__ import annotations

import ipaddress
from dataclasses import dataclass, field
from datetime import date
from pathlib import Path

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .geo import ip_to_long
from .sql_enrichments import DERIVED_COL, ensure_derived

IAB_SCHEMA = "iglu:com.iab.snowplow/spiders_and_robots/jsonschema/1-0-0"

_IMPACT = {"P": "PAGE_IMPRESSIONS", "A": "AD_IMPRESSIONS",
           "B": "PAGE_AND_AD_IMPRESSIONS", "N": "NONE", "U": "UNKNOWN"}


@dataclass
class UaRecord:
    pattern: str
    active: bool = True
    exceptions: tuple[str, ...] = ()
    start_of_string: bool = False
    inactive_date: str | None = None  # YYYY-MM-DD
    impact: str = "UNKNOWN"


@dataclass
class IabLists:
    ip_ranges: list[tuple[int, int]] = field(default_factory=list)
    exclude: list[UaRecord] = field(default_factory=list)
    include: list[UaRecord] = field(default_factory=list)


def parse_ip_file(path: str | Path) -> list[tuple[int, int]]:
    """CIDR-per-line → [(lo_uint32, hi_uint32)]. IPv4 only: an IPv6 CIDR
    would yield 128-bit bounds that can never match the 32-bit ip_to_long
    probe. Such entries are SKIPPED with a warning rather than raised —
    the file is vendor-authored and one IPv6 line must not take down the
    whole pipeline at plan-build time (the entry was inert before too;
    now the operator says so)."""
    import warnings

    out = []
    for line in Path(path).read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        net = ipaddress.ip_network(line, strict=False)
        if net.version != 4:
            warnings.warn(
                f"IAB ip exclude list is IPv4-only; skipping {line!r} in {path}",
                stacklevel=2,
            )
            continue
        out.append((int(net.network_address), int(net.broadcast_address)))
    return out


def parse_ua_file(path: str | Path) -> list[UaRecord]:
    """Pipe-delimited UA list file → records (layout in module doc)."""
    out = []
    for line in Path(path).read_text().splitlines():
        line = line.rstrip("\n")
        if not line.strip() or line.startswith("#"):
            continue
        parts = (line.split("|") + [""] * 6)[:6]
        pattern, active, exceptions, sos, inactive, impact = parts
        if not pattern:
            continue
        out.append(UaRecord(
            pattern=pattern.lower(),
            active=active.strip() != "0",
            exceptions=tuple(
                e.strip().lower() for e in exceptions.split(",") if e.strip()
            ),
            start_of_string=sos.strip() == "1",
            inactive_date=inactive.strip() or None,
            impact=_IMPACT.get(impact.strip().upper(), "UNKNOWN"),
        ))
    return out


def load_lists(
    ip_file: str | None = None,
    exclude_ua_file: str | None = None,
    include_ua_file: str | None = None,
    exclude_useragents: list[str] = (),
    include_useragents: list[str] = (),
) -> IabLists:
    """Files + the config's literal excludeUseragents/includeUseragents
    extras (IabEnrichment.scala:115-116)."""
    lists = IabLists(
        ip_ranges=parse_ip_file(ip_file) if ip_file else [],
        exclude=parse_ua_file(exclude_ua_file) if exclude_ua_file else [],
        include=parse_ua_file(include_ua_file) if include_ua_file else [],
    )
    lists.exclude += [UaRecord(pattern=p.lower()) for p in exclude_useragents]
    lists.include += [UaRecord(pattern=p.lower()) for p in include_useragents]
    return lists


def _record_array(records: list[UaRecord]) -> Column:
    return F.array(*[
        F.struct(
            F.lit(r.pattern).alias("pattern"),
            F.lit(r.active).alias("active"),
            F.array(*[F.lit(e) for e in r.exceptions]).cast("array<string>").alias("exceptions"),
            F.lit(r.start_of_string).alias("sos"),
            F.lit(r.inactive_date).cast("string").alias("inactive_date"),
            F.lit(r.impact).alias("impact"),
        )
        for r in records
    ])


def _matches(ua: Column):
    def match(rec: Column) -> Column:
        hit = F.when(rec.getField("sos"), ua.startswith(rec.getField("pattern"))) \
            .otherwise(ua.contains(rec.getField("pattern")))
        vetoed = F.exists(rec.getField("exceptions"), lambda e: ua.contains(e))
        return hit & ~vetoed

    return match


def iab_context(
    df: DataFrame,
    lists: IabLists,
    ua_col: str = "useragent",
    ip_col: str = "user_ipaddress",
    date_col: str = "derived_tstamp",
) -> DataFrame:
    """Attach the com.iab.snowplow/spiders_and_robots/1-0-0 context.

    Runs BEFORE IP anonymization (EnrichmentManager accState order,
    :568-580). Rows with a NULL useragent or unparseable IP skip the
    context (the reference's performCheck needs both)."""
    df = ensure_derived(df)
    ua = F.lower(F.col(ua_col))
    ip_num = ip_to_long(F.col(ip_col))
    ev_date = F.to_date(F.col(date_col))

    ip_excluded = F.lit(False)
    if lists.ip_ranges:
        ranges = F.array(*[
            F.struct(F.lit(lo).alias("lo"), F.lit(hi).alias("hi"))
            for lo, hi in lists.ip_ranges
        ])
        ip_excluded = F.exists(
            ranges, lambda r: ip_num.between(r.getField("lo"), r.getField("hi"))
        )

    included = F.exists(_record_array(lists.include), _matches(ua)) \
        if lists.include else F.lit(True)

    if lists.exclude:
        matched = F.filter(_record_array(lists.exclude), _matches(ua))
        excl_rec = F.element_at(matched, 1)
        excl_hit = F.size(matched) > 0
        excl_active = excl_rec.getField("active") & (
            excl_rec.getField("inactive_date").isNull()
            | (ev_date <= F.to_date(excl_rec.getField("inactive_date")))
        )
    else:
        excl_hit, excl_active, excl_rec = F.lit(False), F.lit(False), None

    category = (
        F.when(ip_excluded, F.lit("SPIDER_OR_ROBOT"))
        .when(~included, F.lit("SPIDER_OR_ROBOT"))
        .when(excl_hit & excl_active, F.lit("ACTIVE_SPIDER_OR_ROBOT"))
        .when(excl_hit, F.lit("INACTIVE_SPIDER_OR_ROBOT"))
        .otherwise(F.lit("BROWSER"))
    )
    reason = (
        F.when(ip_excluded, F.lit("FAILED_IP_EXCLUDE"))
        .when(~included, F.lit("FAILED_UA_INCLUDE"))
        .when(excl_hit, F.lit("FAILED_UA_EXCLUDE"))
        .otherwise(F.lit("PASSED_ALL"))
    )
    impact = (
        F.when(ip_excluded | ~included, F.lit("UNKNOWN"))
        .when(excl_hit,
              excl_rec.getField("impact") if excl_rec is not None else F.lit("UNKNOWN"))
        .otherwise(F.lit("NONE"))
    )
    spider = ip_excluded | ~included | excl_hit
    data = F.to_json(F.struct(
        spider.alias("spiderOrRobot"),
        category.alias("category"),
        reason.alias("reason"),
        impact.alias("primaryImpact"),
    ))
    ctx = F.struct(F.lit(IAB_SCHEMA).alias("schema"), data.alias("data"))
    applicable = F.col(ua_col).isNotNull() & ip_num.isNotNull()
    return df.withColumn(
        DERIVED_COL,
        F.when(applicable, F.array_append(F.col(DERIVED_COL), ctx))
        .otherwise(F.col(DERIVED_COL)),
    )
