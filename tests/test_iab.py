"""IAB Spiders & Robots file-based enrichment (registry/IabEnrichment.scala:100-199)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from enrich_spark.operators.iab import (
    IabLists,
    UaRecord,
    iab_context,
    load_lists,
    parse_ip_file,
    parse_ua_file,
)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "useragent STRING, user_ipaddress STRING, derived_tstamp TIMESTAMP"
    )


def _ctx(row):
    iab = [c for c in row._derived if "spiders_and_robots" in c.schema]
    return json.loads(iab[0].data) if iab else None


def test_parse_files(tmp_path):
    ip = tmp_path / "ip.txt"
    ip.write_text("# comment\n\n10.0.0.0/8\n192.168.151.21/32\n")
    assert parse_ip_file(ip) == [
        (0x0A000000, 0x0AFFFFFF), (0xC0A89715, 0xC0A89715)]
    ua = tmp_path / "ua.txt"
    ua.write_text("SpiderX|1|good spiderx,nice|1|2030-01-01|A\nplain\n")
    recs = parse_ua_file(ua)
    assert recs[0] == UaRecord("spiderx", True, ("good spiderx", "nice"),
                               True, "2030-01-01", "AD_IMPRESSIONS")
    assert recs[1] == UaRecord("plain", True, (), False, None, "UNKNOWN")


def test_decision_order_and_exceptions(spark):
    import datetime

    ts = datetime.datetime(2024, 6, 1)
    lists = IabLists(
        ip_ranges=[(0x0A000000, 0x0AFFFFFF)],  # 10.0.0.0/8
        include=[UaRecord("mozilla")],
        exclude=[UaRecord("spiderx", exceptions=("friendly spiderx",),
                          inactive_date="2030-01-01", impact="AD_IMPRESSIONS"),
                 UaRecord("oldbot", inactive_date="2020-01-01",
                          impact="PAGE_IMPRESSIONS")],
    )
    rows = iab_context(_events(spark, [
        ("Mozilla/5.0", "10.1.2.3", ts),            # ip exclude wins
        ("Mozilla spiderx", "8.8.8.8", ts),         # active exclude
        ("Mozilla friendly spiderx", "8.8.8.8", ts),  # exception veto → browser
        ("Mozilla oldbot", "8.8.8.8", ts),          # inactive (2020 < 2024)
        ("weirdagent", "8.8.8.8", ts),              # include miss
        (None, "8.8.8.8", ts),                      # no UA → no context
        ("Mozilla/5.0", "not-an-ip", ts),           # bad IP → no context
    ]), lists).collect()
    got = [_ctx(r) for r in rows]
    assert got[0] == {"spiderOrRobot": True, "category": "SPIDER_OR_ROBOT",
                      "reason": "FAILED_IP_EXCLUDE", "primaryImpact": "UNKNOWN"}
    assert got[1] == {"spiderOrRobot": True, "category": "ACTIVE_SPIDER_OR_ROBOT",
                      "reason": "FAILED_UA_EXCLUDE", "primaryImpact": "AD_IMPRESSIONS"}
    assert got[2]["reason"] == "PASSED_ALL" and got[2]["spiderOrRobot"] is False
    assert got[3] == {"spiderOrRobot": True, "category": "INACTIVE_SPIDER_OR_ROBOT",
                      "reason": "FAILED_UA_EXCLUDE", "primaryImpact": "PAGE_IMPRESSIONS"}
    assert got[4]["reason"] == "FAILED_UA_INCLUDE"
    assert got[5] is None and got[6] is None


def test_config_extras_and_empty_include(spark, tmp_path):
    """excludeUseragents/includeUseragents literal extras; an absent
    include file means every UA passes the include check."""
    import datetime

    ts = datetime.datetime(2024, 1, 1)
    lists = load_lists(exclude_useragents=["badbot"])
    out = iab_context(_events(spark, [
        ("some badbot thing", "8.8.8.8", ts),
        ("anything else", "8.8.8.8", ts),
    ]), lists).collect()
    assert _ctx(out[0])["reason"] == "FAILED_UA_EXCLUDE"
    assert _ctx(out[1])["reason"] == "PASSED_ALL"


def test_parse_ip_file_skips_ipv6_with_warning(tmp_path):
    import warnings

    from enrich_spark.operators.iab import parse_ip_file

    p = tmp_path / "ip.txt"
    p.write_text("10.0.0.0/8\n2001:db8::/32\n")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        ranges = parse_ip_file(p)
    # IPv4 entry kept, IPv6 skipped loudly — one bad vendor line must
    # not take the pipeline down at plan-build time
    assert ranges == [(int.from_bytes(bytes([10, 0, 0, 0])), int.from_bytes(bytes([10, 255, 255, 255])))]
    assert any("IPv4-only" in str(w.message) for w in caught)
