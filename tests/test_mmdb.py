"""mmdb codec + converter + Spark join tests (functions/mmdb.py,
operators/geo.py mmdb paths, tools/mmdb_to_range_table.py)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from enrich_spark.functions.mmdb import (
    RangeIndex, Reader, asn_columns, build_mmdb, geo_columns,
    merge_range_rows, mmdb_to_rows,
)
from enrich_spark.operators.geo import (
    demo_geo_table, demo_mmdb_bytes, ip_lookups_mmdb, mmdb_range_table,
)
from tests.conftest import rows_of


def _ip2l(s):
    a, b, c, d = (int(x) for x in s.split("."))
    return a * 16777216 + b * 65536 + c * 256 + d


def test_roundtrip_lookup():
    blob = build_mmdb([
        (_ip2l("10.0.0.0"), _ip2l("10.0.0.255"),
         {"country": {"iso_code": "AA"}, "location": {"latitude": 1.5}}),
        (_ip2l("10.0.1.0"), _ip2l("10.0.3.255"),
         {"country": {"iso_code": "BB"}, "traits": {"isp": "isp-b"}}),
    ])
    r = Reader(blob)
    assert r.lookup("10.0.0.7")["country"]["iso_code"] == "AA"
    assert r.lookup("10.0.2.1")["traits"]["isp"] == "isp-b"
    assert r.lookup("10.0.4.0") is None
    assert r.lookup("not-an-ip") is None
    cols = geo_columns(r.lookup("10.0.0.7"))
    assert cols["geo_country"] == "AA" and cols["geo_latitude"] == 1.5


def test_iter_ranges_merges_adjacent_blocks():
    # [16..47] is not a power-of-two block → splits into /28+/27 CIDRs,
    # iter_ranges must merge them back into one interval
    blob = build_mmdb([(16, 47, {"country": {"iso_code": "XX"}})])
    ranges = list(Reader(blob).iter_ranges())
    assert [(s, e) for s, e, _ in ranges] == [(16, 47)]


def test_demo_mmdb_matches_demo_table(spark):
    rows = mmdb_to_rows(Reader(demo_mmdb_bytes()))
    expected = {
        (r["ip_start"], r["ip_end"]): r
        for r in (row.asDict() for row in demo_geo_table(spark).collect())
    }
    assert len(rows) == len(expected)
    for got in rows:
        exp = expected[(got["ip_start"], got["ip_end"])]
        for c in ("geo_country", "geo_city", "geo_zipcode", "geo_timezone",
                  "ip_isp", "ip_organization", "ip_domain", "ip_netspeed"):
            assert got[c] == exp[c], c
        if exp["geo_latitude"] is not None:
            assert got["geo_latitude"] == pytest.approx(exp["geo_latitude"], rel=1e-6)


def test_merge_range_rows_unions_columns():
    city = [{"ip_start": 0, "ip_end": 99, "geo_country": "GB", "ip_isp": None}]
    isp = [{"ip_start": 50, "ip_end": 149, "ip_isp": "isp-x"}]
    merged = merge_range_rows([city, isp])
    idx = RangeIndex(merged)
    assert idx.lookup(10) == {"ip_start": 0, "ip_end": 49, "geo_country": "GB", "ip_isp": None}
    both = idx.lookup(70)
    assert both["geo_country"] == "GB" and both["ip_isp"] == "isp-x"
    only_isp = idx.lookup(120)
    assert only_isp["ip_isp"] == "isp-x" and "geo_country" not in only_isp
    assert idx.lookup(200) is None


def test_ip_lookups_mmdb_mapinpandas(spark, tmp_path):
    path = str(tmp_path / "demo.mmdb")
    with open(path, "wb") as f:
        f.write(demo_mmdb_bytes())
    df = spark.createDataFrame(
        [("81.2.69.200",), ("216.160.83.60",), ("8.8.8.8",), (None,)],
        "user_ipaddress STRING",
    )
    out = rows_of(ip_lookups_mmdb(df, path),
                  "user_ipaddress", "geo_city", "ip_isp", "geo_latitude")
    by_ip = {r[0]: r for r in out}
    assert by_ip["81.2.69.200"][1:3] == ("London", "Andrews & Arnold Ltd")
    assert by_ip["216.160.83.60"][1] == "Milton"
    assert by_ip["8.8.8.8"][1] is None
    assert by_ip[None][1] is None
    assert by_ip["81.2.69.200"][3] == pytest.approx(51.5142, rel=1e-6)


def test_mmdb_range_table_join_equals_point_lookup(spark, tmp_path):
    path = str(tmp_path / "demo.mmdb")
    with open(path, "wb") as f:
        f.write(demo_mmdb_bytes())
    table = mmdb_range_table(spark, city=path)
    from enrich_spark.operators.geo import ip_lookups

    ips = [(f"81.2.69.{i}",) for i in range(0, 256, 37)] + [
        ("216.160.83.56",), ("89.160.20.112",), ("10.1.2.3",), ("1.1.1.1",)]
    df = spark.createDataFrame(ips, "user_ipaddress STRING")
    via_join = rows_of(ip_lookups(df, table), "user_ipaddress", "geo_city", "ip_netspeed")
    via_point = rows_of(ip_lookups_mmdb(df, path), "user_ipaddress", "geo_city", "ip_netspeed")
    assert via_join == via_point


def test_converter_cli(tmp_path):
    src = str(tmp_path / "demo.mmdb")
    with open(src, "wb") as f:
        f.write(demo_mmdb_bytes())
    out = str(tmp_path / "ranges.parquet")
    from tools.mmdb_to_range_table import main

    assert main(["--city", src, "--out", out]) == 0
    import pyarrow.parquet as pq

    table = pq.read_table(out)
    assert table.num_rows == 5
    assert "geo_country" in table.column_names


_REF_DIR = ("/root/reference/modules/common/src/test/resources/com/"
            "snowplowanalytics/snowplow/enrich/common/enrichments/registry")


@pytest.mark.skipif(not os.path.isdir(_REF_DIR),
                    reason="reference MaxMind test DBs not present")
def test_reference_maxmind_test_dbs_decode():
    """Behavioral check against the public MaxMind test databases the
    reference's specs use (IpLookupsEnrichmentSpec.scala expectations)."""
    city = Reader.open(f"{_REF_DIR}/GeoIP2-City-Test.mmdb")
    got = geo_columns(city.lookup("175.16.199.5"))
    assert got["geo_country"] == "CN" and got["geo_city"] == "Changchun"
    assert got["geo_timezone"] == "Asia/Harbin"
    got = geo_columns(city.lookup("216.160.83.56"))
    assert got["geo_region"] == "WA" and got["geo_city"] == "Milton"
    asn = Reader.open(f"{_REF_DIR}/GeoLite2-ASN-Test.mmdb")
    a = asn_columns(asn.lookup("12.81.92.1"))
    assert a["asn"] == 7018 and "AT&T" in a["asn_org"]
    # converter over the real test DB: point lookups through the produced
    # range table must agree with direct tree lookups
    rows = mmdb_to_rows(city)
    idx = RangeIndex(rows)
    for ip in ("175.16.199.5", "216.160.83.56", "81.2.69.142", "8.8.8.8"):
        direct = geo_columns(city.lookup(ip))
        via_rows = idx.lookup(_ip2l(ip))
        if via_rows is None:
            assert direct["geo_country"] is None
        else:
            assert via_rows["geo_country"] == direct["geo_country"]
            assert via_rows["geo_city"] == direct["geo_city"]
