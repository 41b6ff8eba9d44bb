"""Thrift loader specs — mirrors common-test loaders/ThriftLoaderSpec.scala:
encode a CollectorPayload, load it, assert the payload columns; malformed
bytes yield a CPFormatViolation-style loader_error (never an exception).
"""

from __future__ import annotations

import datetime

from enrich_spark.loaders.thrift import (
    SCHEMA_URI,
    decode_payload,
    encode_payload,
    load_thrift,
)


def _payload_df(spark, *blobs):
    return spark.createDataFrame([(b,) for b in blobs], "value BINARY")


BASE = dict(
    path="/com.snowplowanalytics.snowplow/tp2",
    querystring="e=pv&page=Home",
    ip_address="255.255.255.255",
    timestamp=1420070400000,
    encoding="UTF-8",
    collector="ssc-2.1.0",
    useragent="Mozilla/5.0",
    hostname="collector.example.com",
    network_user_id="8712a379-4bcb-46ee-815d-85f26540577f",
    headers=["Accept: */*", "X-Forwarded-For: 1.2.3.4, 9.9.9.9"],
)


def test_roundtrip_codec():
    blob = encode_payload(BASE)
    back = decode_payload(blob)
    assert back["path"] == BASE["path"]
    assert back["querystring"] == BASE["querystring"]
    assert back["timestamp"] == BASE["timestamp"]
    assert back["headers"] == BASE["headers"]
    assert back["schema_uri"] == SCHEMA_URI


def test_load_good_payload(spark):
    df = load_thrift(_payload_df(spark, encode_payload(BASE)))
    r = df.collect()[0]
    assert r.loader_error is None
    assert (r.api_vendor, r.api_version) == ("com.snowplowanalytics.snowplow", "tp2")
    assert [(p.name, p.value) for p in r.querystring] == [("e", "pv"), ("page", "Home")]
    assert r.collector_tstamp == datetime.datetime(2015, 1, 1, 0, 0)
    # XFF wins over the collector ip (IpAddressExtractor)
    assert r.ip_address == "1.2.3.4"
    assert r.network_user_id == "8712a379-4bcb-46ee-815d-85f26540577f"
    assert r.collector_name == "ssc-2.1.0"


def test_legacy_ice_path_routes_tp1(spark):
    blob = encode_payload({**BASE, "path": "/i"})
    r = load_thrift(_payload_df(spark, blob)).collect()[0]
    assert (r.api_vendor, r.api_version) == ("com.snowplowanalytics.snowplow", "tp1")


def test_invalid_nuid_dropped(spark):
    blob = encode_payload({**BASE, "network_user_id": "not-a-uuid"})
    r = load_thrift(_payload_df(spark, blob)).collect()[0]
    assert r.network_user_id is None and r.loader_error is None


def test_bad_path_is_error(spark):
    blob = encode_payload({**BASE, "path": "/too/many/segments/here"})
    r = load_thrift(_payload_df(spark, blob)).collect()[0]
    assert r.loader_error is not None and "vendor/version" in r.loader_error


def test_garbage_bytes_error_not_throw(spark):
    rows = load_thrift(_payload_df(spark, b"\xff\xfe\x00garbage", None)).collect()
    assert all(r.loader_error is not None for r in rows)


def test_wrong_schema_uri_rejected(spark):
    blob = encode_payload({**BASE, "schema_uri": "iglu:com.acme/Other/thrift/1-0-0"})
    r = load_thrift(_payload_df(spark, blob)).collect()[0]
    assert r.loader_error is not None


def test_out_of_range_timestamp_is_loader_error(spark):
    # a decodable payload whose timestamp lies outside pandas
    # datetime64[ns] must produce a CPFormatViolation-style loader_error
    # through the default Arrow-batched path, never a failed task
    hostile = dict(BASE, timestamp=99_999_999_999_999_999)
    df = load_thrift(_payload_df(spark, encode_payload(hostile)))
    r = df.collect()[0]
    assert r.loader_error is not None
    assert "out of range" in r.loader_error
    assert r.collector_tstamp is None
