"""Adapter specs — payload → RawEvent goldens, mirroring the reference's
per-adapter specs (common-test adapters/registry/*Spec.scala).
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from enrich_spark.adapters import vendors
from enrich_spark.adapters.registry import adapt

PAYLOAD_COLS = (
    "api_vendor STRING, api_version STRING, "
    "querystring ARRAY<STRUCT<name:STRING,value:STRING>>, "
    "content_type STRING, body STRING"
)


def _adapt_one(spark, vendor, version, qs=None, content_type=None, body=None):
    df = spark.createDataFrame(
        [(vendor, version, qs, content_type, body)], PAYLOAD_COLS
    )
    return adapt(df).select("parameters", "_adapter_error").collect()


def test_tp1_querystring_single_event(spark):
    rows = _adapt_one(
        spark, "com.snowplowanalytics.snowplow", "tp1",
        qs=[("e", "pv"), ("page", "Home")],
    )
    assert len(rows) == 1 and rows[0]._adapter_error is None
    assert rows[0].parameters == {"e": "pv", "page": "Home"}


def test_tp1_empty_qs_is_error(spark):
    rows = _adapt_one(spark, "com.snowplowanalytics.snowplow", "tp1", qs=[])
    assert len(rows) == 1 and rows[0]._adapter_error is not None


def test_tp2_body_explodes_batch(spark):
    body = json.dumps({
        "schema": "iglu:com.snowplowanalytics.snowplow/payload_data/jsonschema/1-0-4",
        "data": [{"e": "pv", "page": "A"}, {"e": "pp", "page": "B"}],
    })
    rows = _adapt_one(
        spark, "com.snowplowanalytics.snowplow", "tp2",
        content_type="application/json", body=body,
    )
    assert [r.parameters["e"] for r in rows] == ["pv", "pp"]


def test_tp2_qs_wins_merge(spark):
    # Tp2Adapter.scala:135-188 — querystring params override body params
    body = json.dumps({
        "schema": "iglu:com.snowplowanalytics.snowplow/payload_data/jsonschema/1-0-4",
        "data": [{"e": "pv", "aid": "from-body"}],
    })
    rows = _adapt_one(
        spark, "com.snowplowanalytics.snowplow", "tp2",
        qs=[("aid", "from-qs")], content_type="application/json", body=body,
    )
    assert rows[0].parameters["aid"] == "from-qs"


def test_tp2_bad_body_schema_is_error(spark):
    body = json.dumps({"schema": "iglu:com.acme/other/jsonschema/1-0-0", "data": []})
    rows = _adapt_one(
        spark, "com.snowplowanalytics.snowplow", "tp2",
        content_type="application/json", body=body,
    )
    assert rows[0]._adapter_error is not None


def test_redirect_synthesizes_uri_redirect(spark):
    rows = _adapt_one(spark, "r", "tp2", qs=[("u", "https://target.example.com/x")])
    p = rows[0].parameters
    assert p["e"] == "ue"
    ue = json.loads(p["ue_pr"])
    assert ue["data"]["schema"].startswith("iglu:com.snowplowanalytics.snowplow/uri_redirect/")
    assert ue["data"]["data"]["uri"] == "https://target.example.com/x"


def test_redirect_missing_u_is_error(spark):
    rows = _adapt_one(spark, "r", "tp2", qs=[("e", "pv")])
    assert rows[0]._adapter_error is not None


def test_iglu_get_wraps_schema_param(spark):
    rows = _adapt_one(
        spark, "com.snowplowanalytics.iglu", "v1",
        qs=[("schema", "iglu:com.acme/form/jsonschema/1-0-0"), ("name", "bob"), ("aid", "app9")],
    )
    p = rows[0].parameters
    ue = json.loads(p["ue_pr"])
    assert ue["data"]["schema"] == "iglu:com.acme/form/jsonschema/1-0-0"
    assert ue["data"]["data"]["name"] == "bob"
    assert p["aid"] == "app9"  # passthrough param kept


def test_unknown_vendor_is_error(spark):
    rows = _adapt_one(spark, "com.nonexistent", "v9", qs=[("a", "b")])
    assert rows[0]._adapter_error is not None
    assert "Adapter not found" in rows[0]._adapter_error


def test_error_rows_survive_explode(spark):
    # one bad + one good payload → 2 output rows, error preserved
    df = spark.createDataFrame(
        [
            ("com.snowplowanalytics.snowplow", "tp1", [("e", "pv")], None, None),
            ("com.nonexistent", "v1", [("x", "y")], None, None),
        ],
        PAYLOAD_COLS,
    )
    out = adapt(df).select("parameters", "_adapter_error").collect()
    assert len(out) == 2
    assert sum(1 for r in out if r._adapter_error is None) == 1


# ---- webhook vendor translators (pure-python golden checks) ----------------


def test_mailchimp_undots_keys():
    body = "type=subscribe&data%5Bemail%5D=a%40b.com&data%5Bmerges%5D%5BFNAME%5D=Ada"
    events = vendors.mailchimp({}, "application/x-www-form-urlencoded", body)
    assert len(events) == 1
    ue = json.loads(events[0]["ue_pr"])
    assert ue["data"]["data"]["data"]["email"] == "a@b.com"
    assert ue["data"]["data"]["data"]["merges"]["FNAME"] == "Ada"


def test_sendgrid_dedupes_consecutive_identical():
    ev = {"email": "a@b.com", "event": "processed", "sg_event_id": "x1"}
    body = json.dumps([ev, ev, {"email": "c@d.com", "event": "open", "sg_event_id": "x2"}])
    events = vendors.sendgrid({}, "application/json", body)
    assert len(events) == 2


def test_pingdom_strips_python_repr():
    msg = '{"check": "(u\'test\', u\'up\')", "action": "assign"}'
    events = vendors.pingdom({"message": msg}, None, None)
    assert len(events) == 1


def test_cloudfront_arity_schema():
    line = "\t".join([
        "2014-06-01", "18:04:12", "LHR5", "3402", "1.2.3.4", "GET",
        "d3gs014xn8p70.cloudfront.net", "/ice.png", "200",
        "http://example.com/", "Mozilla/5.0", "e=pv",
    ])
    events = vendors.cloudfront({}, None, line)
    ue = json.loads(events[0]["ue_pr"])
    assert "wd_access_log" in ue["data"]["schema"]


def test_googleanalytics_pageview():
    events = vendors.googleanalytics({}, None, "t=pageview&dh=host&dp=/path")
    assert len(events) == 1
    ue = json.loads(events[0]["ue_pr"])
    assert "page_view" in ue["data"]["schema"]


def test_mandrill_event_array():
    body = "mandrill_events=" + json.dumps([
        {"event": "send", "msg": {"email": "a@b.com"}},
        {"event": "open", "msg": {"email": "a@b.com"}},
    ]).replace(" ", "")
    events = vendors.mandrill({}, "application/x-www-form-urlencoded", body)
    assert len(events) == 2
