"""Transform-map specs — raw parameters → atomic columns with error
accumulation (mirrors common/enrichments/Transform.scala:94-223 semantics
and the TransformSpec-style golden expectations).
"""

from __future__ import annotations

import datetime
from decimal import Decimal

from pyspark.sql import functions as F

from enrich_spark.plans.pipeline import enrich_raw
from enrich_spark.config import EnrichmentsConfig
from enrich_spark.plans.transform import transform_params

RAW_COLS = "parameters MAP<STRING,STRING>, collector_tstamp TIMESTAMP"


def _transform_one(spark, params: dict, **extra_cols):
    df = spark.createDataFrame(
        [(params, datetime.datetime(2024, 1, 1, 12, 0, 0))], RAW_COLS
    )
    for name, value in extra_cols.items():
        df = df.withColumn(name, F.lit(value))
    for name, typ in [
        ("ip_address", "string"), ("useragent", "string"),
        ("network_user_id", "string"), ("collector_name", "string"),
        ("headers", "array<string>"), ("referer_uri", "string"),
    ]:
        if name not in df.columns:
            df = df.withColumn(name, F.lit(None).cast(typ))
    return transform_params(df).collect()[0]


def test_full_param_map(spark):
    r = _transform_one(spark, {
        "e": "tr", "p": "web", "aid": "shop", "tid": "42", "uid": "u1",
        "duid": "d-1", "vid": "3", "sid": "9436C1FE-0EA6-4A44-9D50-9A0C0D85E265",
        "dtm": "1700000000000", "stm": "1700000000500",
        "tna": "cf", "tv": "js-3.0.0", "lang": "en-GB", "cd": "24",
        "tz": "Europe/London", "url": "https://x.com/a", "page": "Title",
        "refr": "https://ref.com/", "cs": "UTF-8",
        "tr_id": "order-1", "tr_tt": "19.99", "tr_cu": "GBP",
        "res": "1920x1080", "vp": "1280x720", "ds": "1920x2000",
        "cookie": "1", "f_pdf": "0",
        "eid": "F84A6AB5-1234-5678-9ABC-DEF012345678",
    })
    assert r.event == "transaction"
    assert r.platform == "web"
    assert r.app_id == "shop"
    assert r.txn_id == 42
    assert r.user_id == "u1"
    assert r.domain_userid == "d-1"
    assert r.domain_sessionidx == 3
    assert r.domain_sessionid == "9436c1fe-0ea6-4a44-9d50-9a0c0d85e265"
    assert r.dvce_created_tstamp == datetime.datetime(2023, 11, 14, 22, 13, 20)
    assert r.dvce_sent_tstamp == datetime.datetime(2023, 11, 14, 22, 13, 20, 500000)
    assert r.name_tracker == "cf"
    assert r.v_tracker == "js-3.0.0"
    assert r.br_lang == "en-GB"
    assert r.br_colordepth == "24"
    assert r.os_timezone == "Europe/London"
    assert r.page_url == "https://x.com/a"
    assert r.page_title == "Title"
    assert r.page_referrer == "https://ref.com/"
    assert r.doc_charset == "UTF-8"
    assert r.tr_orderid == "order-1"
    assert r.tr_total == Decimal("19.99")
    assert r.tr_currency == "GBP"
    assert (r.dvce_screenwidth, r.dvce_screenheight) == (1920, 1080)
    assert (r.br_viewwidth, r.br_viewheight) == (1280, 720)
    assert (r.doc_width, r.doc_height) == (1920, 2000)
    assert r.br_cookies == 1
    assert r.br_features_pdf == 0
    assert r.event_id == "f84a6ab5-1234-5678-9abc-def012345678"
    assert r._errors == []


def test_error_accumulation(spark):
    r = _transform_one(spark, {"e": "pv", "tid": "junk", "p": "desktop", "vid": "x"})
    fields = sorted(e.split("\t")[0] for e in r._errors)
    assert fields == ["p", "tid", "vid"]
    assert r.event == "page_view"  # good fields still set


def test_tnuid_wins_over_nuid(spark):
    r = _transform_one(
        spark,
        {"e": "pv", "tnuid": "t-override", "nuid": "n-param"},
        network_user_id="payload-nuid",
    )
    assert r.network_userid == "t-override"


def test_nuid_falls_back_to_payload(spark):
    r = _transform_one(spark, {"e": "pv"}, network_user_id="payload-nuid")
    assert r.network_userid == "payload-nuid"


def test_se_wins_over_legacy_ev(spark):
    r = _transform_one(spark, {"e": "se", "se_ca": "new", "ev_ac": "legacy-action"})
    assert r.se_category == "new"
    assert r.se_action == "legacy-action"


def test_eid_generated_when_absent(spark):
    import re

    r = _transform_one(spark, {"e": "pv"})
    assert re.match(r"^[0-9a-f-]{36}$", r.event_id)


def test_ip_param_overrides_collector_ip(spark):
    r = _transform_one(spark, {"e": "pv", "ip": "10.0.0.1, 9.9.9.9"}, ip_address="5.5.5.5")
    assert r.user_ipaddress == "10.0.0.1"


def test_good_bad_split(spark):
    df = spark.createDataFrame(
        [
            ({"e": "pv", "p": "web"}, datetime.datetime(2024, 1, 1)),
            ({"e": "bogus"}, datetime.datetime(2024, 1, 1)),
        ],
        RAW_COLS,
    )
    res = enrich_raw(df, EnrichmentsConfig.default(), spark)
    assert res.good.count() == 1
    assert res.bad.count() == 1
