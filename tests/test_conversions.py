"""Golden tests for tracker-protocol converters.

Mirrors the reference's conversion specs (common-test utils specs,
ConversionUtilsSpec / ClientEnrichmentsSpec / eventEnrichmentSpecs) —
the expected values below are the reference's documented semantics:
ConversionUtils.scala:106-360, ClientEnrichments.scala:40-49,
EventEnrichments.scala:114-133.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from enrich_spark.functions import conversions as C


def _one(spark, pair_or_col, value):
    df = spark.createDataFrame([(value,)], "v STRING")
    if isinstance(pair_or_col, tuple):
        val, err = pair_or_col
        return df.select(val.alias("v2"), err.alias("e")).collect()[0]
    return df.select(pair_or_col.alias("v2")).collect()[0]


def test_make_tsv_safe(spark):
    cases = [
        ("plain", "plain"),
        ("tab\there", "tab    here"),
        ("new\nline", "newline"),
        ("", None),  # empty → NULL
        (None, None),
    ]
    df = spark.createDataFrame([(v,) for v, _ in cases], "v STRING")
    got = [r.o for r in df.select(C.make_tsv_safe(F.col("v")).alias("o")).collect()]
    assert got == [e for _, e in cases]


def test_to_int_golden(spark):
    # stringToJInteger2: valid ints pass, 'null' literal → NULL no error,
    # junk and overflow → ParseError
    for raw, want_val, want_err in [
        ("23", 23, False),
        ("-2", -2, False),
        ("null", None, False),
        ("NULL", None, False),
        ("abc", None, True),
        ("1.5", None, True),
        ("2147483648", None, True),  # > Int.MaxValue
        (None, None, False),
    ]:
        r = _one(spark, C.to_int(F.col("v"), "tid"), raw)
        assert r.v2 == want_val, raw
        assert (r.e is not None) == want_err, raw


def test_to_decimal_golden(spark):
    from decimal import Decimal

    for raw, want_val, want_err in [
        ("19.99", Decimal("19.99"), False),
        ("-0.5", Decimal("-0.50"), False),
        ("1e2", Decimal("100.00"), False),
        ("null", None, False),
        ("19.99$", None, True),
        ("£19.99", None, True),
        (None, None, False),
    ]:
        r = _one(spark, C.to_decimal(F.col("v"), "tr_tt"), raw)
        assert r.v2 == want_val, raw
        assert (r.e is not None) == want_err, raw


def test_boolean_like_byte(spark):
    for raw, want_val, want_err in [
        ("1", 1, False), ("0", 0, False), ("true", None, True), (None, None, False),
    ]:
        r = _one(spark, C.to_boolean_like_byte(F.col("v"), "f_pdf"), raw)
        assert r.v2 == want_val and (r.e is not None) == want_err, raw


def test_validate_uuid(spark):
    ok = "F84A6AB5-1234-5678-9ABC-DEF012345678"
    r = _one(spark, C.validate_uuid(F.col("v"), "eid"), ok)
    assert r.v2 == ok.lower() and r.e is None
    r = _one(spark, C.validate_uuid(F.col("v"), "eid"), "not-a-uuid")
    assert r.v2 is None and r.e is not None


def test_extract_event_type(spark):
    # EventEnrichments.extractEventType:148
    table = {
        "se": "struct", "ev": "struct", "ue": "unstruct", "ad": "ad_impression",
        "tr": "transaction", "ti": "transaction_item", "pv": "page_view",
        "pp": "page_ping",
    }
    for code, name in table.items():
        r = _one(spark, C.extract_event_type(F.col("v")), code)
        assert r.v2 == name and r.e is None
    r = _one(spark, C.extract_event_type(F.col("v")), "zz")
    assert r.v2 is None and r.e is not None


def test_extract_platform(spark):
    for p in ["web", "iot", "app", "mob", "pc", "cnsl", "tv", "srv", "headset"]:
        r = _one(spark, C.extract_platform(F.col("v")), p)
        assert r.v2 == p and r.e is None
    r = _one(spark, C.extract_platform(F.col("v")), "desktop")
    assert r.v2 is None and r.e is not None


def test_extract_ip_xff(spark):
    # MiscEnrichments.extractIp — first of comma-separated list
    r = _one(spark, C.extract_ip(F.col("v")), "1.2.3.4, 5.6.7.8")
    assert r.v2 == "1.2.3.4"
    r = _one(spark, C.extract_ip(F.col("v")), "9.10.11.12")
    assert r.v2 == "9.10.11.12"


def test_extract_timestamp(spark):
    import datetime

    r = _one(spark, C.extract_timestamp(F.col("v"), "dtm"), "1700000000000")
    assert r.v2 == datetime.datetime(2023, 11, 14, 22, 13, 20) and r.e is None
    # non-numeric → format error
    r = _one(spark, C.extract_timestamp(F.col("v"), "dtm"), "2023-11-14")
    assert r.v2 is None and "expected format" in r.e
    # year > 9999 → Redshift-compat error (EventEnrichments.scala:52-59)
    r = _one(spark, C.extract_timestamp(F.col("v"), "dtm"), "999999999999999")
    assert r.v2 is None and "Redshift" in r.e


def test_view_dimensions(spark):
    (w, h), err = C.extract_view_dimensions(F.col("v"), "res")
    df = spark.createDataFrame([("1920x1080",), ("bogus",), (None,)], "v STRING")
    got = df.select(w.alias("w"), h.alias("h"), err.alias("e")).collect()
    assert (got[0].w, got[0].h, got[0].e) == (1920, 1080, None)
    assert got[1].w is None and got[1].e is not None
    assert got[2].w is None and got[2].e is None


def test_decode_base64_url(spark):
    import base64

    payload = '{"schema":"iglu:com.acme/a/jsonschema/1-0-0","data":{}}'
    enc = base64.urlsafe_b64encode(payload.encode()).decode()
    r = _one(spark, C.decode_base64_url(F.col("v"), "ue_px"), enc)
    assert r.v2 == payload and r.e is None


def test_format_timestamp(spark):
    df = spark.createDataFrame(
        [("2023-11-14 22:13:20.123",)], "v STRING"
    ).select(F.col("v").cast("timestamp").alias("t"))
    got = df.select(C.format_timestamp(F.col("t")).alias("o")).collect()[0].o
    assert got == "2023-11-14 22:13:20.123"
