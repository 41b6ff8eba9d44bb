"""OER / OWM client contracts with fake transports
(CurrencyConversionEnrichment.scala:100-226, WeatherEnrichment.scala:96-204)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from enrich_spark.operators.clients import OerClient, OwmClient, etl_days


def test_etl_days():
    assert etl_days("2024-01-30", "2024-02-02") == [
        "2024-01-30", "2024-01-31", "2024-02-01", "2024-02-02"]


def test_oer_cross_rates_and_table(spark):
    urls = []

    def transport(url):
        urls.append(url)
        return json.dumps({"base": "USD",
                           "rates": {"USD": 1.0, "EUR": 0.5, "GBP": 0.25}})

    client = OerClient(app_id="k", transport=transport)
    rows = client.rates_rows(["2024-01-01"], base="EUR")
    # USD→EUR = 0.5/1.0, GBP→EUR = 0.5/0.25 (USD-pivot cross rate)
    assert sorted(rows) == [("2024-01-01", "GBP", "EUR", 2.0),
                            ("2024-01-01", "USD", "EUR", 0.5)]
    assert urls == ["https://openexchangerates.org/api/historical/2024-01-01.json?app_id=k"]

    table = client.rates_table(spark, ["2024-01-01"], base="EUR")
    got = {(r.from_ccy, str(r.day)): float(r.rate) for r in table.collect()}
    assert got[("GBP", "2024-01-01")] == pytest.approx(2.0)

    # the table drives the existing broadcast currency join end-to-end
    from enrich_spark.config import CurrencyConversionConf
    from enrich_spark.operators.currency import currency_conversion

    ev = spark.createDataFrame(
        [("2024-01-01 10:00:00", "GBP", "10.00")],
        "ts STRING, tr_currency STRING, total_s STRING",
    ).select(
        F.col("ts").cast("timestamp").alias("collector_tstamp"),
        "tr_currency",
        F.col("total_s").cast("decimal(18,2)").alias("tr_total"),
        F.lit(None).cast("decimal(18,2)").alias("tr_tax"),
        F.lit(None).cast("decimal(18,2)").alias("tr_shipping"),
        F.lit(None).cast("string").alias("ti_currency"),
        F.lit(None).cast("decimal(18,2)").alias("ti_price"),
    )
    out = currency_conversion(ev, CurrencyConversionConf(base_currency="EUR"), table).collect()[0]
    assert float(out.tr_total_base) == pytest.approx(20.0)


def test_oer_error_contracts():
    client = OerClient(app_id="bad",
                       transport=lambda u: json.dumps({"message": "invalid_app_id"}))
    with pytest.raises(ValueError, match="no rates"):
        client.rates_rows(["2024-01-01"], base="EUR")
    client2 = OerClient(transport=lambda u: json.dumps({"rates": {"USD": 1.0}}))
    with pytest.raises(ValueError, match="lack base currency"):
        client2.rates_rows(["2024-01-01"], base="EUR")


def test_owm_provider_and_weather_context(spark):
    def transport(url):
        assert "type=hour" in url and "cnt=1" in url
        return json.dumps({"list": [{"main": {"temp": 280.1, "humidity": 70},
                                     "weather": [{"main": "Rain"}], "dt": 1700000000}]})

    provider = OwmClient(app_id="k", transport=transport).provider()
    doc = provider(51.5, -0.1, 1700000000)
    assert doc["main"]["temp"] == 280.1

    from enrich_spark.operators.lookups import WeatherConf, weather_context

    ev = spark.createDataFrame(
        [(51.5, -0.1, "2023-11-14 22:13:20")],
        "geo_latitude FLOAT, geo_longitude FLOAT, ts STRING",
    ).withColumn("derived_tstamp", F.col("ts").cast("timestamp"))
    out = weather_context(ev, WeatherConf(provider=provider)).collect()[0]
    ctx = [c for c in out._derived if "openweathermap" in c.schema][0]
    assert json.loads(ctx.data)["weather"][0]["main"] == "Rain"
