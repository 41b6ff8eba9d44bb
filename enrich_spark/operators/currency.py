"""Currency conversion enrichment — tr_*_base / ti_price_base.

Mirrors SURVEY §2.5 #7 (CurrencyConversionEnrichment.scala:100-226):
convert tr_total/tr_tax/tr_shipping (keyed on tr_currency) and ti_price
(keyed on ti_currency) into the configured base currency using a daily
rate, keyed on the collector_tstamp date.

Spark-first: the reference calls Open Exchange Rates per event with an
LRU cache; the declarative rewrite is a **broadcast equi-join** against a
daily rates table (day, from_ccy, to_ccy, rate) — the canonical
as-of-date lookup. One year × 200 currencies ≈ 73k rows broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import CurrencyConversionConf

_DEMO_RATES = [
    # (day, from_ccy, to_ccy, rate)
    ("2024-01-01", "GBP", "EUR", "1.1536"),
    ("2024-01-01", "USD", "EUR", "0.9052"),
    ("2024-01-01", "JPY", "EUR", "0.0064"),
    ("2011-03-13", "GBP", "EUR", "1.1450"),
]


def demo_rates_table(spark: SparkSession) -> DataFrame:
    df = spark.createDataFrame(_DEMO_RATES, "day_s STRING, from_ccy STRING, to_ccy STRING, rate_s STRING")
    return df.select(
        F.to_date("day_s").alias("day"), "from_ccy", "to_ccy",
        F.col("rate_s").cast("decimal(18,8)").alias("rate"),
    )


def load_rates_table(spark: SparkSession, path: str) -> DataFrame:
    if path.endswith(".csv"):
        return spark.read.option("header", True).option("inferSchema", True).csv(path)
    return spark.read.parquet(path)


def currency_conversion(df: DataFrame, conf: CurrencyConversionConf, rates: DataFrame) -> DataFrame:
    base = conf.base_currency
    day = F.to_date("collector_tstamp")

    tr_rates = rates.select(
        F.col("day").alias("_tr_day"), F.col("from_ccy").alias("_tr_from"),
        F.col("rate").alias("_tr_rate"),
    ).where(F.col("to_ccy") == base)
    ti_rates = rates.select(
        F.col("day").alias("_ti_day"), F.col("from_ccy").alias("_ti_from"),
        F.col("rate").alias("_ti_rate"),
    ).where(F.col("to_ccy") == base)

    out = (
        df.join(
            F.broadcast(tr_rates),
            (day == F.col("_tr_day")) & (F.col("tr_currency") == F.col("_tr_from")),
            "left",
        )
        .join(
            F.broadcast(ti_rates),
            (day == F.col("_ti_day")) & (F.col("ti_currency") == F.col("_ti_from")),
            "left",
        )
    )
    # same-currency transactions convert at 1.0; unknown rate → NULL base
    tr_rate = F.when(F.col("tr_currency") == base, F.lit(1).cast("decimal(18,8)")).otherwise(F.col("_tr_rate"))
    ti_rate = F.when(F.col("ti_currency") == base, F.lit(1).cast("decimal(18,8)")).otherwise(F.col("_ti_rate"))
    conv = lambda c, r: (F.col(c) * r).cast("decimal(18,2)")  # noqa: E731
    return out.withColumns({
        "tr_total_base": conv("tr_total", tr_rate),
        "tr_tax_base": conv("tr_tax", tr_rate),
        "tr_shipping_base": conv("tr_shipping", tr_rate),
        "ti_price_base": conv("ti_price", ti_rate),
        "base_currency": F.when(
            F.col("tr_currency").isNotNull() | F.col("ti_currency").isNotNull(), F.lit(base)
        ),
    }).drop("_tr_day", "_tr_from", "_tr_rate", "_ti_day", "_ti_from", "_ti_rate")
