"""ASN range tables for the asn_lookups enrichment (SURVEY §2.5 #19).

Same interval-table shape as the geo table: (ip_start, ip_end, asn,
asn_org) with the /16-bucket broadcast join strategy (see
operators/geo.py docstring for the scale rationale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .geo import ip_to_long

_DEMO_ASNS = [
    # start, end, asn, org — aligned with the geo demo ranges
    ("81.2.69.0", "81.2.69.255", 20712, "Andrews & Arnold Ltd"),
    ("216.160.83.56", "216.160.83.63", 209, "CenturyLink Communications"),
    ("89.160.20.112", "89.160.20.127", 29518, "Bredband2 AB"),
    # a "datacenter" range for likelyBot testing
    ("52.0.0.0", "52.0.255.255", 16509, "Amazon.com, Inc."),
]


def demo_asn_table(spark: SparkSession) -> DataFrame:
    df = spark.createDataFrame(
        _DEMO_ASNS, "ip_start_s STRING, ip_end_s STRING, asn INT, asn_org STRING"
    )
    return df.select(
        ip_to_long(F.col("ip_start_s")).alias("ip_start"),
        ip_to_long(F.col("ip_end_s")).alias("ip_end"),
        "asn", "asn_org",
    )


def load_asn_table(spark: SparkSession, path: str) -> DataFrame:
    if path.endswith(".csv"):
        return spark.read.option("header", True).option("inferSchema", True).csv(path)
    return spark.read.parquet(path)
