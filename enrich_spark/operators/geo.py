"""IP lookups enrichment — geo/ISP columns from a range table.

Mirrors SURVEY §2.5 #18 (IpLookupsEnrichment.scala:131-151): MaxMind-style
IP → geo_country/region/city/zipcode/lat/long/region_name/timezone +
ip_isp/organization/domain/netspeed.

Spark-first design for 100 TB
-----------------------------
A geo database is an interval table (ip_start, ip_end] → attributes. A
naive theta-join (`ip BETWEEN start AND end`) forces a
BroadcastNestedLoopJoin — O(rows × ranges) comparisons. Instead we:

1. convert IPv4 to a uint32 (`ip_long`) natively,
2. pre-EXPLODE each range across the /16 buckets it spans
   (driver-side, the DB is small and static),
3. **broadcast equi-join on the /16 bucket id** (~65k distinct keys →
   perfectly distributed broadcast hash join, map-side only),
4. post-filter `ip_long BETWEEN ip_start AND ip_end` (at most a handful
   of candidate ranges per bucket).

This keeps the probe side O(1) per row with zero shuffle of the event
stream, and scales linearly with executors. The same table can be built
from a MaxMind CSV export; a `maxminddb`-backed mapInPandas reader is
gated behind an import-try for environments that ship the lib.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GEO_COLS = [
    "geo_country", "geo_region", "geo_city", "geo_zipcode", "geo_latitude",
    "geo_longitude", "geo_region_name", "geo_timezone",
    "ip_isp", "ip_organization", "ip_domain", "ip_netspeed",
]

_DEMO_RANGES = [
    # (cidr_start_ip, cidr_end_ip, country, region, city, zip, lat, lon, region_name, tz, isp, org, domain, netspeed)
    ("81.2.69.0", "81.2.69.255", "GB", "ENG", "London", "EC1N", 51.5142, -0.0931,
     "England", "Europe/London", "Andrews & Arnold Ltd", "STONEHOUSE office network", "aaisp.net.uk", "broadband"),
    ("216.160.83.56", "216.160.83.63", "US", "WA", "Milton", "98354", 47.2513, -122.3149,
     "Washington", "America/Los_Angeles", "Century Link", "Lariat Software", "samharwell.com", "cable"),
    ("89.160.20.112", "89.160.20.127", "SE", "E", "Linköping", "58341", 58.4167, 15.6167,
     "Östergötland", "Europe/Stockholm", "Bredband2 AB", "Bevtec", "bevtec.se", "broadband"),
    ("175.16.199.0", "175.16.199.255", "CN", "22", "Changchun", None, 43.88, 125.3228,
     "Jilin Sheng", "Asia/Harbin", "China Unicom", "CNC Group", "unicom.cn", "broadband"),
    ("10.0.0.0", "10.255.255.255", None, None, None, None, None, None,
     None, None, "Private", "Private network", None, "lan"),
]


def ip_to_long(col):
    """Dotted-quad IPv4 → uint32 as BIGINT, NULL for non-IPv4. Pure SQL."""
    p = F.split(col, "\\.")
    ok = col.rlike(
        "^((25[0-5]|2[0-4][0-9]|1?[0-9]{1,2})\\.){3}(25[0-5]|2[0-4][0-9]|1?[0-9]{1,2})$"
    )
    val = (
        p[0].cast("bigint") * 16777216 + p[1].cast("bigint") * 65536
        + p[2].cast("bigint") * 256 + p[3].cast("bigint")
    )
    return F.when(ok, val)


def demo_geo_table(spark: SparkSession) -> DataFrame:
    """Tiny built-in range table (hosts the MaxMind test-DB ranges the
    reference's specs use, e.g. 175.16.199.x / 216.160.83.x)."""
    schema = (
        "ip_start_s STRING, ip_end_s STRING, geo_country STRING, geo_region STRING,"
        "geo_city STRING, geo_zipcode STRING, geo_latitude FLOAT, geo_longitude FLOAT,"
        "geo_region_name STRING, geo_timezone STRING, ip_isp STRING,"
        "ip_organization STRING, ip_domain STRING, ip_netspeed STRING"
    )
    df = spark.createDataFrame(_DEMO_RANGES, schema)
    return df.select(
        ip_to_long(F.col("ip_start_s")).alias("ip_start"),
        ip_to_long(F.col("ip_end_s")).alias("ip_end"),
        *[F.col(c) for c in GEO_COLS],
    )


def load_geo_table(spark: SparkSession, path: str) -> DataFrame:
    """Load a range table from parquet/csv with columns
    (ip_start BIGINT, ip_end BIGINT, <GEO_COLS...>)."""
    if path.endswith(".csv"):
        return spark.read.option("header", True).option("inferSchema", True).csv(path)
    return spark.read.parquet(path)


def _bucketize(ranges: DataFrame) -> DataFrame:
    """Explode each range across the /16 buckets it spans."""
    b0 = (F.col("ip_start") / 65536).cast("bigint")
    b1 = (F.col("ip_end") / 65536).cast("bigint")
    return ranges.withColumn("bucket", F.explode(F.sequence(b0, b1)))


def ip_lookups(df: DataFrame, ranges: DataFrame, ip_col: str = "user_ipaddress") -> DataFrame:
    """Add the 12 geo/ip columns via bucketized broadcast range join.

    NOTE: run BEFORE anon_ip (EnrichmentManager.scala:365 ordering note).
    """
    bucketized = _bucketize(ranges)
    probe = df.withColumn("_ip_long", ip_to_long(F.col(ip_col))).withColumn(
        "_ip_bucket", (F.col("_ip_long") / 65536).cast("bigint")
    )
    joined = probe.join(
        F.broadcast(bucketized),
        (probe["_ip_bucket"] == bucketized["bucket"])
        & (probe["_ip_long"] >= bucketized["ip_start"])
        & (probe["_ip_long"] <= bucketized["ip_end"]),
        "left",
    )
    return joined.drop("_ip_long", "_ip_bucket", "bucket", "ip_start", "ip_end")


def ip_lookups_mmdb(df: DataFrame, mmdb_path: str, ip_col: str = "user_ipaddress") -> DataFrame:
    """MaxMind .mmdb variant via mapInPandas with a per-executor reader
    singleton (the classic Spark geo-IP pattern). Gated on `maxminddb`
    being importable; raises otherwise."""
    try:
        import maxminddb  # noqa: F401
    except ImportError as e:  # pragma: no cover - lib not in this container
        raise NotImplementedError(
            "maxminddb is not installed; use ip_lookups() with a range table"
        ) from e
    import pandas as pd  # noqa: F401
    from pyspark.sql import types as T

    out_schema = T.StructType(
        df.schema.fields
        + [T.StructField(c, T.StringType() if "lat" not in c and "lon" not in c else T.FloatType())
           for c in GEO_COLS]
    )

    def lookup(iterator):
        import maxminddb

        reader = maxminddb.open_database(mmdb_path)
        for pdf in iterator:
            geos = [reader.get(ip) if ip else None for ip in pdf[ip_col]]
            for c in GEO_COLS:
                pdf[c] = None
            for i, g in enumerate(geos):
                if g:
                    pdf.loc[pdf.index[i], "geo_country"] = (g.get("country") or {}).get("iso_code")
                    pdf.loc[pdf.index[i], "geo_city"] = ((g.get("city") or {}).get("names") or {}).get("en")
            yield pdf

    return df.mapInPandas(lookup, out_schema)
