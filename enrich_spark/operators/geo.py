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


def demo_mmdb_bytes() -> bytes:
    """Serialize the demo ranges as a real GeoIP2-City .mmdb file (via the
    pure-Python writer in functions/mmdb.py). Fixture for the
    mmdb → range-table converter round-trip: encoder → Reader →
    mmdb_to_rows must reproduce demo_geo_table exactly."""
    from ..functions.mmdb import build_mmdb

    def _ip2l(s):
        a, b, c, d = (int(x) for x in s.split("."))
        return a * 16777216 + b * 65536 + c * 256 + d

    ranges = []
    for (s, e, country, region, city, zipc, lat, lon, region_name, tz,
         isp, org, domain, netspeed) in _DEMO_RANGES:
        rec: dict = {}
        if country:
            rec["country"] = {"iso_code": country}
        if region or region_name:
            sub = {}
            if region:
                sub["iso_code"] = region
            if region_name:
                sub["names"] = {"en": region_name}
            rec["subdivisions"] = [sub]
        if city:
            rec["city"] = {"names": {"en": city}}
        if zipc:
            rec["postal"] = {"code": zipc}
        loc = {}
        if lat is not None:
            loc["latitude"] = float(lat)
        if lon is not None:
            loc["longitude"] = float(lon)
        if tz:
            loc["time_zone"] = tz
        if loc:
            rec["location"] = loc
        traits = {}
        if isp:
            traits["isp"] = isp
        if org:
            traits["organization"] = org
        if domain:
            traits["domain"] = domain
        if netspeed:
            traits["connection_type"] = netspeed
        if traits:
            rec["traits"] = traits
        ranges.append((_ip2l(s), _ip2l(e), rec))
    return build_mmdb(ranges)


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


def mmdb_range_table(spark: SparkSession, city: str | None = None,
                     isp: str | None = None, domain: str | None = None,
                     connection: str | None = None) -> DataFrame:
    """Convert MaxMind .mmdb file(s) into the broadcast range table
    ``ip_lookups`` consumes — the 100 TB path: the conversion runs once on
    the driver (DB files are MBs), then the join is a native bucketized
    BroadcastHashJoin with zero Python per event.

    Multiple DB models (City + ISP + Domain + Connection-Type, matching
    the reference's ipLookups config axes, IpLookupsEnrichment.scala:60-88)
    are interval-merged so each output range carries all 12 columns.
    """
    from ..functions.mmdb import Reader, merge_range_rows, mmdb_to_rows

    row_lists = [
        mmdb_to_rows(Reader.open(path))
        for path in (city, isp, domain, connection) if path is not None
    ]
    if not row_lists:
        raise ValueError("at least one mmdb path is required")
    rows = merge_range_rows(row_lists) if len(row_lists) > 1 else row_lists[0]
    schema = (
        "ip_start BIGINT, ip_end BIGINT, geo_country STRING, geo_region STRING,"
        "geo_city STRING, geo_zipcode STRING, geo_latitude DOUBLE, geo_longitude DOUBLE,"
        "geo_region_name STRING, geo_timezone STRING, ip_isp STRING,"
        "ip_organization STRING, ip_domain STRING, ip_netspeed STRING"
    )
    data = [
        tuple([r.get("ip_start"), r.get("ip_end")] + [r.get(c) for c in GEO_COLS])
        for r in rows
    ]
    df = spark.createDataFrame(data, schema)
    return df.select(
        "ip_start", "ip_end",
        *[F.col(c).cast("float").alias(c) if c in ("geo_latitude", "geo_longitude")
          else F.col(c) for c in GEO_COLS],
    )


def mmdb_asn_table(spark: SparkSession, path: str) -> DataFrame:
    """Convert a GeoLite2-ASN .mmdb into the (ip_start, ip_end, asn,
    asn_org) table operators/ua.py:asn_lookups broadcasts."""
    from ..functions.mmdb import Reader, asn_columns

    rows = [
        (s, e, asn_columns(rec)["asn"], asn_columns(rec)["asn_org"])
        for s, e, rec in Reader.open(path).iter_ranges(ipv4_only=True)
    ]
    return spark.createDataFrame(
        rows, "ip_start BIGINT, ip_end BIGINT, asn INT, asn_org STRING"
    )


def ip_lookups_mmdb(df: DataFrame, mmdb_path: str, ip_col: str = "user_ipaddress") -> DataFrame:
    """MaxMind .mmdb point-lookup variant: mapInPandas with a
    per-executor reader singleton (the classic Spark geo-IP pattern),
    backed by the engine's own pure-Python mmdb codec
    (functions/mmdb.py — no external lib needed). Fills all 12 columns.

    Prefer ``mmdb_range_table`` + ``ip_lookups`` for the hot path; this
    variant exists for IPv6-heavy tables where range explosion is
    impractical, and as the behavioral cross-check for the converter."""
    from pyspark.sql import types as T

    from ..functions.mmdb import Reader, geo_columns

    with open(mmdb_path, "rb") as f:
        blob = f.read()  # ship bytes in the closure → one copy per executor

    out_schema = T.StructType(
        df.schema.fields
        + [T.StructField(c, T.FloatType() if c in ("geo_latitude", "geo_longitude")
                         else T.StringType())
           for c in GEO_COLS]
    )

    def lookup(iterator):
        reader = Reader(blob)
        cache: dict = {}
        for pdf in iterator:
            cols = {c: [] for c in GEO_COLS}
            for ip in pdf[ip_col]:
                key = ip if isinstance(ip, str) else None
                got = cache.get(key)
                if got is None:
                    got = geo_columns(reader.lookup(key) if key else None)
                    if len(cache) < 65536:
                        cache[key] = got
                for c in GEO_COLS:
                    cols[c].append(got[c])
            for c in GEO_COLS:
                pdf[c] = cols[c]
            yield pdf

    return df.mapInPandas(lookup, out_schema)
