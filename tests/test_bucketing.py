"""Scale toolkit specs: bucketed co-located joins, salted aggregation,
salted skew joins (plans/bucketing.py). These are plan-contract tests —
the assertion is the SHAPE of the plan (zero Exchange, balanced
partitions), not just the values.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from enrich_spark.plans import bucketing as B


@pytest.fixture(scope="module")
def skewed(spark):
    # 10k rows, 90% on one hot key — the classic straggler shape
    return spark.range(10000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 97).cast("string")))
        .alias("k"),
        (F.col("id") % 1000).alias("v"),
    )


def test_bucketed_join_zero_exchange(spark, tmp_path):
    left = spark.range(5000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a"))
    right = spark.range(5000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b"))
    B.write_bucketed(left, "t_bl", ["k"], 8, path=str(tmp_path / "bl"))
    B.write_bucketed(right, "t_br", ["k"], 8, path=str(tmp_path / "br"))
    try:
        joined = B.bucketed_join(spark, "t_bl", "t_br", ["k"])
        assert joined.count() == 5000
        # the whole point: both scans arrive hash-partitioned, the
        # SortMergeJoin needs no shuffle at all
        assert B.exchange_count(joined) == 0
        # control: the same join on plain (unbucketed) reads shuffles
        # (broadcast disabled so the comparison is SMJ vs SMJ)
        for c in ("spark.sql.autoBroadcastJoinThreshold",
                  "spark.sql.adaptive.autoBroadcastJoinThreshold"):
            spark.conf.set(c, "-1")
        try:
            plain = spark.read.parquet(str(tmp_path / "bl")).join(
                spark.read.parquet(str(tmp_path / "br")).withColumnRenamed(
                    "b", "b2").select("k", "b2"), ["k"])
            plain.count()
            assert B.exchange_count(plain) >= 1
            bucketed_smj = B.bucketed_join(spark, "t_bl", "t_br", ["k"])
            bucketed_smj.count()
            assert B.exchange_count(bucketed_smj) == 0
        finally:
            for c in ("spark.sql.autoBroadcastJoinThreshold",
                      "spark.sql.adaptive.autoBroadcastJoinThreshold"):
                spark.conf.unset(c)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bl")
        spark.sql("DROP TABLE IF EXISTS t_br")


def test_salted_agg_matches_plain(spark, skewed):
    plain = {
        (r["k"],): (r["n"], r["s"], r["mn"], r["mx"])
        for r in skewed.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"),
            F.min("v").alias("mn"), F.max("v").alias("mx")).collect()
    }
    salted = {
        (r["k"],): (r["n"], r["sum_v"], r["min_v"], r["max_v"])
        for r in B.salted_agg(
            skewed, ["k"], sums=["v"], mins=["v"], maxs=["v"], salt=8
        ).collect()
    }
    assert salted == plain


def test_salted_agg_spreads_hot_key(spark, skewed):
    # phase-1 partials for the hot key must land in >1 salt bucket
    salt_col = F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(8))
    buckets = (
        skewed.withColumn("_salt", salt_col)
        .where(F.col("k") == "hot")
        .select("_salt").distinct().count()
    )
    assert buckets == 8


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", 1.0)] + [(f"k{i}", float(i)) for i in range(97)],
        "k STRING, w DOUBLE")
    plain = sorted(
        (r["k"], r["v"], r["w"])
        for r in skewed.join(dim, ["k"]).collect())
    salted = sorted(
        (r["k"], r["v"], r["w"])
        for r in B.salted_join(skewed, dim, ["k"], salt=8).collect())
    assert salted == plain
    # left join keeps unmatched rows
    extra = skewed.union(spark.createDataFrame([("nope", -1)], skewed.schema))
    lj = B.salted_join(extra, dim, ["k"], salt=8, how="left")
    none_rows = [r for r in lj.collect() if r["k"] == "nope"]
    assert len(none_rows) == 1 and none_rows[0]["w"] is None


def test_salted_join_rejects_right(spark, skewed):
    dim = spark.createDataFrame([("hot", 1.0)], "k STRING, w DOUBLE")
    with pytest.raises(ValueError):
        B.salted_join(skewed, dim, ["k"], how="right")
