"""Dataset manifest (plans/manifest.dataset_manifest)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from enrich_spark.plans.manifest import dataset_manifest, dataset_manifest_sql


def _df(spark):
    return spark.createDataFrame(
        [(1, "a", "s0"), (2, "b", "s0"), (3, None, "s1")],
        "id INT, v STRING, src STRING")


def test_manifest_partition_and_order_independent(spark):
    df = _df(spark)
    m1 = tuple(dataset_manifest(df, ["id", "v"]).collect()[0])
    m2 = tuple(dataset_manifest(
        df.repartition(7).sortWithinPartitions(F.desc("id")),
        ["id", "v"]).collect()[0])
    assert m1 == m2


def test_manifest_detects_any_single_row_change(spark):
    base = tuple(dataset_manifest(_df(spark), ["id", "v"]).collect()[0])
    changed = _df(spark).withColumn(
        "v", F.when(F.col("id") == 2, F.lit("B")).otherwise(F.col("v")))
    mut = tuple(dataset_manifest(changed, ["id", "v"]).collect()[0])
    assert base != mut
    # null vs empty-string must differ too (the \x00 sentinel)
    empt = _df(spark).withColumn(
        "v", F.when(F.col("id") == 3, F.lit("")).otherwise(F.col("v")))
    assert tuple(dataset_manifest(empt, ["id", "v"]).collect()[0]) != base


def test_manifest_grouped_and_md5_cross_engine(spark):
    got = sorted(tuple(r) for r in dataset_manifest(
        _df(spark), ["id", "v"], group_cols=["src"], hash="md5").collect())
    sql = dataset_manifest_sql(
        "SELECT * FROM (VALUES (1,'a','s0'),(2,'b','s0'),(3,NULL,'s1'))"
        " t(id, v, src)", ["id", "v"], group_cols=["src"])
    want = sorted(tuple(r) for r in duckdb.connect().execute(sql).fetchall())
    assert got == want


def test_manifest_xor_pair_caveat_is_caught_by_count(spark):
    # duplicating a row twice cancels in the XOR — n_rows/bytes catch it
    df = _df(spark)
    dup = df.unionByName(df.where(F.col("id") == 1)) \
            .unionByName(df.where(F.col("id") == 1))
    a = dataset_manifest(df, ["id", "v"]).collect()[0]
    b = dataset_manifest(dup, ["id", "v"]).collect()[0]
    assert a.content_xor == b.content_xor      # the documented blind spot
    assert (a.n_rows, a.bytes_total) != (b.n_rows, b.bytes_total)


def test_manifest_unknown_hash_rejected(spark):
    with pytest.raises(ValueError):
        dataset_manifest(_df(spark), ["id"], hash="sha999")
