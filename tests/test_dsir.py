"""DSIR importance resampling (datapipe/dsir.py, Xie et al. 2023):
train → integer ratio table, apply → engine-exact weights (DuckDB
mini-oracle in-test), deterministic Gumbel variant, plan contract."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from enrich_spark.datapipe.dsir import (
    UNATS, apply_dsir, apply_dsir_sql, gumbel_top_k, train_dsir,
)

TARGETY = [
    "spark partitions shuffle broadcast join query plan",
    "query plan codegen shuffle partitions broadcast",
    "partitions and shuffle and broadcast join plans",
]
SOURCEY = [
    "the cat sat on the mat and purred all day",
    "lorem ipsum dolor sit amet consectetur",
    "weather today is sunny with a chance of rain",
]


def _docs(spark, texts, start=0):
    return spark.createDataFrame(
        [(start + i, t) for i, t in enumerate(texts)],
        "doc_id long, text string")


def test_train_and_apply_prefers_target_like_docs(spark):
    target = _docs(spark, TARGETY)
    source = _docs(spark, TARGETY + SOURCEY * 3)
    ratios = train_dsir(target, source, n_buckets=128)
    assert len(ratios) == 128
    assert all(isinstance(u, int) for _, u in ratios)

    mixed = _docs(spark, [
        "broadcast join shuffle partitions query plan",   # target-like
        "the cat sat on the mat in the rain",             # source-like
        "",                                               # degenerate
    ])
    rows = {r.doc_id: r for r in apply_dsir(
        mixed, ratios, n_buckets=128).collect()}
    assert rows[0].weight_unats > rows[1].weight_unats
    assert rows[2].weight_unats == 0 and rows[2].n_grams == 0

    top = apply_dsir(mixed, ratios, n_buckets=128, top_k=1).collect()
    assert [r.doc_id for r in top] == [0] and top[0].rank == 1


def test_apply_matches_duckdb_oracle(spark):
    """The integer-unat contract: Spark weights == DuckDB weights,
    exactly, including bigram hashing and zero-gram docs."""
    docs = _docs(spark, [
        "alpha beta gamma alpha", "beta beta", "", "unseen words here",
        "ALPHA, beta!! gamma...",   # normalization parity
    ])
    target = _docs(spark, ["alpha beta alpha beta gamma"])
    ratios = train_dsir(target, docs, n_buckets=64)

    got = sorted(
        (r.doc_id, r.n_grams, r.weight_unats)
        for r in apply_dsir(docs, ratios, n_buckets=64).collect())

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in enumerate([
            "alpha beta gamma alpha", "beta beta", "", "unseen words here",
            "ALPHA, beta!! gamma..."]))
        + ") t(doc_id, text)")
    sql = apply_dsir_sql("docs", "doc_id", "text", ratios, n_buckets=64)
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want


def test_gumbel_topk_deterministic_and_sized(spark):
    docs = _docs(spark, TARGETY + SOURCEY)
    ratios = train_dsir(_docs(spark, TARGETY), docs, n_buckets=64)
    scored = apply_dsir(docs, ratios, n_buckets=64)
    a = [r.doc_id for r in gumbel_top_k(scored, 3, seed=7).collect()]
    b = [r.doc_id for r in gumbel_top_k(scored, 3, seed=7).collect()]
    assert a == b and len(a) == 3
    c = [r.doc_id for r in gumbel_top_k(scored, 3, seed=8).collect()]
    assert len(c) == 3  # different seed: still k rows, order may differ


def test_dsir_plan_contract(spark):
    """Apply is zero-Python: explode → BROADCAST join with the ratio
    table → one map-side-combined aggregation. No sort-merge join, no
    cartesian, no Python stage."""
    docs = _docs(spark, TARGETY + SOURCEY)
    ratios = [(b, (b % 7 - 3) * UNATS) for b in range(64)]
    plan = (apply_dsir(docs, ratios, n_buckets=64)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan and "MapInPandas" not in plan
