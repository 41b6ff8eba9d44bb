"""Product quantization (datapipe/pq.py): train/assign round trip,
ADC recall vs exact cosine, DuckDB mini-oracle exact parity, plan
contract (map-side assign, broadcast ADC)."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from enrich_spark.datapipe.pq import (
    adc_topk, adc_topk_sql, apply_pq, pq_codes_sql, train_pq,
)


def _vecs(spark, n=40, dim=16, seed=3):
    import numpy as np

    rng = np.random.default_rng(seed)
    # two gaussian clusters so PQ codes are meaningful
    X = rng.normal(0, 0.2, size=(n, dim))
    X[n // 2:] += 1.0
    rows = [(i, [float(x) for x in X[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_train_assign_shapes_and_determinism(spark):
    vecs = _vecs(spark)
    model = train_pq(vecs, m=4, k=4)
    assert len(model) == 4 and all(len(c[0]) == 4 for c in model)
    a = {r.vec_id: list(r.codes) for r in apply_pq(vecs, model).collect()}
    b = {r.vec_id: list(r.codes) for r in apply_pq(vecs, model).collect()}
    assert a == b
    assert all(0 <= c < 4 for codes in a.values() for c in codes)
    # the two clusters must not share a code word everywhere
    assert a[0] != a[39]


def test_adc_topk_recall_against_exact(spark):
    """PQ is lossy, but nearest-neighbor recall@5 vs exact L2 should be
    high on well-separated clusters."""
    import numpy as np

    vecs = _vecs(spark, n=60, dim=16)
    model = train_pq(vecs, m=4, k=8)
    queries = vecs.where(F.col("vec_id").isin(0, 59)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"))
    got = adc_topk(vecs, queries, model, k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r.vec_id)
    # exact L2 top-5 via numpy
    X = np.array([r.embedding for r in
                  vecs.orderBy("vec_id").collect()])
    for qid in (0, 59):
        d = ((X - X[qid]) ** 2).sum(axis=1)
        exact = set(np.argsort(d, kind="stable")[:5].tolist())
        assert len(set(by_q[qid]) & exact) >= 3  # recall@5 >= 0.6
        assert by_q[qid][0] == qid               # self is nearest


def test_pq_matches_duckdb_oracle(spark):
    vecs = _vecs(spark, n=30, dim=16, seed=11)
    model = train_pq(vecs, m=4, k=4)

    # codes parity
    got_codes = sorted(
        (r.vec_id, ",".join(str(c) for c in r.codes))
        for r in apply_pq(vecs, model).collect())
    rows = vecs.collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE emb (vec_id BIGINT, embedding DOUBLE[])")
    con.executemany("INSERT INTO emb VALUES (?, ?)",
                    [(r.vec_id, list(r.embedding)) for r in rows])
    want_codes = sorted(tuple(r) for r in con.execute(
        pq_codes_sql("emb", "vec_id", "embedding", model)).fetchall())
    assert got_codes == want_codes

    # ADC top-k parity (integer distances -> identical order incl. ties)
    queries = vecs.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"))
    got = sorted((r.query_id, r.vec_id, r.adc_dist, r.rank)
                 for r in adc_topk(vecs, queries, model, k=7).collect())
    want = sorted(tuple(r) for r in con.execute(
        adc_topk_sql("emb", "vec_id", "embedding", "vec_id < 3",
                     model, k=7)).fetchall())
    assert got == want


def test_pq_plan_contract(spark):
    """Assign is map-side zero-Python; ADC joins the corpus codes with
    the broadcast query+LUT side — no sort-merge join, no Python."""
    vecs = _vecs(spark, n=20, dim=16)
    model = train_pq(vecs, m=4, k=4)
    plan = (apply_pq(vecs, model)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    assert "EvalPython" not in plan and "MapInPandas" not in plan

    queries = vecs.limit(2).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"))
    plan = (adc_topk(vecs, queries, model, k=3)
            ._jdf.queryExecution().executedPlan().toString())
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    assert "SortMergeJoin" not in plan
    assert "Broadcast" in plan
