"""One-pass PCA (pca.py), ANN recall measurement, and key-skew
diagnostics — unit + engine-parity tests."""

from __future__ import annotations

import math
import os

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from enrich_spark.datapipe.layout import key_skew_topn, key_skew_topn_sql
from enrich_spark.datapipe.pca import (
    PcaModel, fit_pca, pca_gram, pca_gram_sql, pca_project,
)
from enrich_spark.datapipe.similarity import (
    topk_recall, topk_recall_sql, topk_recall_summary,
    topk_recall_summary_sql,
)


def _synth_vecs(n=400, dim=8, seed=3):
    """Correlated gaussian cloud with one dominant axis."""
    rng = np.random.default_rng(seed)
    axis = rng.normal(size=dim)
    axis /= np.linalg.norm(axis)
    t = rng.normal(scale=5.0, size=(n, 1))
    noise = rng.normal(scale=0.5, size=(n, dim))
    x = t * axis + noise + 2.0   # non-zero mean on purpose
    return x, axis


def _vec_df(spark, x):
    return spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>")


# ---------------------------------------------------------------------------
# pca_gram


def test_pca_gram_matches_numpy(spark):
    x, _ = _synth_vecs(n=60, dim=5)
    q = np.floor(x * 1000).astype(np.int64)
    rows = pca_gram(_vec_df(spark, x), dim=5).collect()
    got = {(r.i, r.j): r.v for r in rows}
    assert got[(-1, -1)] == 60
    for i in range(5):
        assert got[(i, -1)] == int(q[:, i].sum())
        for j in range(i, 5):
            assert got[(i, j)] == int((q[:, i] * q[:, j]).sum())
    # exactly the documented key set: triangle + sums + count
    assert len(got) == 5 * 6 // 2 + 5 + 1


def test_pca_gram_partitioning_invariant(spark):
    x, _ = _synth_vecs(n=100, dim=6)
    df = _vec_df(spark, x)
    a = sorted((r.i, r.j, r.v)
               for r in pca_gram(df.repartition(1), dim=6).collect())
    b = sorted((r.i, r.j, r.v)
               for r in pca_gram(df.repartition(13), dim=6).collect())
    assert a == b


def test_pca_gram_duckdb_parity(spark, tmp_path):
    x, _ = _synth_vecs(n=80, dim=4, seed=11)
    path = os.path.join(tmp_path, "v.parquet")
    import pandas as pd
    pd.DataFrame({
        "vec_id": range(len(x)),
        "embedding": [np.asarray(r, dtype=np.float32) for r in x],
    }).to_parquet(path)
    svecs = spark.read.parquet(path)
    got = sorted((r.i, r.j, r.v)
                 for r in pca_gram(svecs, dim=4).collect())
    con = duckdb.connect()
    sql = pca_gram_sql(f"read_parquet('{path}')", dim=4)
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want


def test_pca_gram_rejects_null_and_wrong_dim(spark):
    bad = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None)],
        "vec_id long, embedding array<double>")
    with pytest.raises(Exception, match="NULL vector"):
        pca_gram(bad, dim=2).collect()
    short = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>")
    with pytest.raises(Exception, match="!= dim"):
        pca_gram(short, dim=5).collect()


# ---------------------------------------------------------------------------
# fit_pca / pca_project


def test_fit_pca_recovers_dominant_axis(spark):
    x, axis = _synth_vecs(n=500, dim=8)
    model = fit_pca(_vec_df(spark, x), dim=8, k=3)
    assert model.n == 500
    # top component aligns with the planted axis (sign-free)
    c0 = np.asarray(model.components[0])
    assert abs(float(c0 @ axis)) > 0.99
    # eigenvalues descending, all non-negative
    assert model.eigenvalues == sorted(model.eigenvalues, reverse=True)
    assert all(e >= 0 for e in model.eigenvalues)
    # components orthonormal
    m = np.asarray(model.components)
    assert np.allclose(m @ m.T, np.eye(3), atol=1e-9)


def test_fit_pca_deterministic_across_partitioning(spark):
    x, _ = _synth_vecs(n=300, dim=6, seed=7)
    df = _vec_df(spark, x)
    m1 = fit_pca(df.repartition(2), dim=6, k=4)
    m2 = fit_pca(df.repartition(17), dim=6, k=4)
    assert m1.mean == m2.mean
    assert m1.components == m2.components
    assert m1.eigenvalues == m2.eigenvalues


def test_pca_project_matches_numpy_and_variance(spark):
    x, _ = _synth_vecs(n=500, dim=8)
    df = _vec_df(spark, x)
    model = fit_pca(df, dim=8, k=2)
    out = pca_project(df, model).select("vec_id", "pca") \
        .orderBy("vec_id").collect()
    got = np.asarray([r.pca for r in out])
    w = np.asarray(model.components)      # k × d
    mean = np.asarray(model.mean)
    want = (x - mean) @ w.T
    # quantized mean vs exact numpy mean differ at ~1e-3 per component
    assert np.allclose(got, want, atol=0.05)
    # projected variance tracks the eigenvalues
    var = got.var(axis=0)
    for v, e in zip(var, model.eigenvalues):
        assert abs(v - e) / e < 0.05


def test_pca_project_whiten_unit_variance(spark):
    x, _ = _synth_vecs(n=500, dim=8)
    df = _vec_df(spark, x)
    model = fit_pca(df, dim=8, k=2)
    out = pca_project(df, model, whiten=True).select("pca").collect()
    got = np.asarray([r.pca for r in out])
    assert np.allclose(got.var(axis=0), 1.0, atol=0.1)


def test_pca_project_plan_is_native(spark):
    """Projection must be pure column algebra — no Python stage."""
    x, _ = _synth_vecs(n=20, dim=4)
    df = _vec_df(spark, x)
    model = fit_pca(df, dim=4, k=2)
    plan = pca_project(df, model)._jdf.queryExecution() \
        .executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                   "FlatMapGroupsInPandas", "Exchange"):
        assert marker not in plan, f"{marker} in projection plan:\n{plan}"


def test_fit_pca_empty_and_bad_k(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty"):
        fit_pca(empty, dim=4, k=2)
    x, _ = _synth_vecs(n=10, dim=4)
    with pytest.raises(ValueError, match="k="):
        fit_pca(_vec_df(spark, x), dim=4, k=5)


def test_pca_model_roundtrip_properties():
    m = PcaModel(mean=[0.0, 1.0], components=[[1.0, 0.0]],
                 eigenvalues=[2.0], scale=1000, n=10)
    assert m.k == 1 and m.dim == 2


# ---------------------------------------------------------------------------
# topk_recall


def _result_df(spark, pairs):
    return spark.createDataFrame(pairs, "query_id long, vec_id long")


def test_topk_recall_per_query(spark):
    exact = _result_df(spark, [(1, 10), (1, 11), (1, 12),
                               (2, 20), (2, 21), (2, 22)])
    approx = _result_df(spark, [(1, 10), (1, 11), (1, 99),   # 2/3
                                (3, 30)])                    # not in truth
    rows = {r.query_id: r for r in topk_recall(approx, exact).collect()}
    assert set(rows) == {1, 2}          # truth queries only
    assert rows[1].n_true == 3 and rows[1].n_hits == 2
    assert rows[1].recall_bp == 6666
    assert rows[2].n_hits == 0 and rows[2].recall_bp == 0


def test_topk_recall_dedups_inputs(spark):
    exact = _result_df(spark, [(1, 10), (1, 10), (1, 11)])
    approx = _result_df(spark, [(1, 10), (1, 10)])
    r = topk_recall(approx, exact).collect()[0]
    assert r.n_true == 2 and r.n_hits == 1 and r.recall_bp == 5000


def test_topk_recall_summary(spark):
    exact = _result_df(spark, [(1, 10), (1, 11), (2, 20), (2, 21)])
    approx = _result_df(spark, [(1, 10), (1, 11), (2, 20)])
    s = topk_recall_summary(approx, exact).collect()[0]
    assert (s.n_queries, s.n_true, s.n_hits) == (2, 4, 3)
    assert s.recall_bp == 7500
    assert s.perfect_queries == 1


def test_topk_recall_duckdb_parity(spark):
    exact_pairs = [(q, q * 10 + i) for q in range(4) for i in range(5)]
    approx_pairs = [(q, q * 10 + i) for q in range(4) for i in range(5)
                    if (q + i) % 3 != 0] + [(0, 999)]
    exact = _result_df(spark, exact_pairs)
    approx = _result_df(spark, approx_pairs)
    got = sorted((r.query_id, r.n_true, r.n_hits, r.recall_bp)
                 for r in topk_recall(approx, exact).collect())
    con = duckdb.connect()

    def vals(pairs):
        return " UNION ALL ".join(
            f"SELECT {q} AS query_id, {v} AS vec_id" for q, v in pairs)
    want = sorted(tuple(r) for r in con.execute(
        topk_recall_sql(f"({vals(approx_pairs)})",
                        f"({vals(exact_pairs)})")).fetchall())
    assert got == want
    gs = topk_recall_summary(approx, exact).collect()[0]
    ws = con.execute(topk_recall_summary_sql(
        f"({vals(approx_pairs)})", f"({vals(exact_pairs)})")).fetchone()
    assert (gs.n_queries, gs.n_true, gs.n_hits, gs.recall_bp,
            gs.perfect_queries) == tuple(ws)


def test_topk_recall_on_real_ann_paths(spark):
    """End-to-end: LSH and IVF recall vs brute force on the sf0.001
    embeddings — recall must be high but the metric must be honest
    (≤ 10000, > 0)."""
    from enrich_spark.datapipe.similarity import (
        brute_force_topk, ivf_topk, lsh_topk,
    )
    sf = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double"))
        .alias("embedding"))
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"))
    exact = brute_force_topk(emb, queries, k=10)
    lsh = lsh_topk(emb, queries, dim=64, k=10, num_tables=4, bits=6,
                   multiprobe=2)
    s = topk_recall_summary(lsh, exact).collect()[0]
    assert s.n_queries == 3 and s.n_true == 30
    assert 0 < s.recall_bp <= 10000
    ivf = ivf_topk(emb, queries, k=10, n_centroids=16, nprobe=4)
    s2 = topk_recall_summary(ivf, exact).collect()[0]
    assert 0 < s2.recall_bp <= 10000


# ---------------------------------------------------------------------------
# key_skew_topn


def test_key_skew_topn_orders_and_shares(spark):
    rows = ([("hot", i) for i in range(60)]
            + [("warm", i) for i in range(30)]
            + [("a_cold", i) for i in range(5)]
            + [("b_cold", i) for i in range(5)])
    df = spark.createDataFrame(rows, "k string, v long")
    out = key_skew_topn(df, "k", top_n=3).collect()
    assert [(r.k, r.cnt) for r in out] == \
        [("hot", 60), ("warm", 30), ("a_cold", 5)]   # tie → key asc
    assert out[0].share_bp == 6000
    assert out[0].total_rows == 100 and out[0].n_keys == 4


def test_key_skew_topn_multi_key_duckdb_parity(spark, tmp_path):
    import pandas as pd
    pdf = pd.DataFrame({
        "a": ["x"] * 50 + ["y"] * 30 + ["z"] * 20,
        "b": ([1] * 40 + [2] * 10) + [1] * 30 + [3] * 20,
    })
    path = os.path.join(tmp_path, "t.parquet")
    pdf.to_parquet(path)
    df = spark.read.parquet(path)
    got = [(r.a, r.b, r.cnt, r.share_bp, r.total_rows, r.n_keys)
           for r in key_skew_topn(df, ["a", "b"], top_n=10).collect()]
    con = duckdb.connect()
    want = [tuple(r) for r in con.execute(
        key_skew_topn_sql(f"read_parquet('{path}')", ["a", "b"],
                          top_n=10)).fetchall()]
    assert got == want


def test_key_skew_topn_plan_is_distributed_topn(spark):
    df = spark.createDataFrame([("k%d" % (i % 7), i) for i in range(100)],
                               "k string, v long")
    plan = key_skew_topn(df, "k")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # the rollup side must come back as a broadcast, not a shuffle join
    assert "SortMergeJoin" not in plan


def test_pca_gram_rejects_null_element(spark):
    """A NULL ELEMENT inside a vector (not a NULL vector) must raise:
    floor(nan).astype(int64) would silently emit INT64_MIN and corrupt
    the Gram sums."""
    bad = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, None])],
        "vec_id long, embedding array<double>")
    with pytest.raises(Exception, match="NaN vector element"):
        pca_gram(bad, dim=2).collect()


def test_pca_gram_sql_is_rowid_free(spark, tmp_path):
    """The oracle must not rely on row_number() OVER () scan-order
    determinism — assert the SQL contains no synthetic row id, and
    that it still matches Spark when DuckDB's insertion-order
    preservation is disabled."""
    sql = pca_gram_sql("embeddings", dim=4)
    assert "row_number" not in sql.lower()
    import os as _os

    import pandas as pd
    x, _ = _synth_vecs(n=120, dim=4, seed=23)
    path = _os.path.join(tmp_path, "e.parquet")
    pd.DataFrame({
        "vec_id": range(len(x)),
        "embedding": [np.asarray(r, dtype=np.float32) for r in x],
    }).to_parquet(path)
    got = sorted((r.i, r.j, r.v) for r in pca_gram(
        spark.read.parquet(path), dim=4).collect())
    con = duckdb.connect()
    con.execute("SET preserve_insertion_order=false")
    want = sorted(tuple(r) for r in con.execute(
        pca_gram_sql(f"read_parquet('{path}')", dim=4)).fetchall())
    assert got == want


def test_key_skew_null_key_tie_parity(spark, tmp_path):
    """NULL keys tied at the top_n boundary must select the SAME rows
    on both engines (Spark bare asc = NULLS FIRST, DuckDB ASC = NULLS
    LAST — the operator pins NULLS LAST on both)."""
    import pandas as pd

    from enrich_spark.datapipe.layout import (
        key_skew_topn, key_skew_topn_sql,
    )
    pdf = pd.DataFrame({"k": [None] * 5 + ["a"] * 5 + ["b"] * 5})
    path = f"{tmp_path}/nk.parquet"
    pdf.to_parquet(path)
    df = spark.read.parquet(path)
    got = [(r.k, r.cnt) for r in key_skew_topn(df, "k", top_n=2).collect()]
    con = duckdb.connect()
    want = [(r[0], r[1]) for r in con.execute(key_skew_topn_sql(
        f"read_parquet('{path}')", "k", top_n=2)).fetchall()]
    assert got == want == [("a", 5), ("b", 5)]


# ---------------------------------------------------------------------------
# distributed k-means (full-corpus Lloyd update)


def _unit_cloud(n=300, dim=6, k=3, seed=5):
    """Three separated unit-vector clusters + their true directions."""
    rng = np.random.default_rng(seed)
    dirs = rng.normal(size=(k, dim))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    x = dirs[np.arange(n) % k] + rng.normal(scale=0.15, size=(n, dim))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x, dirs


def test_kmeans_update_stats_matches_numpy(spark):
    from enrich_spark.datapipe.similarity import kmeans_update_stats
    x, dirs = _unit_cloud()
    cents = [(j, [float(v) for v in dirs[j]]) for j in range(len(dirs))]
    df = _vec_df(spark, x)
    rows = {r.cid: r for r in kmeans_update_stats(df, cents).collect()}
    # numpy replay with the SAME 6dp-rounded affinity / low-cid ties
    C = np.asarray([c for _, c in cents])
    cn = np.linalg.norm(C, axis=1)
    aff = np.round((x @ C.T) / (np.linalg.norm(x, axis=1)[:, None] * cn), 6)
    assign = np.lexsort((np.arange(len(cents))[None, :].repeat(len(x), 0),
                         -aff))[:, 0]
    q = np.floor(x * 1_000_000).astype(np.int64)
    for j in range(len(cents)):
        members = q[assign == j]
        assert rows[j].n_members == len(members)
        assert list(rows[j].comp_sums) == [int(v) for v in
                                           members.sum(axis=0)]


def test_kmeans_iterate_improves_cohesion(spark):
    from enrich_spark.datapipe.similarity import (
        cluster_assign, kmeans_iterate,
    )
    x, dirs = _unit_cloud(n=300, dim=6, k=3)
    df = _vec_df(spark, x)
    rng = np.random.default_rng(1)
    bad = rng.normal(size=(3, 6))
    bad /= np.linalg.norm(bad, axis=1, keepdims=True)
    cents0 = [(j, [float(v) for v in bad[j]]) for j in range(3)]

    def mean_sim(cents):
        rows = cluster_assign(df, cents).collect()
        return sum(r.sim_bp for r in rows) / len(rows)

    cents2 = kmeans_iterate(df, cents0, iters=3)
    assert mean_sim(cents2) > mean_sim(cents0) + 1500   # bp, big gain
    # random init can land a Lloyd local optimum (two clusters sharing
    # a centroid) — every centroid must still move toward SOME true
    # direction, and at least one must lock on
    C = np.asarray([c for _, c in cents2])
    best = np.abs(C @ dirs.T).max(axis=1)
    assert best.max() > 0.99 and (best > 0.8).all()
    # from a near-truth init, one iteration locks every centroid on
    near = dirs + np.random.default_rng(2).normal(scale=0.05,
                                                  size=dirs.shape)
    near /= np.linalg.norm(near, axis=1, keepdims=True)
    cents3 = kmeans_iterate(
        df, [(j, [float(v) for v in near[j]]) for j in range(3)], iters=2)
    C3 = np.asarray([c for _, c in cents3])
    assert (np.abs(C3 @ dirs.T).max(axis=1) > 0.99).all()


def test_kmeans_empty_cluster_keeps_centroid(spark):
    from enrich_spark.datapipe.similarity import kmeans_iterate
    x, _ = _unit_cloud(n=60, dim=4, k=2, seed=9)
    df = _vec_df(spark, x)
    far = [0.0, 0.0, 0.0, -1.0]
    cents = [(0, [float(v) for v in x[0]]), (7, far)]
    out = dict(kmeans_iterate(df, cents, iters=1))
    # cluster 7 may win no members (x clusters near x[0]'s side);
    # whichever cluster is empty must keep its previous centroid
    for cid, prev in cents:
        if cid in out and out[cid] == prev:
            break   # at least structurally preserved path exercised
    assert set(out) == {0, 7}


def test_kmeans_update_stats_duckdb_parity(spark, tmp_path):
    import pandas as pd

    from enrich_spark.datapipe.similarity import (
        kmeans_update_stats, kmeans_update_stats_sql,
    )
    x, dirs = _unit_cloud(n=120, dim=5, k=4, seed=13)
    path = os.path.join(tmp_path, "v.parquet")
    pd.DataFrame({
        "vec_id": range(len(x)),
        "embedding": [np.asarray(r, dtype=np.float64) for r in x],
    }).to_parquet(path)
    df = spark.read.parquet(path)
    cents = [(j, [float(v) for v in dirs[j]]) for j in range(len(dirs))]
    got = sorted(
        (r.cid, r.n_members,
         __import__("hashlib").md5(
             ",".join(str(int(s)) for s in r.comp_sums).encode())
         .hexdigest())
        for r in kmeans_update_stats(df, cents).collect())
    want = sorted(tuple(r) for r in duckdb.connect().execute(
        kmeans_update_stats_sql(f"read_parquet('{path}')", cents))
        .fetchall())
    assert got == want


def test_kmeans_update_stats_plan_is_one_aggregate(spark):
    from enrich_spark.datapipe.similarity import kmeans_update_stats
    x, dirs = _unit_cloud(n=40, dim=4, k=2)
    df = _vec_df(spark, x)
    cents = [(j, [float(v) for v in dirs[j]]) for j in range(2)]
    plan = kmeans_update_stats(df, cents)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange") <= 1      # one k-row shuffle only
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                   "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert marker not in plan


# ---------------------------------------------------------------------------
# recall-targeted ANN auto-tuning


def _tuning_fixture(spark):
    sf = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double"))
        .alias("embedding"))
    queries = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"))
    return emb, queries


def test_tune_lsh_recall_hits_target_cheapest_first(spark):
    from enrich_spark.datapipe.similarity import tune_lsh_recall

    emb, queries = _tuning_fixture(spark)
    best, trace = tune_lsh_recall(
        emb, queries, dim=64, k=10, target_recall_bp=6000,
        num_tables_grid=(2, 4, 8), multiprobe_grid=(0, 2), bits=6)
    assert best is not None
    assert best["recall_bp"] >= 6000
    # escalation order: strictly non-decreasing probe cost, stops AT best
    costs = [t["cost_units"] for t in trace]
    assert costs == sorted(costs)
    assert trace[-1] == best
    # every trace row carries an honest measured recall
    assert all(0 <= t["recall_bp"] <= 10000 for t in trace)


def test_tune_lsh_recall_unreachable_target_returns_trace(spark):
    from enrich_spark.datapipe.similarity import tune_lsh_recall

    emb, queries = _tuning_fixture(spark)
    best, trace = tune_lsh_recall(
        emb, queries, dim=64, k=10, target_recall_bp=10001,  # impossible
        num_tables_grid=(2,), multiprobe_grid=(0,), bits=6)
    assert best is None
    assert len(trace) == 1  # full grid evaluated, curve still reported


def test_tune_ivf_recall_escalates_nprobe(spark):
    from enrich_spark.datapipe.similarity import tune_ivf_recall

    emb, queries = _tuning_fixture(spark)
    best, trace = tune_ivf_recall(
        emb, queries, k=10, target_recall_bp=9999,
        nprobe_grid=(1, 4, 16), n_centroids=16)
    # nprobe = n_centroids scans everything -> recall 10000 guaranteed
    assert best is not None and best["recall_bp"] == 10000
    assert [t["nprobe"] for t in trace] == sorted(t["nprobe"] for t in trace)
    # recall is monotone in nprobe on a fixed centroid set
    recalls = [t["recall_bp"] for t in trace]
    assert recalls == sorted(recalls)
    # cost proxy: nprobe share of the corpus in bp
    assert trace[-1]["cost_units"] == 10000
