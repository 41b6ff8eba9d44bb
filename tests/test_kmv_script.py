"""KMV distinct/overlap sketches (sketches.py) and Unicode script
profiling (text.py) — unit + engine-parity tests."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from enrich_spark.datapipe.sketches import (
    KMV_DOMAIN, kmv_distinct_estimate, kmv_merge, kmv_overlap_estimate,
    kmv_overlap_estimate_sql, kmv_sketch, kmv_sketch_sql,
)
from enrich_spark.datapipe.text import (
    SCRIPT_RANGES, script_profile, script_profile_sql,
)


def _ids(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "v string")


# ---------------------------------------------------------------------------
# kmv_sketch


def test_kmv_sketch_is_k_smallest_distinct(spark):
    df = _ids(spark, [f"x{i}" for i in range(100)] * 3 + [None])
    sk = kmv_sketch(df, "v", k=10).collect()
    assert len(sk) == 10
    hs = [r.kmv_h for r in sk]
    assert hs == sorted(hs)
    # must equal the brute-force 10 smallest of all 100 distinct hashes
    all_h = [r.kmv_h for r in kmv_sketch(df, "v", k=1000).collect()]
    assert len(all_h) == 100          # NULL excluded, dups collapsed
    assert hs == sorted(all_h)[:10]


def test_kmv_sketch_partitioning_invariant(spark):
    df = _ids(spark, [f"d{i}" for i in range(200)])
    a = [r.kmv_h for r in kmv_sketch(df.repartition(1), "v", k=32).collect()]
    b = [r.kmv_h for r in kmv_sketch(df.repartition(17), "v", k=32).collect()]
    assert a == b


def test_kmv_estimate_exact_below_k(spark):
    df = _ids(spark, [f"a{i}" for i in range(40)])
    est = kmv_distinct_estimate(kmv_sketch(df, "v", k=64), k=64).collect()[0]
    assert est.n_sketch == 40 and est.est_distinct == 40


def test_kmv_estimate_accuracy_above_k(spark):
    n = 5000
    df = _ids(spark, [f"u{i}" for i in range(n)])
    est = kmv_distinct_estimate(
        kmv_sketch(df, "v", k=256), k=256).collect()[0]
    assert est.n_sketch == 256
    assert abs(est.est_distinct - n) / n < 0.25   # ~6% expected, 25% bound


def test_kmv_merge_equals_sketch_of_union(spark):
    a_vals = [f"a{i}" for i in range(150)]
    b_vals = [f"b{i}" for i in range(150)] + a_vals[:50]
    a = kmv_sketch(_ids(spark, a_vals), "v", k=64)
    b = kmv_sketch(_ids(spark, b_vals), "v", k=64)
    merged = sorted(r.kmv_h for r in kmv_merge(a, b, k=64).collect())
    direct = sorted(r.kmv_h for r in kmv_sketch(
        _ids(spark, a_vals + b_vals), "v", k=64).collect())
    assert merged == direct           # the KMV mergeability property


def test_kmv_overlap_identical_and_disjoint(spark):
    vals = [f"v{i}" for i in range(300)]
    a = kmv_sketch(_ids(spark, vals), "v", k=64)
    same = kmv_overlap_estimate(a, a, k=64).collect()[0]
    assert same.jaccard_bp == 10000
    assert same.n_both == same.n_union_sketch == 64
    b = kmv_sketch(_ids(spark, [f"w{i}" for i in range(300)]), "v", k=64)
    disj = kmv_overlap_estimate(a, b, k=64).collect()[0]
    # the union sketch keeps the 64 smallest of both sides; a member of
    # the union present in BOTH side sketches would require a hash
    # collision across disjoint value sets
    assert disj.jaccard_bp == 0 and disj.est_intersection == 0


def test_kmv_overlap_estimates_jaccard(spark):
    shared = [f"s{i}" for i in range(500)]
    a_only = [f"a{i}" for i in range(500)]
    b_only = [f"b{i}" for i in range(500)]
    a = kmv_sketch(_ids(spark, shared + a_only), "v", k=128)
    b = kmv_sketch(_ids(spark, shared + b_only), "v", k=128)
    r = kmv_overlap_estimate(a, b, k=128).collect()[0]
    # true J = 500/1500 = 0.3333; KMV error ~ 1/sqrt(k)
    assert 2000 < r.jaccard_bp < 4700
    assert 200 < r.est_intersection < 1200   # true 500
    assert 1000 < r.est_union < 2300         # true 1500


def test_kmv_duckdb_parity(spark, tmp_path):
    import numpy as np
    import pandas as pd
    pd.DataFrame({"v": [f"k{i % 700}" for i in range(2000)]}) \
        .to_parquet(f"{tmp_path}/t.parquet")
    df = spark.read.parquet(f"{tmp_path}/t.parquet")
    a_sql = kmv_sketch_sql(f"read_parquet('{tmp_path}/t.parquet')", "v",
                           k=96)
    got = sorted(r.kmv_h for r in kmv_sketch(df, "v", k=96).collect())
    con = duckdb.connect()
    want = sorted(r[0] for r in con.execute(a_sql).fetchall())
    assert got == want
    # overlap row parity: first-half vs second-half value ranges
    pd.DataFrame({"v": [f"k{i}" for i in range(500)]}) \
        .to_parquet(f"{tmp_path}/a.parquet")
    pd.DataFrame({"v": [f"k{i}" for i in range(250, 750)]}) \
        .to_parquet(f"{tmp_path}/b.parquet")
    sa = kmv_sketch(spark.read.parquet(f"{tmp_path}/a.parquet"), "v", k=64)
    sb = kmv_sketch(spark.read.parquet(f"{tmp_path}/b.parquet"), "v", k=64)
    grow = kmv_overlap_estimate(sa, sb, k=64).collect()[0]
    osql = kmv_overlap_estimate_sql(
        kmv_sketch_sql(f"read_parquet('{tmp_path}/a.parquet')", "v", k=64),
        kmv_sketch_sql(f"read_parquet('{tmp_path}/b.parquet')", "v", k=64),
        k=64)
    w = con.execute(osql).fetchone()
    assert (grow.n_union_sketch, grow.n_both, grow.jaccard_bp,
            grow.est_union, grow.est_intersection) == tuple(w)


def test_kmv_sketch_plan_is_distributed_topk(spark):
    df = _ids(spark, [f"x{i}" for i in range(50)])
    plan = kmv_sketch(df, "v", k=8)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------------------------------
# script_profile


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")


def test_script_profile_detects_scripts(spark):
    texts = [
        "Hello plain English text.",
        "Привет мир, это русский текст",
        "这是一段中文文本内容测试",
        "こんにちは世界 ひらがな",
        "안녕하세요 세계",
        "مرحبا بالعالم",
        "שלום עולם",
        "नमस्ते दुनिया",
        "Γειά σου Κόσμε",
        "12345 !!! ???",
    ]
    rows = {r.doc_id: r for r in script_profile(_docs(spark, texts)).collect()}
    assert rows[0].dominant_script == "latin" and rows[0].nonascii_bp == 0
    assert rows[1].dominant_script == "cyrillic"
    assert rows[2].dominant_script == "cjk"
    # kana page: hiragana dominates only if its count beats the kanji
    assert rows[3].dominant_script in ("kana", "cjk")
    assert rows[3].n_kana > 0 and rows[3].n_cjk > 0   # mixed-script flag
    assert rows[4].dominant_script == "hangul"
    assert rows[5].dominant_script == "arabic"
    assert rows[6].dominant_script == "hebrew"
    assert rows[7].dominant_script == "devanagari"
    assert rows[8].dominant_script == "greek"
    assert rows[9].dominant_script == "none"
    assert rows[1].nonascii_bp > 5000


def test_script_profile_vietnamese_is_latin(spark):
    # Latin Extended Additional (U+1E00-U+1EFF) counts as latin;
    # the multiplication/division signs × ÷ do NOT (r12 range fix)
    rows = {r.doc_id: r for r in script_profile(_docs(spark, [
        "Tiếng Việt là ngôn ngữ của người Việt",   # Vietnamese
        "3 × 4 ÷ 2",                                # math signs only
    ])).collect()}
    assert rows[0].dominant_script == "latin"
    assert rows[0].n_other == 0
    assert rows[1].dominant_script == "none"
    assert rows[1].n_latin == 0 and rows[1].n_other == 2


def test_script_profile_other_bucket(spark):
    rows = script_profile(_docs(spark, ["৳৳৳ abc"])).collect()[0]
    # Bengali currency sign: outside every listed script, non-ASCII
    assert rows.n_other == 3
    assert rows.n_latin == 3


def test_script_profile_duckdb_parity(spark, tmp_path):
    import pandas as pd
    texts = ["Hello world", "Привет мир", "中文 and English 混合",
             "مرحبا abc", "", "12345", "한국어 텍스트 테스트입니다"]
    pd.DataFrame({"doc_id": range(len(texts)), "text": texts}) \
        .to_parquet(f"{tmp_path}/d.parquet")
    df = spark.read.parquet(f"{tmp_path}/d.parquet")
    cols = (["doc_id", "n_chars"]
            + [f"n_{n}" for n, _ in SCRIPT_RANGES]
            + ["n_other", "dominant_script", "nonascii_bp"])
    got = sorted(tuple(r[c] for c in cols)
                 for r in script_profile(df).collect())
    con = duckdb.connect()
    want = sorted(tuple(r) for r in con.execute(script_profile_sql(
        f"read_parquet('{tmp_path}/d.parquet')")).fetchall())
    assert got == want


def test_script_profile_plan_is_native(spark):
    df = _docs(spark, ["abc"])
    plan = script_profile(df)._jdf.queryExecution() \
        .executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                   "Exchange"):
        assert marker not in plan


def test_kmv_overlap_empty_sketches(spark):
    """Two empty slices are a legitimate planning query — must return
    a zero row, not an ANSI divide-by-zero."""
    empty = spark.createDataFrame([], "v string")
    a = kmv_sketch(empty, "v", k=16)
    r = kmv_overlap_estimate(a, a, k=16).collect()[0]
    assert (r.n_union_sketch, r.n_both, r.jaccard_bp,
            r.est_union, r.est_intersection) == (0, 0, 0, 0, 0)


# ---------------------------------------------------------------------------
# ngram_novelty


def test_ngram_novelty_basic(spark):
    from enrich_spark.datapipe.dedup import ngram_novelty
    docs = spark.createDataFrame([
        (1, "the quick brown fox jumps"),      # shares 'the quick brown' w/ 2
        (2, "the quick brown cat sleeps"),
        (3, "completely different words here"),
    ], "doc_id long, text string")
    rows = {r.doc_id: r for r in ngram_novelty(docs, n=3).collect()}
    # doc 1 grams: 'the quick brown', 'quick brown fox', 'brown fox jumps'
    assert rows[1].n_grams == 3
    assert rows[1].n_novel == 2          # 'the quick brown' shared
    assert rows[1].novelty_bp == 6666
    assert rows[3].n_novel == rows[3].n_grams == 2
    assert rows[3].novelty_bp == 10000


def test_ngram_novelty_short_doc_whole_text_gram(spark):
    from enrich_spark.datapipe.dedup import ngram_novelty
    docs = spark.createDataFrame([
        (1, "tiny doc"), (2, "tiny doc"), (3, "other"),
    ], "doc_id long, text string")
    rows = {r.doc_id: r for r in ngram_novelty(docs, n=5).collect()}
    assert rows[1].n_grams == 1 and rows[1].n_novel == 0   # duplicated
    assert rows[3].novelty_bp == 10000


def test_ngram_novelty_duckdb_parity(spark, tmp_path):
    import pandas as pd

    from enrich_spark.datapipe.dedup import ngram_novelty, ngram_novelty_sql
    texts = [f"alpha beta gamma delta doc{i % 7} epsilon zeta w{i % 3}"
             for i in range(60)] + ["", "one", "shared tail phrase here"]
    pd.DataFrame({"doc_id": range(len(texts)), "text": texts}) \
        .to_parquet(f"{tmp_path}/d.parquet")
    df = spark.read.parquet(f"{tmp_path}/d.parquet")
    got = sorted((r.doc_id, r.n_grams, r.n_novel, r.novelty_bp)
                 for r in ngram_novelty(df, n=3).collect())
    want = sorted(tuple(r) for r in duckdb.connect().execute(
        ngram_novelty_sql(f"read_parquet('{tmp_path}/d.parquet')", n=3))
        .fetchall())
    assert got == want


def test_ngram_novelty_plan_no_pair_join(spark):
    from enrich_spark.datapipe.dedup import ngram_novelty
    docs = spark.createDataFrame(
        [(i, f"w{i} x y z q{i}") for i in range(20)],
        "doc_id long, text string")
    plan = ngram_novelty(docs, n=3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# pipeline-runner integration of the r11 operators


def test_pipeline_script_and_novelty_ops(spark):
    from enrich_spark.datapipe.pipeline import run_pipeline
    docs = spark.createDataFrame([
        (1, "the quick brown fox jumps over the lazy dog", "web"),
        (2, "the quick brown fox jumps over the lazy dog", "web"),
        (3, "Привет мир это русский текст для проверки", "web"),
        (4, "novel words entirely unlike anything else here", "web"),
    ], "doc_id long, text string, source string")
    report = []
    out = run_pipeline(docs, [
        {"op": "script_profile"},
        {"op": "keep_scripts", "scripts": ["latin"]},
        {"op": "ngram_novelty", "n": 3},
        {"op": "min_novelty", "threshold_bp": 5000},
    ], report=report)
    rows = {r.doc_id for r in out.collect()}
    # doc 3 dropped by script filter; docs 1/2 are mutual duplicates
    # (novelty 0); doc 4 fully novel survives
    assert rows == {4}
    assert [r for _, r in report] == [4, 3, 3, 1]


def test_kmeans_training_improves_real_embedding_cohesion(spark):
    """Composition check on the REAL embeddings table: full-corpus
    Lloyd iterations from the deterministic vec_id<16 init must not
    reduce — and in practice raise — mean assignment cohesion."""
    import os

    from pyspark.sql import functions as F2

    from enrich_spark.datapipe.similarity import (
        cluster_assign, kmeans_iterate,
    )
    sf = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
    vecs = spark.read.parquet(f"{sf}/embeddings.parquet").select(
        "vec_id",
        F2.transform("embedding", lambda x: x.cast("double"))
        .alias("embedding"))
    init = [(int(r[0]), [float(x) for x in r[1]])
            for r in vecs.where(F2.col("vec_id") < 16).collect()]

    def cohesion(cents):
        rows = cluster_assign(vecs, cents).collect()
        return sum(r.sim_bp for r in rows) / len(rows)

    c0 = cohesion(init)
    trained = kmeans_iterate(vecs, init, iters=2)
    c2 = cohesion(trained)
    assert c2 >= c0            # Lloyd monotonicity on the same metric
    assert c2 > c0 + 50        # and a real gain on this data (bp)


# ---------------------------------------------------------------------------
# containment_pairs


def test_containment_catches_what_jaccard_misses(spark):
    from enrich_spark.datapipe.dedup import (
        containment_pairs, ngram_jaccard_pairs,
    )
    quote = "alpha beta gamma delta epsilon zeta"
    long_doc = ("alpha " + " ".join(f"filler{i}" for i in range(40))
                + " " + quote)
    short_doc = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [(1, long_doc), (2, short_doc)], "doc_id long, text string")
    jac = ngram_jaccard_pairs(docs, shingle_k=3, threshold=0.5).collect()
    assert jac == []                      # Jaccard misses the quote
    cont = containment_pairs(docs, shingle_k=3,
                             threshold_bp=8000).collect()
    assert len(cont) == 1
    r = cont[0]
    assert (r.id_a, r.id_b) == (1, 2)
    assert r.contain_b_bp == 10000        # short doc fully inside long
    assert r.contain_a_bp < 2000
    assert r.jaccard_bp < 2000


def test_containment_duckdb_parity(spark, tmp_path):
    import pandas as pd

    from enrich_spark.datapipe.dedup import (
        containment_pairs, containment_pairs_sql,
    )
    texts = []
    for i in range(25):
        body = " ".join(f"w{(i * 7 + j) % 9}" for j in range(10))
        texts.append(f"block{i % 3} {body}")
    texts.append("block0 " + texts[0].split(" ", 1)[1])   # exact dup
    pd.DataFrame({"doc_id": range(len(texts)), "text": texts}) \
        .to_parquet(f"{tmp_path}/d.parquet")
    df = spark.read.parquet(f"{tmp_path}/d.parquet")
    got = sorted(tuple(r) for r in containment_pairs(
        df, shingle_k=3, threshold_bp=5000).collect())
    want = sorted(tuple(r) for r in duckdb.connect().execute(
        containment_pairs_sql(f"read_parquet('{tmp_path}/d.parquet')",
                              shingle_k=3, threshold_bp=5000)).fetchall())
    assert got == want and len(got) > 0


def test_containment_prefix_filter_is_exact(spark):
    # the prefix-filtered scale path must return EXACTLY the all-pairs
    # brute-force containment set — completeness is the guarantee
    from pyspark.sql import functions as F

    from enrich_spark.datapipe.dedup import (
        containment_pairs, containment_pairs_prefix,
    )
    quote = "alpha beta gamma delta epsilon zeta"
    docs = [
        # quote pair that does NOT share a first token — the blocked
        # brute misses it, the prefix path must not
        (1, "intro words here " + quote + " closing remarks follow now"),
        (2, quote),
        (3, "the quick brown fox jumps over the lazy dog"),
        (4, "the quick brown fox jumped over the lazy dog"),
        (5, "completely different content about spark engines"),
        (6, "spark engines process completely different content"),
        (7, "one"),
        (8, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    ]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    for tb in (3000, 5000, 8000, 10000):
        got = sorted(tuple(r) for r in containment_pairs_prefix(
            df, shingle_k=2, threshold_bp=tb).collect())
        want = sorted(tuple(r) for r in containment_pairs(
            df, shingle_k=2, threshold_bp=tb,
            block_col=F.lit(1)).collect())   # all-pairs brute
        assert got == want, f"threshold_bp {tb}"
        assert len(got) > 0 or tb == 10000
    # the cross-block quote pair specifically
    got = {(r.id_a, r.id_b): r.contain_b_bp
           for r in containment_pairs_prefix(
               df, shingle_k=2, threshold_bp=8000).collect()}
    assert got.get((1, 2)) == 10000


def test_containment_prefix_duckdb_parity_and_plan(spark, tmp_path):
    import pandas as pd

    from enrich_spark.datapipe.dedup import (
        containment_pairs_prefix, containment_pairs_sql,
    )
    texts = []
    for i in range(25):
        body = " ".join(f"w{(i * 7 + j) % 9}" for j in range(10))
        texts.append(f"block{i % 3} {body}")
    texts.append("blockX " + texts[0].split(" ", 1)[1])  # cross-block dup
    pd.DataFrame({"doc_id": range(len(texts)), "text": texts}) \
        .to_parquet(f"{tmp_path}/d.parquet")
    df = spark.read.parquet(f"{tmp_path}/d.parquet")
    out = containment_pairs_prefix(df, shingle_k=3, threshold_bp=5000)
    got = sorted(tuple(r) for r in out.collect())
    want = sorted(tuple(r) for r in duckdb.connect().execute(
        containment_pairs_sql(f"read_parquet('{tmp_path}/d.parquet')",
                              shingle_k=3, threshold_bp=5000,
                              blocked=False)).fetchall())
    assert got == want and len(got) > 0
    # plan contract: candidates come from a shingle equi-join — never a
    # cartesian/broadcast-nested-loop product, never a first-word block
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
