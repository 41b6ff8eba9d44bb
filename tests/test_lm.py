"""Stupid-backoff n-gram LM scoring (datapipe/lm.py) — unit +
engine-parity tests."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from enrich_spark.datapipe.lm import (
    lm_counts, lm_counts_sql, lm_score, lm_score_sql,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")


TRAIN = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "a cat and a dog",
]


def test_lm_counts_exact(spark):
    got = {(r.gram, r.n): r.cnt
           for r in lm_counts(_docs(spark, TRAIN)).collect()}
    assert got[("the", 1)] == 4
    assert got[("sat", 1)] == 2
    assert got[("a", 1)] == 2
    assert got[("the cat", 2)] == 1
    assert got[("sat on", 2)] == 2
    assert got[("on the", 2)] == 2
    assert ("cat sat", 2) in got
    # totals: 17 tokens, 14 bigrams
    assert sum(c for (g, n), c in got.items() if n == 1) == 17
    assert sum(c for (g, n), c in got.items() if n == 2) == 14


def test_lm_score_matches_manual_backoff(spark):
    """Replay the stupid-backoff arithmetic by hand for one doc:
    bigram branch, backoff-to-unigram branch, OOV floor, first-token
    unigram — and the integer micro-unit flooring."""
    counts = lm_counts(_docs(spark, TRAIN))
    uni = {r.gram: r.cnt for r in counts.where("n = 1").collect()}
    big = {r.gram: r.cnt for r in counts.where("n = 2").collect()}
    T = float(sum(uni.values()))

    text = "the cat zorp on the mat"
    got = lm_score(_docs(spark, [text]), counts).collect()[0]

    def s(tok, prev):
        if prev is None:
            return math.log10(uni.get(tok, 1.0) / T)
        bg = f"{prev} {tok}"
        if bg in big:
            return math.log10(big[bg] / uni[prev])
        return math.log10(0.4 * uni.get(tok, 1.0) / T)

    words = text.split()
    lps = [math.floor(1e6 * s(w, words[i - 1] if i else None))
           for i, w in enumerate(words)]
    assert got.n_tokens == 6
    assert got.logp_micro == sum(lps)
    # Spark `div` and DuckDB `//` both truncate toward zero on
    # negatives (verified); Python's // floors — replay the truncation
    tot = sum(lps)
    assert got.avg_logp_micro == (tot // 6 if tot >= 0
                                  else -((-tot) // 6))
    # the OOV token ('zorp' after 'cat': backoff x OOV floor) is the
    # worst-scored branch
    assert min(lps) == lps[2]


def test_lm_score_orders_quality(spark):
    """A fluent in-domain doc outscores shuffled word salad under the
    same counts — the CCNet filtering property."""
    counts = lm_counts(_docs(spark, TRAIN))
    docs = _docs(spark, [
        "the cat sat on the mat",            # seen verbatim
        "mat the on sat cat the",            # same tokens, shuffled
    ])
    got = {r.doc_id: r.avg_logp_micro
           for r in lm_score(docs, counts).collect()}
    assert got[0] > got[1]


def test_lm_duckdb_parity(spark, tmp_path):
    import pandas as pd

    texts = TRAIN + [
        "the cat sat on the unknown mat",
        "completely novel words here",
        "", "a", "the the the the",
    ]
    pd.DataFrame({"doc_id": range(len(texts)), "text": texts}) \
        .to_parquet(f"{tmp_path}/d.parquet")
    df = spark.read.parquet(f"{tmp_path}/d.parquet")
    src = f"read_parquet('{tmp_path}/d.parquet')"

    counts = lm_counts(df)
    got_counts = sorted(tuple(r) for r in counts.collect())
    con = duckdb.connect()
    want_counts = sorted(tuple(r) for r in
                         con.execute(lm_counts_sql(src)).fetchall())
    assert got_counts == want_counts

    got = sorted(tuple(r) for r in lm_score(df, counts).collect())
    want = sorted(tuple(r) for r in con.execute(
        lm_score_sql(src, lm_counts_sql(src))).fetchall())
    assert got == want and len(got) == len(texts)


def test_lm_score_plan_no_python_no_window(spark):
    counts = lm_counts(_docs(spark, TRAIN))
    plan = lm_score(_docs(spark, TRAIN), counts)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" not in plan
    assert "PythonUDF" not in plan and "mapInPandas" not in plan.lower()


# ---------------------------------------------------------------------------
# token_divergence


def test_token_divergence_semantics(spark):
    """Identical corpora → zero-ish divergence (micro-floor can bias
    each per-token term to −1); drifted corpora → clearly positive JS;
    KL directions pick out the drifted tokens."""
    from enrich_spark.datapipe.lm import (
        divergence_summary, lm_counts, token_divergence,
    )
    a = lm_counts(_docs(spark, TRAIN))
    same = divergence_summary(token_divergence(a, a)).collect()[0]
    v = same.vocab
    assert same.tokens_a == same.tokens_b == 17
    # p == q per token → true contribution 0; floor may emit −1
    assert -v <= same.js_micro <= 0
    assert -v <= same.kl_ab_micro <= 0

    b = lm_counts(_docs(spark, [
        "zebra zebra zebra zebra zebra quagga",
        "the zebra sat on the zebra",
    ]))
    per = token_divergence(a, b)
    drift = divergence_summary(per).collect()[0]
    assert drift.js_micro > 1000 * same.js_micro + 1000
    assert drift.js_micro > 0
    # the most b-heavy token by KL(b||a) contribution is 'zebra'
    top = per.orderBy(F.desc("kl_ba_micro")).limit(1).collect()[0]
    assert top.gram == "zebra" and top.cnt_a == 0 and top.cnt_b == 7


def test_token_divergence_duckdb_parity(spark, tmp_path):
    import pandas as pd

    from enrich_spark.datapipe.lm import (
        lm_counts, lm_counts_sql, token_divergence, token_divergence_sql,
    )
    ta = TRAIN + ["extra alpha beta", ""]
    tb = ["the dog ran", "beta beta gamma", "a dog a log"]
    pd.DataFrame({"doc_id": range(len(ta)), "text": ta}) \
        .to_parquet(f"{tmp_path}/a.parquet")
    pd.DataFrame({"doc_id": range(len(tb)), "text": tb}) \
        .to_parquet(f"{tmp_path}/b.parquet")
    da = spark.read.parquet(f"{tmp_path}/a.parquet")
    db = spark.read.parquet(f"{tmp_path}/b.parquet")
    got = sorted(tuple(r) for r in token_divergence(
        lm_counts(da), lm_counts(db)).collect())
    con = duckdb.connect()
    want = sorted(tuple(r) for r in con.execute(token_divergence_sql(
        lm_counts_sql(f"read_parquet('{tmp_path}/a.parquet')"),
        lm_counts_sql(f"read_parquet('{tmp_path}/b.parquet')"),
    )).fetchall())
    assert got == want and len(got) > 10


def test_token_divergence_tagged_parity(spark):
    """r14: the one-pass side-tagged form returns the exact rows of the
    two-lm_counts + outer-join form — including docs matching NEITHER
    side (excluded from the joint vocabulary) and a NULL side
    predicate (excludes, like .where)."""
    from enrich_spark.datapipe.lm import (
        lm_counts, token_divergence, token_divergence_tagged,
    )
    texts = TRAIN + ["zebra zebra quagga", "the dog ran",
                     "beta beta gamma", "orphan words here", ""]
    # side key: doc_id % 3 == 0 → a, == 1 → b, == 2 → neither
    docs = _docs(spark, texts)
    side_a = F.col("doc_id") % 3 == 0
    side_b = F.col("doc_id") % 3 == 1
    want = sorted(tuple(r) for r in token_divergence(
        lm_counts(docs.where(side_a)),
        lm_counts(docs.where(side_b))).collect())
    got = sorted(tuple(r) for r in token_divergence_tagged(
        docs, side_a, side_b).collect())
    assert got == want and len(got) > 5


def test_lm_score_string_join_parity_switch(spark):
    """r14 (r13 advice): hash_join_keys=False joins bigrams on the raw
    string — the collision-proof attribution path. Same scores as the
    default int64-hash join on a collision-free vocabulary."""
    counts = lm_counts(_docs(spark, TRAIN))
    docs = _docs(spark, ["the cat sat on the log",
                         "zebra quantum flux", ""])
    hashed = sorted(tuple(r) for r in lm_score(docs, counts).collect())
    strung = sorted(tuple(r) for r in lm_score(
        docs, counts, hash_join_keys=False).collect())
    assert hashed == strung
