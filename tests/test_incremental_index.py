"""Plan-contract E2E for the bucketed-index O(increment) claim.

build_fingerprint_index / build_minhash_index docstrings promise:
"write the index bucketed on (band, bhash); each ingest increment
joins against the stored index — O(increment), never O(corpus)".
Until r14 that was prose. These tests make it a plan contract:

  corpus index  --write_bucketed(band, bhash)-->  catalog table
  increment     --incremental_*_pairs(index)--->  pairs

  bucketed read : exactly ONE band-keyed Exchange in the final plan,
                  and it is on the INCREMENT side (the bucketed
                  FileScan itself reports `Bucketed: true`);
  plain read    : TWO band-keyed Exchanges (the corpus reshuffles on
                  every ingest).

(The pair-dedup shuffle on (new_id, corpus_id) above the join exists
in both layouts and is sized by the OUTPUT, not the corpus — it is
excluded from the count by its key.)

Same rows either way — bucketing is a physical-layout contract, not a
semantic one. At 100 TB the difference is re-shuffling the corpus per
ingest vs touching only the increment.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from enrich_spark.datapipe import dedup as D
from enrich_spark.plans import bucketing as B


@pytest.fixture()
def no_broadcast(spark):
    """SMJ-vs-SMJ comparison: disable broadcast so the exchange count
    is the shuffle count (same control as test_bucketing)."""
    confs = ("spark.sql.autoBroadcastJoinThreshold",
             "spark.sql.adaptive.autoBroadcastJoinThreshold")
    for c in confs:
        spark.conf.set(c, "-1")
    yield
    for c in confs:
        spark.conf.unset(c)


def _final_plan(df) -> str:
    """AQE's executedPlan toString carries BOTH the final and the
    initial plan — contract assertions must read only the final one."""
    s = df._jdf.queryExecution().executedPlan().toString()
    if "== Final Plan ==" in s:
        s = s.split("== Final Plan ==")[1].split("== Initial Plan ==")[0]
    return s


def _band_exchanges(df) -> int:
    """Number of BAND-KEYED shuffles in the final plan — the join-side
    exchanges. (The pair dedup above the join shuffles on
    (new_id, corpus_id); it exists in both layouts and is not part of
    the corpus-side claim, so it is excluded by the key prefix.)"""
    return len(re.findall(r"Exchange hashpartitioning\(band",
                          _final_plan(df)))


def _corpus_side_is_bucketed(df) -> None:
    """The executed plan's index scan must be a bucket-aware read —
    the scan itself reports bucketing, so the one remaining band-keyed
    Exchange can only belong to the increment side."""
    plan = _final_plan(df)
    assert "Bucketed: true" in plan, plan
    assert "SelectedBucketsCount" in plan, plan


def test_incremental_hamming_index_no_corpus_exchange(spark, tmp_path,
                                                      no_broadcast):
    # corpus: 2000 synthetic 64-bit fingerprints; increment: 50 docs,
    # each one bit-flip away from a known corpus doc → hamming == 1
    corpus = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.xxhash64(F.col("id").cast("string")).alias("hash"))
    idx = D.build_fingerprint_index(corpus, max_hamming=3)
    B.write_bucketed(idx, "t_fp_index", ["band", "bhash"], 8,
                     path=str(tmp_path / "fp_idx"))
    try:
        new = spark.range(50).select(
            (F.col("id") + 100000).alias("doc_id"),
            F.xxhash64(F.col("id").cast("string"))
            .bitwiseXOR(F.lit(1)).alias("hash"))

        bucketed = D.incremental_hamming_pairs(
            new, spark.table("t_fp_index"), max_hamming=3)
        got = sorted((r["new_id"], r["corpus_id"], r["hamming"])
                     for r in bucketed.collect())
        assert got == [(i + 100000, i, 1) for i in range(50)]

        # THE contract: ONE band-keyed Exchange (the increment);
        # the corpus side arrives pre-partitioned from the bucketed
        # scan (Sort directly over FileScan, no shuffle)
        assert _band_exchanges(bucketed) == 1
        _corpus_side_is_bucketed(bucketed)

        # control: same files read as plain parquet lose the bucket
        # metadata — the corpus reshuffles, i.e. O(corpus) per ingest
        plain = D.incremental_hamming_pairs(
            new, spark.read.parquet(str(tmp_path / "fp_idx")),
            max_hamming=3)
        assert sorted((r["new_id"], r["corpus_id"], r["hamming"])
                      for r in plain.collect()) == got
        assert _band_exchanges(plain) == 2
    finally:
        spark.sql("DROP TABLE IF EXISTS t_fp_index")


def test_incremental_minhash_index_no_corpus_exchange(spark, tmp_path,
                                                      no_broadcast):
    # corpus: 300 shingled docs; increment: 20 docs copied verbatim
    # from the corpus under new ids → est_jaccard_bp == 10000
    words = F.array(*[F.concat(F.lit(f"w{j}_"),
                               ((F.col("id") + j) % 37).cast("string"))
                      for j in range(12)])
    corpus = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.array_join(words, " ").alias("text"))
    idx = D.build_minhash_index(corpus, num_hashes=16, bands=4,
                                shingle_k=3)
    B.write_bucketed(idx, "t_mh_index", ["band_id", "band_hash"], 8,
                     path=str(tmp_path / "mh_idx"))
    try:
        new = corpus.where(F.col("doc_id") < 20).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text")

        bucketed = D.incremental_dedup_pairs(
            new, spark.table("t_mh_index"), num_hashes=16, bands=4,
            shingle_k=3, sim_threshold=0.8)
        got = sorted((r["new_id"], r["corpus_id"], r["est_jaccard_bp"])
                     for r in bucketed.collect())
        exact = [(i + 100000, i, 10000) for i in range(20)]
        # verbatim copies MUST pair at 10000 bp; near-identical
        # neighbours (the +j mod-37 construction repeats shingles) may
        # legitimately pair too — assert the exact pairs are a subset
        assert set(exact) <= set(got)

        assert _band_exchanges(bucketed) == 1
        _corpus_side_is_bucketed(bucketed)

        plain = D.incremental_dedup_pairs(
            new, spark.read.parquet(str(tmp_path / "mh_idx")),
            num_hashes=16, bands=4, shingle_k=3, sim_threshold=0.8)
        assert sorted((r["new_id"], r["corpus_id"], r["est_jaccard_bp"])
                      for r in plain.collect()) == got
        assert _band_exchanges(plain) == 2
    finally:
        spark.sql("DROP TABLE IF EXISTS t_mh_index")
