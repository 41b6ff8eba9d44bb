"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Headline set: the full enrichment pipeline (the engine's core), the
dedup family, ANN, and text analysis — i.e. one representative per
operator group in SURVEY.md §2 + the beyond-reference data-pipeline ops.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    import __spark_entry__ as entrymod
    from enrich_spark.session import get_spark

    spark = get_spark("enrich-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = entrymod.bench_queries()
    headline = [
        "transform_atomic",       # adapter+transform+full enrich chain
        "event_fingerprint",      # full chain, crypto-hash projection
        "ip_lookups",             # broadcast range join
        "bad_row_split",          # error-accumulation path
        "adapter_explode",        # 1→N payload explode
        "sql_lookup_join",        # broadcast lookup-join enrichment
        "asn_bot_detection",      # range join + context consolidation
        "tsv_serialize",          # 131-column enriched-sink TSV assembly
        "payload_decompress",     # gzip de-batch explode + size guards
        "thrift_loader",          # TBinaryProtocol decode UDF + routing
        "metadata_aggregation",   # the one true aggregation
        "sessionize",             # stateful window (beyond-reference)
        "dedup_exact",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "dedup_ngram_jaccard",    # PPJoin prefix-filter candidate join
        "dedup_despan",           # substring-dup span CUT (Lee et al. 2022)
        "decontam_multi",         # multi-eval-set n-gram decontamination
        "ann_cosine_topk",
        "ann_ivf_topk",           # IVF scale path: map-side list assignment
        "ann_lsh_topk",           # hyperplane-LSH bucketed top-k
        "embedding_dup_pairs",
        "text_quality_score",
        "text_token_counts",
        "text_language_id",       # trigram + Unicode-script language ID
        "text_pii_scrub",         # native regexp PII redaction + counts
        "data_mix",               # stratified sampling + sequence packing
        "quality_model_score",    # linear bag-of-words classifier scoring
        "corpus_stats",           # per-source profile, exact percentiles
        "doc_fingerprint",
        "multimodal_frames",      # native frame-sample sequence+explode
        "multimodal_decode",      # mapInPandas media decode (real kernels)
        "script_js",              # real-JS enrichment via the Node sidecar
        "bpe_tokenize",           # literal-replace-chain subword tokenize
        "url_normalize",          # crawl-frontier URL canonicalization
        "html_extract",           # WET-style boilerplate extraction
        "warc_parse",             # WARC record explode (mapInPandas)
        "cluster_stats",          # k-means assignment + integer rollup
        "bm25_rank",              # Okapi BM25 vs fixed query terms
        "heavy_hitters",          # Misra-Gries candidates + exact confirm
        "semantic_dedup",         # SemDeDup cluster-bounded cosine prune
        "decontam_bloom",         # Bloom broadcast + exact confirm join
        "cdc_merge",              # latest-wins snapshot merge (delta shuffle)
        "k_anonymity",            # QI equivalence-class risk audit
        "pagerank",               # fixed-point link-graph power iteration
        "dataset_manifest",       # order-independent content commitment
        "robots_filter",          # RFC 9309 longest-match frontier filter
    ]

    # warm the JVM + parquet footers with one cheap action
    entrymod._load_events(spark, sf_dir).limit(1).collect()

    # Steady-state measurement: run each query once to warm the codegen
    # cache (Janino compile of the 131-column projection is a one-time
    # driver cost — amortized to zero in the streaming/large-batch
    # deployments this engine targets), then take the MEDIAN of 3 warm
    # runs — a single warm sample is hostage to sandbox noisy neighbors
    # (r3's recorded 31.9 s vs a reproducible 22.8 s).
    n_warm = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in headline:
        fn = queries[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        cold[name] = round(time.perf_counter() - t0, 3)
        samples = []
        for _ in range(n_warm):
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        timings[name] = round(samples[len(samples) // 2], 3)
        spread = round(samples[-1] - samples[0], 3)
        print(f"# {name}: warm median {timings[name]}s "
              f"(spread {spread}s over {n_warm} runs, cold {cold[name]}s, {n} rows)",
              file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
