"""Scaling-curve measurement (r10): run the heavy operator families at
several multiples of sf0.1 and report wall-time ratios, converting
SCALE.md's plan-shape linearity argument into a measured curve.

Input construction: the driver ships sf0.001/0.01/0.1 only, so larger
inputs are built BY REPLICATION of the sf0.1 parquet — M id-shifted
copies (events), and for documents each replica's words are suffixed
with the replica index so replicas are NOT near-duplicates of each
other: the dup/candidate structure per replica is identical to sf0.1,
which is exactly the property a linearity test needs (naive replication
would grow every LSH bucket M-fold and measure a quadratically harder
problem, not a bigger corpus).

Methodology mirrors bench.py: one fresh JVM per multiplier (child
mode `--scale M`), an untimed cold pass per family, then
SPARK_GRAFT_BENCH_RUNS (default 3) timed runs, warm median reported.

Usage:
    python tools/bench_scaling.py                 # M = 1, 3, 10
    python tools/bench_scaling.py --mults 1,10
Prints one JSON line:
    {"metric": "scaling_curve", "base_sf": 0.1, "families": {...}}
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

BASE_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALE_ROOT = os.environ.get("SPARK_GRAFT_SCALE_ROOT",
                            "/tmp/enrich_spark_scale")

# family name -> bench_queries() key (the single-operator variants)
FAMILIES = {
    "transform_chain": "transform_atomic",
    "minhash_lsh": "dedup_minhash_lsh",
    "decontam": "decontam_multi",
    "ip_lookups": "ip_lookups",
    # r10 operators: the line-frequency shuffle should scale with input;
    # the bounded-driver ops (threshold table / rep map / top-k) should
    # stay shuffle-light at any multiple
    "boilerplate_lines": "boilerplate_lines",
    "quantile_bins": "quantile_bins",
    "weighted_sample": "weighted_sample",
    "negative_samples": "negative_samples",
    "token_budget_select": "token_budget_select",
    "multimodal_resize": "multimodal_resize",
    # r11: the aggregation-shaped families — the r10 curve covered
    # join/map shapes; groupBy(collect_set) / groupBy(md5-sorted-map) /
    # serialize / range-join rollup are where key skew would surface
    "metadata_aggregation": "metadata_aggregation",
    "event_fingerprint": "event_fingerprint",
    "tsv_serialize": "tsv_serialize",
    "asn_bot_detection": "asn_bot_detection",
    # r11 wave 2/3: the Arrow-batched Gram pass should track input
    # linearly (its shuffle is a constant 2145 keys); the sketch /
    # skew / script families are one-groupBy or map-side shapes
    "pca_fit": "pca_fit",
    "key_skew": "key_skew",
    "kmv_overlap": "kmv_overlap",
    "script_profile": "script_profile",
    # the two heavier corpus passes of r11 wave 3/4: novelty's gram
    # doc-frequency shuffle scales with input; the Lloyd update is a
    # map-side scan + k-row aggregate
    "ngram_novelty": "ngram_novelty",
    "kmeans_update": "kmeans_update",
    # r12: the prefix-filtered containment join is the round's heavy
    # pair family; the salted domain_cap validates the two-phase
    # top-cap's scaling; the fingerprint-dedup rows exercise
    # mapInPandas hash + banded join at media scale; lm/drift/chat are
    # vocabulary- or conversation-bounded shuffles
    "containment_prefix": "containment_pairs_prefix",
    "domain_cap": "domain_cap",
    "multimodal_dedup": "multimodal_dedup",
    "audio_dedup": "audio_dedup",
    "lm_score": "lm_score",
    "token_drift": "token_drift",
    "chat_pack": "chat_pack",
    # r13: the incremental banded-index join should scale with the
    # increment+index sizes (both grow with the corpus here — the
    # interesting property is NO quadratic pair blowup); sft_dedup
    # chains chat window → masked simhash → label propagation
    "incremental_fp": "incremental_fp",
    "sft_dedup": "sft_dedup",
    "preference_pairs": "preference_pairs",
    # r14: the fence split is a pure projection (should be exactly
    # input-linear); sft_decontam is chat window + broadcast gram
    # check — the benchmark side is FIXED while the corpus grows, so
    # the curve isolates the conversation-window cost
    "extract_code": "extract_code",
    "sft_decontam": "sft_decontam",
}
ID_SHIFT = 10_000_000


def build_scaled_dir(spark, mult: int) -> str:
    """sf0.1 × mult at SCALE_ROOT/x{mult}: every table symlinked,
    events/documents rewritten as id-shifted (and word-perturbed)
    replicas. Idempotent."""
    out = os.path.join(SCALE_ROOT, f"x{mult}")
    # _v2: r11 added embeddings replication (the PCA/recall families) —
    # older dirs carried a symlinked, unscaled embeddings table
    marker = os.path.join(out, ".complete_v2")
    if os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    for name in os.listdir(BASE_SF_DIR):
        if name not in ("events.parquet", "documents.parquet",
                        "embeddings.parquet"):
            os.symlink(os.path.join(BASE_SF_DIR, name),
                       os.path.join(out, name))

    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod

    rep = F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("_rep")

    ev = entrymod._load_events(spark, BASE_SF_DIR).select("*", rep)
    id_cols = [c for c, t in ev.dtypes
               if c.endswith("_id") and t in ("bigint", "long")]
    for c in id_cols:
        ev = ev.withColumn(c, F.col(c) + F.col("_rep") * ID_SHIFT)
    (ev.drop("_rep").repartition(32)
       .write.mode("overwrite")
       .parquet(os.path.join(out, "events.parquet")))

    docs = spark.read.parquet(
        os.path.join(BASE_SF_DIR, "documents.parquet")).select("*", rep)
    docs = (docs
            .withColumn("doc_id",
                        F.col("doc_id") + F.col("_rep") * ID_SHIFT)
            # suffix every word with the replica index (replica 0 stays
            # byte-identical) → replicas are mutually NOT near-dups
            .withColumn(
                "text",
                F.when(F.col("_rep") == 0, F.col("text")).otherwise(
                    F.regexp_replace(
                        F.col("text"), r"(\S+)",
                        F.concat(F.lit("$1r"),
                                 F.col("_rep").cast("string"))))))
    (docs.drop("_rep").repartition(32)
         .write.mode("overwrite")
         .parquet(os.path.join(out, "documents.parquet")))

    # embeddings: id-shifted replicas with IDENTICAL vectors — right
    # for the Gram/sketch-shaped families measured here (sums scale
    # with rows); the dup-pair families keep measuring on the base
    # table and are not in this curve's embedding set
    emb = spark.read.parquet(
        os.path.join(BASE_SF_DIR, "embeddings.parquet")).select("*", rep)
    emb = emb.withColumn("vec_id",
                         F.col("vec_id") + F.col("_rep") * ID_SHIFT)
    (emb.drop("_rep").repartition(8)
        .write.mode("overwrite")
        .parquet(os.path.join(out, "embeddings.parquet")))
    open(marker, "w").close()
    return out


def _selected_families() -> dict:
    if "--families" in sys.argv:
        names = sys.argv[sys.argv.index("--families") + 1].split(",")
        return {n: FAMILIES[n] for n in names}
    return FAMILIES


def _run_scale(mult: int) -> None:
    """Child: fresh JVM, build (or reuse) the scaled dir, measure every
    family, one JSON line per family on stdout."""
    import __spark_entry__ as entrymod
    from enrich_spark.session import get_spark

    spark = get_spark(f"enrich-spark-scale-x{mult}")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = build_scaled_dir(spark, mult)
    queries = entrymod.bench_queries()
    n_warm = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    for fam, key in _selected_families().items():
        fn = queries[key]
        before = set(entrymod._FIXTURE_CACHE)
        t0 = time.perf_counter()
        rows = fn(spark, sf_dir).count()          # cold (untimed)
        cold = round(time.perf_counter() - t0, 3)
        samples = []
        for _ in range(n_warm):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        for k in set(entrymod._FIXTURE_CACHE) - before:
            df = entrymod._FIXTURE_CACHE.pop(k, None)
            if df is not None:
                df.unpersist()
        print(json.dumps({
            "family": fam, "mult": mult, "rows": rows,
            "warm_median": round(samples[len(samples) // 2], 3),
            "cold": cold,
            "spread": round(samples[-1] - samples[0], 3),
        }), flush=True)


def main() -> None:
    if "--scale" in sys.argv:
        _run_scale(int(sys.argv[sys.argv.index("--scale") + 1]))
        return

    mults = [1, 3, 10]
    if "--mults" in sys.argv:
        mults = [int(m) for m in
                 sys.argv[sys.argv.index("--mults") + 1].split(",")]

    fams_sel = _selected_families()
    results: dict[str, dict[int, dict]] = {f: {} for f in fams_sel}
    for mult in mults:
        child = [sys.executable, os.path.abspath(__file__),
                 "--scale", str(mult)]
        if "--families" in sys.argv:
            child += ["--families", ",".join(fams_sel)]
        proc = subprocess.run(child, stdout=subprocess.PIPE, text=True)
        if proc.returncode != 0:
            print(f"# scale x{mult} exited {proc.returncode}",
                  file=sys.stderr)
        for line in proc.stdout.splitlines():
            line = line.strip()
            if not line.startswith("{"):
                continue
            rec = json.loads(line)
            results[rec["family"]][rec["mult"]] = rec
            print(f"# x{rec['mult']} {rec['family']}: "
                  f"{rec['warm_median']}s ({rec['rows']} rows)",
                  file=sys.stderr)

    base = mults[0]
    fams = {}
    for fam, by_mult in results.items():
        if base not in by_mult:
            continue
        t1 = by_mult[base]["warm_median"]
        fams[fam] = {
            str(m): {
                "sec": by_mult[m]["warm_median"],
                "rows": by_mult[m]["rows"],
                "ratio_vs_x1": round(by_mult[m]["warm_median"]
                                     / max(t1, 1e-9), 2),
            }
            for m in mults if m in by_mult
        }
    print(json.dumps({"metric": "scaling_curve", "base_sf": 0.1,
                      "mults": mults, "families": fams}))


if __name__ == "__main__":
    main()
