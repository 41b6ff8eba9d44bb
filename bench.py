"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output contract (r12): the FULL per-query record {metric, value, unit,
queries, spreads, colds, sf} is written to an in-repo
BENCH_LOCAL_r{N}.json (N inferred from existing driver BENCH_r*.json
files), and stdout ends with ONE COMPACT JSON line {metric, value,
unit, sf, n_queries, detail_file} that fits the driver's ~2 KB tail
capture. At 73+ rows the old full-line-to-stdout form outgrew that
capture (BENCH_r11.json parsed:null), losing the round's per-query
history — the local file is now the durable record and
tools/bench_compare.py reads it.

Headline set: the full enrichment pipeline (the engine's core), the
dedup family, ANN, and text analysis — i.e. one representative per
operator group in SURVEY.md §2 + the beyond-reference data-pipeline ops.

Process-group isolation (r9): the r7→r8 suite grew 33→47 rows in ONE
JVM and every pre-existing row regressed ~34% with unchanged code — the
attribution A/B (SCALE.md "r9: suite-order pressure") showed isolated
re-runs at r7 levels, i.e. the slowdown was cumulative JVM state
(storage blocks from persisted fixtures, codegen cache, GC pressure
from ~1900 stages), not plans. The suite now runs as a handful of
sequential subprocess groups — each group a fresh JVM — and each
query's synthesized fixtures are unpersisted as soon as its samples are
taken. Group wall-clock overhead (JVM start) is NOT measured: the
metric is the sum of per-query warm medians, same as before.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
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
    "dsir_select",            # DSIR importance weights (broadcast join)
    "pq_adc_topk",            # product-quantization ADC top-k
    "remote_adapter",         # HTTP-translator adapter path
    "leakage_split",          # cluster-aware train/val/test split
    "asof_join",              # point-in-time join (union-sort path)
    "data_card",              # one-row corpus documentation aggregate
    "snapshot_diff",          # corpus version audit (one outer join)
    "incremental_dedup",      # new-batch join vs stored minhash index
    "zorder_cluster",         # Morton-key range shuffle + local sort
    "boilerplate_lines",      # cross-doc frequent-line removal
    "weighted_sample",        # A-ES weighted top-k (integer keys)
    "text_normalize",         # control/mojibake/whitespace cleanup
    "quantile_bins",          # value-keyed score-quantile binning
    "negative_samples",       # deterministic contrastive negatives
    "multimodal_resize",      # nearest-neighbor image resample
    "token_budget_select",    # radix threshold search, no global sort
    "domain_cap",             # per-domain frequency cap (FineWeb-style)
    "quantile_bins_grouped",  # per-group score-quantile binning
    "ann_recall",             # recall@10 of LSH vs brute ground truth
    "pca_fit",                # one-pass integer Gram statistics (PCA)
    "key_skew",               # exact heaviest-keys shuffle diagnostic
    "kmv_overlap",            # cross-corpus overlap from KMV sketches
    "script_profile",         # Unicode writing-system profile
    "ngram_novelty",          # per-doc novel n-gram share
    "kmeans_update",          # full-corpus Lloyd-update stats pass
    "containment_pairs",      # asymmetric quote/mirror containment
    "containment_pairs_prefix",  # prefix-filtered containment (scale path)
    "multimodal_dedup",       # image dHash + banded Hamming pairs
    "lm_score",               # stupid-backoff n-gram LM train + score
    "token_drift",            # cross-corpus KL/JS token drift
    "audio_dedup",            # Haitsma-Kalker fingerprint Hamming pairs
    "chat_pack",              # conversation assembly + loss-mask spans
    "incremental_fp",         # new-shard fingerprint dedup vs stored index
    "sft_dedup",              # assistant-content-only conversation dedup
    "preference_pairs",       # RM/DPO pair prep (guards + both modes)
    "code_profile",           # code-vs-prose router (regexp counts)
    "extract_code",           # fenced-code prose/code stream split
    "sft_decontam",           # masked-content eval decontamination
]

# Sequential fresh-JVM groups. Grouped by operator family so each JVM
# compiles a related set of plans; size balanced so no group dominates.
GROUPS = [
    # full enrichment chains (heaviest codegen: 131-col projections)
    ["transform_atomic", "event_fingerprint", "tsv_serialize",
     "bad_row_split", "adapter_explode", "metadata_aggregation",
     "snapshot_diff"],
    # lookup/range-join enrichments + loaders
    ["ip_lookups", "asn_bot_detection", "sql_lookup_join",
     "thrift_loader", "payload_decompress", "script_js",
     "remote_adapter", "asof_join"],
    # dedup family
    ["dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
     "dedup_ngram_jaccard", "dedup_despan", "decontam_multi",
     "decontam_bloom", "semantic_dedup", "leakage_split",
     "incremental_dedup", "boilerplate_lines", "ngram_novelty",
     "containment_pairs", "containment_pairs_prefix"],
    # embeddings / ANN / clustering
    ["ann_cosine_topk", "ann_ivf_topk", "ann_lsh_topk",
     "embedding_dup_pairs", "cluster_stats", "sessionize",
     "pq_adc_topk", "negative_samples", "ann_recall", "pca_fit",
     "key_skew", "kmeans_update"],
    # text analysis (all native-regexp, cheap)
    ["text_quality_score", "text_token_counts", "text_language_id",
     "text_pii_scrub", "quality_model_score", "corpus_stats",
     "doc_fingerprint", "bpe_tokenize", "url_normalize", "html_extract",
     "bm25_rank", "robots_filter", "text_normalize", "script_profile",
     "kmv_overlap", "lm_score", "token_drift"],
    # data-mix / graph / merge / multimodal
    ["data_mix", "heavy_hitters", "k_anonymity", "pagerank",
     "dataset_manifest", "cdc_merge", "multimodal_frames",
     "multimodal_decode", "warc_parse", "dsir_select", "data_card",
     "zorder_cluster", "weighted_sample", "quantile_bins",
     "multimodal_resize", "token_budget_select", "domain_cap",
     "quantile_bins_grouped", "multimodal_dedup", "audio_dedup",
     "chat_pack"],
    # r13 additions get their OWN group: folding them into the r12
    # groups would inflate every longtime member via the documented
    # group-growth pattern (SCALE.md §15) and pollute round-over-round
    # comparisons; new rows have no baseline to protect
    ["incremental_fp", "sft_dedup", "preference_pairs",
     "code_profile"],
    # r14 additions: own group, same rationale
    ["extract_code", "sft_decontam"],
]
assert sorted(n for g in GROUPS for n in g) == sorted(HEADLINE)


def _run_group(names: list[str], sf_dir: str) -> None:
    """Child mode: fresh JVM, measure `names`, print one JSON line per
    query to stdout (stderr carries the progress comments)."""
    import __spark_entry__ as entrymod
    from enrich_spark.session import get_spark

    spark = get_spark("enrich-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.bench_queries()

    # warm the JVM + parquet footers with one cheap action
    entrymod._load_events(spark, sf_dir).limit(1).collect()

    n_warm = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    # Phase A: one cold pass over the WHOLE group before any timing —
    # JIT (C2) compiles the Spark scan/codegen hot paths across all the
    # group's plans, so short queries measured in phase B see the same
    # warmed JVM they'd see mid-suite in a long-running deployment.
    # (Measured: without this, sub-0.3 s rows read ~2× their steady
    # state in a fresh group JVM — SCALE.md "r9 suite-order".)
    cold: dict[str, float] = {}
    accessed_keys: dict[str, set] = {}
    try:
        for name in names:
            entrymod._FIXTURE_ACCESS = access = []
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).count()
            cold[name] = round(time.perf_counter() - t0, 3)
            accessed_keys[name] = set(access)
    finally:
        # an exception mid-group must not leave the module global
        # pointing at a stale list (it would silently absorb fixture
        # accesses from any later in-process run)
        entrymod._FIXTURE_ACCESS = None
    # teardown schedule: a fixture dies after its LAST accessor in the
    # group, not its first builder. Two rows can share a fixture (r13:
    # multimodal_dedup and incremental_fp both read dhash_hashes), so
    # builder-scoped teardown unpersisted the shared entry mid-group
    # and the later row re-synthesized on every warm run (measured:
    # 1.78 s vs 0.32 s). Sharing is resolved by PLAN IDENTITY
    # (semanticHash of the analyzed plan), not the dict key: fixtures
    # registered under DIFFERENT keys but byte-identical plans share
    # ONE Spark CacheManager entry, so unpersisting either would drop
    # it for both.
    def _plan_id(key):
        df = entrymod._FIXTURE_CACHE.get(key)
        if df is None:
            return key
        try:
            return ("plan", df._jdf.queryExecution().analyzed()
                    .semanticHash())
        except Exception:  # noqa: BLE001 — fall back to key identity
            return key
    plan_of = {key: _plan_id(key)
               for name in names for key in accessed_keys[name]}
    last_user: dict = {}
    for name in names:
        for key in accessed_keys[name]:
            last_user[plan_of[key]] = name
    teardown: dict[str, list] = {}
    for key, pid in plan_of.items():
        teardown.setdefault(last_user[pid], []).append(key)

    # Phase B: timed warm runs, then per-query fixture teardown —
    # synthesized fixtures are query-scoped, and leaving them persisted
    # squeezes execution memory for every later query (the r8
    # suite-wide regression)
    for name in names:
        fn = queries[name]
        samples = []
        for _ in range(n_warm):
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        median = round(samples[len(samples) // 2], 3)
        spread = round(samples[-1] - samples[0], 3)
        for key in teardown.get(name, ()):
            df = entrymod._FIXTURE_CACHE.pop(key, None)
            if df is not None:
                df.unpersist()
        print(f"# {name}: warm median {median}s (spread {spread}s over "
              f"{n_warm} runs, cold {cold[name]}s, {n} rows)",
              file=sys.stderr)
        print(json.dumps({"query": name, "warm_median": median,
                          "cold": cold[name], "spread": spread}),
              flush=True)


# the driver captures the last TAIL_CAPTURE chars of stdout and parses
# the final line (measured: BENCH_r14.json's tail is exactly 2000 chars;
# BENCH_r11.json came back parsed:null when the full line outgrew it)
TAIL_CAPTURE = 2000
LINE_BUDGET = TAIL_CAPTURE - 5  # trailing newline + slack


def compact_summary_line(total: float, sf: float,
                         timings: dict[str, float], provenance: dict,
                         detail_file: str | None) -> str:
    """The final one-line JSON for the driver's tail capture.

    The per-query {name: warm_median} map travels IN this line (r14
    verdict #1: the driver's PERF record keeps only this parsed line,
    so dropping `queries` from it in r12 left PERF per_query empty and
    every round-over-round claim had to be reconstructed by hand from
    the detail files). The capture window is a hard budget: full
    3-decimal medians live in the detail file; the line carries
    2-decimal medians and sheds optional provenance fields, then one
    decimal, before it would overflow. label + load stay when they fit
    (r13 lesson: the r13 headline — run at load 14.07 — entered the
    round record with no hint of host state)."""
    base = {
        "metric": "headline_suite_total",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "label": provenance.get("label", "unlabeled")[:10],
        "load_1m_at_start": provenance.get("load_1m_at_start"),
        "detail_file": detail_file,
    }
    for ndig in (2, 1, 0):
        for dropped in ((), ("load_1m_at_start",),
                        ("load_1m_at_start", "label")):
            rec = {k: v for k, v in base.items() if k not in dropped}
            rec["queries"] = {
                n: (round(timings[n], ndig) if ndig
                    else int(round(timings[n])))
                for n in HEADLINE if n in timings}
            cand = json.dumps(rec, separators=(",", ":"))
            if len(cand) <= LINE_BUDGET:
                return cand
    # pathological — never lose the headline itself
    return json.dumps(base, separators=(",", ":"))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    if "--group" in sys.argv:
        names = sys.argv[sys.argv.index("--group") + 1].split(",")
        _run_group(names, sf_dir)
        return

    if os.environ.get("SPARK_GRAFT_BENCH_ONEJVM"):
        # escape hatch: the pre-r9 single-JVM behavior, for measuring
        # suite-order pressure itself (SCALE.md attribution runs)
        _run_group(HEADLINE, sf_dir)
        return

    # provenance captured BEFORE the runs: who launched this record and
    # what the host looked like at start. r12 lesson: the driver's
    # per-round run overwrote the builder's committed cooled-host
    # record under the same BENCH_LOCAL_r{N}.json name, making
    # round-over-round claims depend on which copy you read.
    import datetime as _dt
    provenance = {
        "label": os.environ.get("SPARK_GRAFT_BENCH_PROVENANCE",
                                "unlabeled"),
        "utc": _dt.datetime.now(_dt.timezone.utc)
        .isoformat(timespec="seconds"),
        "load_1m_at_start": round(os.getloadavg()[0], 2),
        # the EFFECTIVE core count (what local[$SPARK_GRAFT_CPUS] runs
        # with), not the host's — the r14 8-core driver record's detail
        # file said cpus 32 because this recorded os.cpu_count()
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "0"))
        or os.cpu_count(),
        "host_cpus": os.cpu_count(),
        "sf_dir": sf_dir,
    }

    def _steal_jiffies() -> int | None:
        # /proc/stat cpu line: user nice system idle iowait irq softirq
        # steal ... — steal is hypervisor-withheld time. r14 lesson: two
        # cooled-start (load 0.01) suite runs read 1.6-2.0x high while
        # fresh-JVM isolated runs of the same rows were normal; the only
        # host signal that explains it is steal-time episodes, so record
        # the delta across the run to make such records self-diagnosing.
        try:
            with open("/proc/stat") as f:
                parts = f.readline().split()
            return int(parts[8])
        except (OSError, IndexError, ValueError):
            return None

    steal0 = _steal_jiffies()

    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    colds: dict[str, float] = {}
    for group in GROUPS:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--group", ",".join(group)],
            stdout=subprocess.PIPE, text=True)
        if proc.returncode != 0:
            print(f"# group {group[0]}… exited {proc.returncode}",
                  file=sys.stderr)
        for line in proc.stdout.splitlines():
            line = line.strip()
            if not line.startswith("{"):
                continue
            rec = json.loads(line)
            timings[rec["query"]] = rec["warm_median"]
            spreads[rec["query"]] = rec.get("spread", 0.0)
            colds[rec["query"]] = rec.get("cold", 0.0)

    steal1 = _steal_jiffies()
    if steal0 is not None and steal1 is not None:
        # jiffies are USER_HZ (100/s); this is cpu-seconds stolen across
        # all cores while the suite ran — anything beyond a few seconds
        # means the record is contaminated by hypervisor contention.
        provenance["steal_sec_during_run"] = round((steal1 - steal0) / 100.0, 1)

    total = round(sum(timings.values()), 3)
    # Full record — name -> median seconds plus per-row spread (max-min
    # over the warm runs, so a round-over-round delta can be told from
    # run noise without rerunning; tools/bench_compare.py flags only
    # |delta| > spread) and cold (first-pass) time.
    full = {
        "metric": "headline_suite_total",
        "value": total,
        "unit": "sec",
        "queries": {n: timings[n] for n in HEADLINE if n in timings},
        "spreads": {n: spreads[n] for n in HEADLINE if n in spreads},
        "colds": {n: colds[n] for n in HEADLINE if n in colds},
        "sf": sf,
        "provenance": provenance,
    }

    # Durability (r12): the driver captures only the last ~2 KB of
    # output and parses the final line — at 73+ rows the full per-query
    # JSON outgrew that window (BENCH_r11.json came back parsed:null).
    # So the FULL record goes to an in-repo BENCH_LOCAL_r{N}.json
    # (N = next round, inferred from the BENCH_r*.json the driver has
    # already written) and stdout gets one compact line that always
    # fits the tail capture. tools/bench_compare.py reads the LOCAL
    # files for round-over-round comparison.
    repo = os.path.dirname(os.path.abspath(__file__))
    import glob as _glob
    import re as _re
    rounds = [int(m.group(1)) for f in _glob.glob(os.path.join(repo, "BENCH_r*.json"))
              if (m := _re.search(r"BENCH_r(\d+)\.json$", f))]
    nxt = (max(rounds) + 1) if rounds else 0
    local_path = os.path.join(repo, f"BENCH_LOCAL_r{nxt:02d}.json")

    def _committed_clean(path: str) -> bool:
        # tracked by git AND identical to HEAD — that record is someone
        # else's durable evidence; never clobber it
        if not os.path.exists(path):
            return False
        rel = os.path.basename(path)
        tracked = subprocess.run(
            ["git", "-C", repo, "ls-files", "--error-unmatch", rel],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        if tracked.returncode != 0:
            return False
        status = subprocess.run(
            ["git", "-C", repo, "status", "--porcelain", "--", rel],
            stdout=subprocess.PIPE, text=True)
        return status.returncode == 0 and status.stdout.strip() == ""

    # collision-proof re-runs: a committed BENCH_LOCAL_r{N}.json stays
    # untouched — subsequent runs land on _run2, _run3, … (an existing
    # UNcommitted scratch copy is fair game to overwrite)
    k = 1
    while _committed_clean(local_path):
        k += 1
        local_path = os.path.join(repo,
                                  f"BENCH_LOCAL_r{nxt:02d}_run{k}.json")
    try:
        with open(local_path, "w") as fh:
            json.dump(full, fh, indent=1)
            fh.write("\n")
    except OSError as exc:  # read-only checkout: still print the summary
        print(f"# could not write {local_path}: {exc}", file=sys.stderr)
        local_path = None

    print(compact_summary_line(
        total, sf, timings, provenance,
        os.path.basename(local_path) if local_path else None))


if __name__ == "__main__":
    main()
