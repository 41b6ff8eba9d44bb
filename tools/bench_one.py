"""Per-query isolated benchmark: fresh JVM, one query, optional config
overrides — the attribution tool behind SCALE.md's suite-vs-isolated
numbers. Usage:

    python tools/bench_one.py QUERY [QUERY ...] \
        [--conf spark.sql.codegen.maxFields=100] [--runs 3] [--sf DIR]

Prints one JSON line: {"query": ..., "warm_median": s, "cold": s,
"confs": {...}}, one per query — run each query in its OWN process for
clean isolation (this script intentionally reuses one JVM only when you
pass several queries at once, to measure suite-order effects).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    args = sys.argv[1:]
    confs: dict[str, str] = {}
    runs = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--conf":
            k, v = args[i + 1].split("=", 1)
            confs[k] = v
            i += 2
        elif a == "--runs":
            runs = int(args[i + 1])
            i += 2
        elif a == "--sf":
            sf_dir = args[i + 1]
            i += 2
        else:
            names.append(a)
            i += 1

    import __spark_entry__ as entrymod
    from enrich_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("bench-one")
    for k, v in confs.items():
        spark.conf.set(k, v)
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.bench_queries()
    entrymod._load_events(spark, sf_dir).limit(1).collect()

    for name in names:
        fn = queries[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        cold = round(time.perf_counter() - t0, 3)
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        median = round(samples[len(samples) // 2], 3)
        spread = round(samples[-1] - samples[0], 3)
        print(json.dumps({
            "query": name,
            "warm_median": median,
            "cold": cold,
            "spread": spread,
            "confs": confs,
        }))
        # durable isolated-spread sidecar (r13 verdict #2): a single
        # fresh-JVM run's within-run spread UNDERESTIMATES a row's true
        # cross-JVM variance (asn_bot_detection: ±0.38 across JVMs vs
        # ~0.1 within one). Accumulating medians across invocations
        # lets bench_compare tell "needs a fresh-JVM check" from a
        # real regression without re-running the attribution by hand.
        # Only clean runs count: conf overrides change what's measured,
        # and multi-query invocations reuse one JVM (suite-order mode).
        if not confs and len(names) == 1:
            record_isolated(name, median, spread, sf_dir)


def record_isolated(name: str, median: float, spread: float,
                    sf_dir: str) -> None:
    """Append one fresh-JVM measurement to tools/isolated_spreads.json
    (keyed by sf dir — spreads at sf0.01 say nothing about sf0.1).
    Keeps the last 8 per row; bench_compare derives the cross-JVM
    budget as max(within-run spreads, max−min of medians)."""
    path = Path(__file__).resolve().parent / "isolated_spreads.json"
    try:
        book = json.loads(path.read_text()) if path.exists() else {}
    except (OSError, ValueError):
        book = {}
    key = os.path.basename(sf_dir.rstrip("/"))
    row = book.setdefault(key, {}).setdefault(
        name, {"medians": [], "spreads": []})
    row["medians"] = (row["medians"] + [median])[-8:]
    row["spreads"] = (row["spreads"] + [spread])[-8:]
    try:
        path.write_text(json.dumps(book, indent=1, sort_keys=True) + "\n")
    except OSError as exc:  # read-only checkout: sidecar is best-effort
        print(f"# could not write {path}: {exc}", file=sys.stderr)


if __name__ == "__main__":
    main()
