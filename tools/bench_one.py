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
        print(json.dumps({
            "query": name,
            "warm_median": round(samples[len(samples) // 2], 3),
            "cold": cold,
            "spread": round(samples[-1] - samples[0], 3),
            "confs": confs,
        }))


if __name__ == "__main__":
    main()
