"""Round-over-round bench comparison that separates signal from noise.

BENCH_rN.json (r11+) carries a per-row `spreads` dict — each query's
max−min over its warm runs. A delta smaller than the measured spread is
run noise, not a regression (the r10 lesson: embedding_dup_pairs moved
+48% round-over-round while its own spread was ±37%, and the bare
median made that look like a real regression).

Usage:
    python tools/bench_compare.py BENCH_r10.json BENCH_r11.json

Prints one line per common query: delta, spread budget, and a verdict —
REGRESSION / IMPROVEMENT only when |delta| exceeds the spread budget
(the larger of the two rounds' spreads; a default noise floor of 12% of
the old median stands in when a file predates `spreads`, matching the
documented ±6-12% host spread in SCALE.md). Exits 1 if any REGRESSION.
"""

from __future__ import annotations

import json
import sys

NOISE_FLOOR_FRAC = 0.12  # SCALE.md's documented host spread upper bound


def load(path: str) -> tuple[dict[str, float], dict[str, float], dict]:
    with open(path) as f:
        rec = json.load(f)
    # the driver wraps bench.py's JSON line under "parsed"
    if "queries" not in rec and isinstance(rec.get("parsed"), dict):
        rec = rec["parsed"]
    return rec.get("queries", {}), rec.get("spreads", {}), \
        rec.get("provenance", {})


def _describe(path: str, prov: dict) -> str:
    if not prov:
        return f"{path} (no provenance — pre-r13 record)"
    return (f"{path} (label={prov.get('label')}, {prov.get('utc')}, "
            f"load_1m_at_start={prov.get('load_1m_at_start')})")


def compare(old_path: str, new_path: str) -> int:
    old_q, old_s, old_p = load(old_path)
    new_q, new_s, new_p = load(new_path)
    # name exactly which pair of records this comparison read — the
    # r12 lesson: two same-named runs (builder cooled-host vs driver
    # hot-host) gave 0.951x vs 0.879x and the claim was ambiguous
    print(f"old: {_describe(old_path, old_p)}")
    print(f"new: {_describe(new_path, new_p)}\n")
    common = sorted(set(old_q) & set(new_q))
    only_old = sorted(set(old_q) - set(new_q))
    only_new = sorted(set(new_q) - set(old_q))

    regressions = 0
    for name in common:
        a, b = old_q[name], new_q[name]
        delta = b - a
        budget = max(
            old_s.get(name, NOISE_FLOOR_FRAC * a),
            new_s.get(name, NOISE_FLOOR_FRAC * a),
        )
        if abs(delta) <= budget:
            verdict = "noise"
        elif delta > 0:
            verdict = "REGRESSION"
            regressions += 1
        else:
            verdict = "IMPROVEMENT"
        print(f"{name:32s} {a:7.3f} -> {b:7.3f}  "
              f"delta {delta:+7.3f}  spread-budget {budget:6.3f}  {verdict}")

    ca = sum(old_q[n] for n in common)
    cb = sum(new_q[n] for n in common)
    print(f"\ncommon-{len(common)} total: {ca:.2f}s -> {cb:.2f}s "
          f"({cb / ca:.3f}x)" if common else "\nno common queries")
    if only_old:
        print(f"dropped rows: {', '.join(only_old)}")
    if only_new:
        print(f"new rows (no baseline): {', '.join(only_new)}")
    return 1 if regressions else 0


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    sys.exit(compare(sys.argv[1], sys.argv[2]))
