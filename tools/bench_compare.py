"""Round-over-round bench comparison that separates signal from noise.

BENCH_rN.json (r11+) carries a per-row `spreads` dict — each query's
max−min over its warm runs. A delta smaller than the measured spread is
run noise, not a regression (the r10 lesson: embedding_dup_pairs moved
+48% round-over-round while its own spread was ±37%, and the bare
median made that look like a real regression).

r14: a second, DURABLE noise source — cross-JVM variance. Some rows
(asn_bot_detection burnt attribution effort two rounds running) have a
within-suite spread far below their true fresh-JVM-to-fresh-JVM
spread, so the suite budget alone still flags them. bench_one.py now
accumulates per-row isolated medians/spreads into
tools/isolated_spreads.json; a delta that beats the suite budget but
sits inside the recorded isolated budget gets verdict NEEDS-FRESH-JVM
(attribute with tools/bench_one.py before believing it) instead of
REGRESSION, and does not fail the exit code.

Usage:
    python tools/bench_compare.py BENCH_r10.json BENCH_r11.json

Prints one line per common query: delta, spread budget, and a verdict —
REGRESSION / IMPROVEMENT only when |delta| exceeds BOTH budgets (suite
spread and, where recorded, isolated cross-JVM spread; a default noise
floor of 12% of the old median stands in when a file predates
`spreads`, matching the documented ±6-12% host spread in SCALE.md).
Exits 1 if any REGRESSION.
"""

from __future__ import annotations

import json
import os
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


def load_isolated(sf_key: str | None = None,
                  path: str | None = None) -> dict[str, float]:
    """Per-query cross-JVM budget from the bench_one sidecar:
    max(recorded within-run spreads, max−min of recorded medians).
    Needs ≥2 recorded medians — one fresh-JVM run says nothing about
    cross-JVM variance."""
    out: dict[str, float] = {}
    for name, row in load_isolated_rows(sf_key, path).items():
        meds, sprs = row.get("medians", []), row.get("spreads", [])
        if len(meds) >= 2:
            out[name] = round(max(max(sprs, default=0.0),
                                  max(meds) - min(meds)), 3)
    return out


def load_isolated_rows(sf_key: str | None = None,
                       path: str | None = None) -> dict[str, dict]:
    """The raw per-query sidecar rows ({name: {medians, spreads}}) —
    verdict_for needs the recent medians themselves, not just the
    derived budget, to refuse a budget that merely absorbed a
    reproduced regression (r14 verdict #3: spread budgets must not
    become a regression laundry)."""
    path = path or os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "isolated_spreads.json")
    try:
        with open(path) as f:
            book = json.load(f)
    except (OSError, ValueError):
        return {}
    return book.get(sf_key or "sf0.1", {})


def _describe(path: str, prov: dict) -> str:
    if not prov:
        return f"{path} (no provenance — pre-r13 record)"
    return (f"{path} (label={prov.get('label')}, {prov.get('utc')}, "
            f"load_1m_at_start={prov.get('load_1m_at_start')})")


def verdict_for(delta: float, suite_budget: float,
                isolated_budget: float | None,
                recent_medians: list | None = None) -> str:
    """The three-way call: noise / NEEDS-FRESH-JVM / REGRESSION or
    IMPROVEMENT. Pure so tests can pin it.

    r15 (r14 verdict #3): an isolated budget is REFUSED when the
    sidecar's own fresh-JVM median history shows a reproduced STEP —
    the two most recent medians both strictly above every earlier one.
    Two independent fresh-JVM runs reproducing a new, higher level is
    attribution, not variance; the max−min budget those very runs
    seeded would otherwise absorb exactly the regression it was meant
    to detect. (The comparison is within the isolated history — same
    measurement regime — NOT isolated-vs-suite: fresh-JVM medians of
    sub-second rows run well above their mid-suite warm values, so a
    suite-level threshold would misfire on every short row.)"""
    if abs(delta) <= suite_budget:
        return "noise"
    if isolated_budget is not None and abs(delta) <= isolated_budget:
        if (delta > 0 and recent_medians and len(recent_medians) >= 3
                and min(recent_medians[-2:]) > max(recent_medians[:-2])):
            return "REGRESSION"
        # the suite spread underestimates this row's cross-JVM
        # variance; the recorded isolated spread absorbs the delta —
        # attribute with bench_one before believing either direction
        return "NEEDS-FRESH-JVM"
    return "REGRESSION" if delta > 0 else "IMPROVEMENT"


def compare(old_path: str, new_path: str,
            isolated: dict[str, float] | None = None,
            isolated_rows: dict[str, dict] | None = None) -> int:
    old_q, old_s, old_p = load(old_path)
    new_q, new_s, new_p = load(new_path)
    if isolated is None:
        isolated = load_isolated()
    if isolated_rows is None:
        isolated_rows = load_isolated_rows()
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
        verdict = verdict_for(
            delta, budget, isolated.get(name),
            recent_medians=isolated_rows.get(name, {}).get("medians"))
        if verdict == "REGRESSION":
            regressions += 1
        iso = isolated.get(name)
        iso_s = f"  iso {iso:6.3f}" if iso is not None else ""
        print(f"{name:32s} {a:7.3f} -> {b:7.3f}  "
              f"delta {delta:+7.3f}  spread-budget {budget:6.3f}"
              f"{iso_s}  {verdict}")

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
