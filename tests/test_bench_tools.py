"""Bench-tooling specs (no Spark): the three-way regression verdict
with the isolated cross-JVM budget (tools/bench_compare.py) and the
bench_one sidecar accumulation (tools/bench_one.py).

The r13 lesson these pin: asn_bot_detection's delta beat the SUITE
spread budget two rounds running, but fresh-JVM attribution showed its
isolated cross-JVM spread (±0.38) dwarfed the delta — pure noise that
consumed a manual attribution each round. The sidecar makes that
lesson structural: such rows now read NEEDS-FRESH-JVM, not REGRESSION.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import bench_compare as BC  # noqa: E402
import bench_one as BO  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


def test_compact_summary_line_carries_queries_and_fits_tail():
    # r14 verdict #1: the driver keeps only the last 2000 chars of
    # stdout and parses the final line — the per-query medians must
    # travel IN that line, and the line must always fit the capture.
    timings = {n: 0.5 + (i % 7) / 10 for i, n in enumerate(bench.HEADLINE)}
    prov = {"label": "builder-r15-whatever", "load_1m_at_start": 0.12}
    line = bench.compact_summary_line(
        sum(timings.values()), 0.1, timings, prov, "BENCH_LOCAL_r15.json")
    assert len(line) + 1 <= bench.TAIL_CAPTURE
    rec = json.loads(line)
    # the original driver contract fields survive
    assert rec["metric"] == "headline_suite_total"
    assert rec["unit"] == "sec" and rec["sf"] == 0.1
    # every headline row is present with its (2-decimal) median
    assert set(rec["queries"]) == set(bench.HEADLINE)
    assert rec["queries"]["transform_atomic"] == round(
        timings["transform_atomic"], 2)
    # pathological medians (host stall inflating every row) still fit —
    # precision degrades instead of the line overflowing the capture
    fat = {n: v * 100 + 100 for n, v in timings.items()}
    fat_line = bench.compact_summary_line(
        sum(fat.values()), 0.1, fat, prov, "BENCH_LOCAL_r15.json")
    assert len(fat_line) + 1 <= bench.TAIL_CAPTURE
    assert set(json.loads(fat_line)["queries"]) == set(bench.HEADLINE)


def test_verdict_three_way():
    # inside suite budget → noise, regardless of isolated
    assert BC.verdict_for(0.05, 0.1, None) == "noise"
    assert BC.verdict_for(-0.05, 0.1, 0.02) == "noise"
    # beats suite budget, no isolated record → REGRESSION/IMPROVEMENT
    assert BC.verdict_for(0.2, 0.1, None) == "REGRESSION"
    assert BC.verdict_for(-0.2, 0.1, None) == "IMPROVEMENT"
    # beats suite budget but inside the recorded cross-JVM spread →
    # NEEDS-FRESH-JVM in BOTH directions (an "improvement" inside the
    # isolated spread is equally unattributable)
    assert BC.verdict_for(0.2, 0.1, 0.38) == "NEEDS-FRESH-JVM"
    assert BC.verdict_for(-0.2, 0.1, 0.38) == "NEEDS-FRESH-JVM"
    # beats both budgets → real
    assert BC.verdict_for(0.5, 0.1, 0.38) == "REGRESSION"
    assert BC.verdict_for(-0.5, 0.1, 0.38) == "IMPROVEMENT"


def test_verdict_refuses_budget_for_reproduced_regression():
    # r14 verdict #3: the isolated budget must NOT absorb a delta when
    # the sidecar's own fresh-JVM history shows a reproduced step —
    # the two most recent medians strictly above every earlier one.
    assert BC.verdict_for(
        0.2, 0.1, 0.38,
        recent_medians=[1.0, 1.05, 1.25, 1.22]) == "REGRESSION"
    # one high recent median among older low ones: not reproduced
    assert BC.verdict_for(
        0.2, 0.1, 0.38,
        recent_medians=[1.0, 1.05, 1.25, 1.02]) == "NEEDS-FRESH-JVM"
    # recent medians inside the historical band → genuine variance
    assert BC.verdict_for(
        0.2, 0.1, 0.38,
        recent_medians=[1.0, 1.3, 1.25, 1.22]) == "NEEDS-FRESH-JVM"
    # fewer than 3 recorded medians cannot show a step
    assert BC.verdict_for(
        0.2, 0.1, 0.38, recent_medians=[1.25, 1.22]) == "NEEDS-FRESH-JVM"
    # improvements are never "confirmed" by this rule
    assert BC.verdict_for(
        -0.2, 0.1, 0.38,
        recent_medians=[1.0, 1.05, 1.25, 1.22]) == "NEEDS-FRESH-JVM"


def test_sidecar_roundtrip(tmp_path, monkeypatch):
    # record_isolated accumulates per (sf, query), capped at 8
    monkeypatch.setattr(BO, "__file__", str(tmp_path / "bench_one.py"))
    for i in range(10):
        BO.record_isolated("q1", 1.0 + i / 100, 0.05, "/data/sf0.1")
    BO.record_isolated("q2", 2.0, 0.01, "/data/sf0.1")
    BO.record_isolated("q1", 9.9, 0.3, "/data/sf0.01")  # other sf
    BO.record_isolated("q1", 9.9, 0.2, "/data/sf0.01")
    book = json.loads((tmp_path / "isolated_spreads.json").read_text())
    assert len(book["sf0.1"]["q1"]["medians"]) == 8  # capped
    assert book["sf0.1"]["q1"]["medians"][-1] == 1.09

    monkeypatch.setattr(
        BC.os.path, "dirname", lambda p: str(tmp_path), raising=False)
    iso = BC.load_isolated("sf0.1", str(tmp_path / "isolated_spreads.json"))
    # q1 budget = max(within-run spreads, max-min of medians):
    # medians 1.02..1.09 span 0.07 < spread 0.05? no: max(0.05, 0.07)
    assert iso["q1"] == 0.07
    # q2 has ONE median — cross-JVM variance unknowable, excluded
    assert "q2" not in iso
    # sf0.01 entries never leak into the sf0.1 budget
    assert BC.load_isolated(
        "sf0.01", str(tmp_path / "isolated_spreads.json")) == {"q1": 0.3}


def test_compare_end_to_end(tmp_path, capsys):
    old = {"metric": "x", "queries": {"a": 1.0, "b": 1.0, "c": 1.0},
           "spreads": {"a": 0.1, "b": 0.1, "c": 0.1}}
    new = {"metric": "x", "queries": {"a": 1.05, "b": 1.3, "c": 1.3},
           "spreads": {"a": 0.1, "b": 0.1, "c": 0.1}}
    po, pn = tmp_path / "old.json", tmp_path / "new.json"
    po.write_text(json.dumps(old))
    pn.write_text(json.dumps(new))
    # b has a recorded isolated spread that absorbs its +0.3; c does not
    rc = BC.compare(str(po), str(pn), isolated={"b": 0.38},
                    isolated_rows={})
    out = capsys.readouterr().out
    assert rc == 1  # c is a real regression
    assert "a" in out and "noise" in out
    assert out.count("NEEDS-FRESH-JVM") == 1
    assert out.count("REGRESSION") == 1
    # b alone must not fail the exit code
    new2 = dict(new, queries={"a": 1.0, "b": 1.3, "c": 1.0})
    pn.write_text(json.dumps(new2))
    assert BC.compare(str(po), str(pn), isolated={"b": 0.38},
                      isolated_rows={}) == 0
    # ...unless b's own fresh-JVM history shows the reproduced step —
    # then the budget is refused and the exit code fails
    assert BC.compare(
        str(po), str(pn), isolated={"b": 0.38},
        isolated_rows={"b": {"medians": [1.0, 1.02, 1.28, 1.31]}}) == 1
