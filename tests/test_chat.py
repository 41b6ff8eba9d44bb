"""Conversation assembly + loss-mask spans (datapipe/chat.py)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from enrich_spark.datapipe.chat import chat_assemble, chat_assemble_sql


def _turns(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id long, turn_idx long, role string, text string")


def test_chat_assemble_text_and_mask(spark):
    rows = [
        (1, 0, "user", "hi there"),
        (1, 1, "assistant", "hello!"),
        (1, 2, "user", "bye"),
        (1, 3, "assistant", "see you"),
    ]
    got = chat_assemble(_turns(spark, rows)).collect()[0]
    want_text = ("<|user|>\nhi there\n<|assistant|>\nhello!\n"
                 "<|user|>\nbye\n<|assistant|>\nsee you\n")
    assert got.text == want_text
    assert got.n_turns == 4 and got.n_mask_turns == 2
    assert got.total_chars == len(want_text)
    # spans point EXACTLY at the assistant bodies
    spans = [(s.s, s.e) for s in got.mask_spans]
    for s, e in spans:
        assert want_text[s:e] in ("hello!", "see you")
    assert {want_text[s:e] for s, e in spans} == {"hello!", "see you"}
    assert got.mask_spans_str == ";".join(f"{s}-{e}" for s, e in spans)
    assert got.mask_chars == sum(e - s for s, e in spans)
    assert (got.alternation_ok, got.roles_ok,
            got.ends_with_mask, got.no_empty) == (1, 1, 1, 1)


def test_chat_assemble_validation_flags(spark):
    rows = [
        # conv 1: double-user (alternation violation), ends with user
        (1, 0, "user", "a"), (1, 1, "user", "b"),
        # conv 2: unknown role + empty assistant body
        (2, 0, "user", "q"), (2, 1, "bot", "x"), (2, 2, "assistant", ""),
        # conv 3: null body counts as empty
        (3, 0, "user", None), (3, 1, "assistant", "fine"),
    ]
    got = {r.conv_id: r for r in
           chat_assemble(_turns(spark, rows)).collect()}
    assert got[1].alternation_ok == 0 and got[1].ends_with_mask == 0
    assert got[1].n_mask_turns == 0 and got[1].mask_spans_str == ""
    assert got[1].mask_chars == 0
    assert got[2].roles_ok == 0 and got[2].no_empty == 0
    assert got[3].no_empty == 0 and got[3].ends_with_mask == 1


def test_chat_assemble_duckdb_parity(spark, tmp_path):
    import pandas as pd

    rows = []
    for c in range(30):
        for t in range(1 + c % 5):
            role = ["user", "assistant", "system"][
                (t + c) % 2 if c % 7 else 2]
            rows.append((c, t, role, f"turn {c}-{t} body" * (1 + t % 3)))
    pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text"]) \
        .to_parquet(f"{tmp_path}/t.parquet")
    df = spark.read.parquet(f"{tmp_path}/t.parquet")
    cols = ["conv_id", "n_turns", "n_mask_turns", "text",
            "mask_spans_str", "total_chars", "mask_chars",
            "alternation_ok", "roles_ok", "ends_with_mask", "no_empty"]
    got = sorted(tuple(r[c] for c in cols)
                 for r in chat_assemble(df).collect())
    want = sorted(tuple(r) for r in duckdb.connect().execute(
        chat_assemble_sql(f"read_parquet('{tmp_path}/t.parquet')"))
        .fetchall())
    assert got == want and len(got) == 30


def test_chat_assemble_plan_is_conv_partitioned(spark):
    df = _turns(spark, [(1, 0, "user", "a"), (1, 1, "assistant", "b")])
    import re

    plan = chat_assemble(df)._jdf.queryExecution().executedPlan() \
        .toString()
    # the only window is partitioned by the conversation id (bounded
    # per-dialogue cardinality) — never unpartitioned
    assert re.search(r"windowspecdefinition\(conv_id", plan), plan
    assert "windowspecdefinition()" not in plan
    assert "PythonUDF" not in plan


def test_chat_assemble_null_role_counts_not_ok(spark, tmp_path):
    """r13 (ADVICE): a NULL role must flag alternation_ok = 0, not
    vanish from min() via a NULL comparison — same when/otherwise
    guard as _role_ok, and parity with the SQL mirror's CASE ELSE 0."""
    import pandas as pd

    rows = [(1, 0, "user", "q"), (1, 1, None, "x"),
            (1, 2, "assistant", "a"),
            (2, 0, "user", "q"), (2, 1, "assistant", "a")]
    pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text"]) \
        .to_parquet(f"{tmp_path}/t.parquet")
    df = spark.read.parquet(f"{tmp_path}/t.parquet")
    got = {r.conv_id: r for r in chat_assemble(df).collect()}
    assert got[1].alternation_ok == 0 and got[1].roles_ok == 0
    assert got[2].alternation_ok == 1 and got[2].roles_ok == 1
    cols = ["conv_id", "n_turns", "n_mask_turns", "mask_spans_str",
            "total_chars", "mask_chars", "alternation_ok", "roles_ok",
            "ends_with_mask", "no_empty"]
    got_rows = sorted(tuple(r[c] for c in cols)
                      for r in chat_assemble(df).collect())
    want = sorted(
        tuple(r) for r in duckdb.connect().execute(
            "SELECT conv_id, n_turns, n_mask_turns, mask_spans_str,"
            " total_chars, mask_chars, alternation_ok, roles_ok,"
            " ends_with_mask, no_empty FROM ("
            + chat_assemble_sql(f"read_parquet('{tmp_path}/t.parquet')")
            + ")").fetchall())
    assert got_rows == want


def test_sft_masked_dedup_dedups_on_assistant_content_only(spark):
    """r13 (verdict #5): duplicate assistant answers under DIFFERENT
    user prompts must cluster (hashing the full dialogue would let a
    fresh prompt launder a verbatim answer past the filter); identical
    user prompts with distinct answers must NOT cluster. Keep policy:
    the copy with the most supervised (masked) chars wins."""
    from enrich_spark.datapipe.chat import masked_content, sft_masked_dedup

    ans = ("to reverse a list in python use the built in reversed "
           "function or slice with negative step like lst reversed")
    other = ("gradient descent updates parameters against the loss "
             "surface slope scaled by the learning rate each step")
    rows = [
        # conv 1 and 2: same answer, different user prompts
        (1, 0, "user", "how do I reverse a list?"), (1, 1, "assistant", ans),
        (2, 0, "user", "python list backwards help"), (2, 1, "assistant", ans),
        # conv 3: same answer + an EXTRA assistant turn (more mask
        # chars) — near-dup of 1/2 only if hamming allows; give it the
        # same single answer so it's exact on masked content, and a
        # second masked turn to win the keep policy
        (3, 0, "user", "reverse list??"), (3, 1, "assistant", ans),
        (3, 2, "user", "thanks"), (3, 3, "assistant", ans),
        # conv 4: same USER prompt as 1 but a different answer
        (4, 0, "user", "how do I reverse a list?"), (4, 1, "assistant", other),
    ]
    turns = spark.createDataFrame(
        rows, "conv_id long, turn_idx long, role string, text string")
    got = {r.conv_id: r for r in sft_masked_dedup(turns).collect()}
    assert got[1].cluster_id == got[2].cluster_id
    assert got[4].cluster_id != got[1].cluster_id
    assert got[4].is_kept == 1 and got[4].cluster_size == 1
    same = {c for c in (1, 2, 3) if got[c].cluster_id == got[1].cluster_id}
    kept = [c for c in same if got[c].is_kept == 1]
    if 3 in same:                # doubled answer may drift 2 hamming
        assert kept == [3]       # most masked chars wins
    else:
        assert kept == [1]       # ties fall to lowest conv id

    # span-extraction sanity: masked content equals the turn bodies
    from enrich_spark.datapipe.chat import chat_assemble

    m = {r.conv_id: r.m for r in chat_assemble(turns).select(
        "conv_id", masked_content().alias("m")).collect()}
    assert m[1] == ans and m[3] == ans + "\n" + ans


def test_sft_decontaminate_catches_laundered_benchmark_answers(spark):
    """r14 (r13 verdict #6): a benchmark ANSWER under a fresh user
    prompt must flag as contaminated on the masked view (full-dialogue
    checking would dilute the overlap with prompt windows); a clean
    conversation sharing only its PROMPT with a benchmark question
    must not flag."""
    from enrich_spark.datapipe.chat import sft_decontaminate

    bench_ans = ("the capital of france is paris which has been the "
                 "seat of government since the medieval period")
    clean_ans = ("photosynthesis converts light energy into chemical "
                 "energy stored in glucose within the chloroplasts")
    rows = [
        # conv 1: LAUNDERED — fresh prompt, verbatim benchmark answer
        (1, 0, "user", "hey quick geography question for you"),
        (1, 1, "assistant", bench_ans),
        # conv 2: clean answer, but its USER prompt quotes the
        # benchmark — prompts are unmasked, must NOT flag
        (2, 0, "user", "someone said " + bench_ans + " is that right"),
        (2, 1, "assistant", clean_ans),
        # conv 3: fully clean
        (3, 0, "user", "explain photosynthesis briefly"),
        (3, 1, "assistant", "plants make food from light and water"),
    ]
    turns = spark.createDataFrame(
        rows, "conv_id long, turn_idx long, role string, text string")
    bench = spark.createDataFrame([(100, bench_ans)],
                                  "bench_id long, text string")
    hits = {r.conv_id: r for r in sft_decontaminate(
        turns, [("geo_eval", bench, 6)]).collect()}
    assert set(hits) == {1}
    h = hits[1]
    assert h.benchmark == "geo_eval" and h.k == 6
    assert h.contaminated == 1 and h.contaminated_windows > 0

    # pipeline composition: the laundered conv is dropped, the
    # prompt-only-overlap and clean convs survive, output is
    # assembled-conversation grain
    from enrich_spark.datapipe.pipeline import run_pipeline

    out = run_pipeline(turns, [
        {"op": "sft_decontam_drop",
         "benchmarks": [("geo_eval", bench, 6)]}])
    assert sorted(r.conv_id for r in out.collect()) == [2, 3]
    assert "mask_spans" in out.columns
