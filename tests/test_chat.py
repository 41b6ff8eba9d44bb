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
