"""Data card (datapipe/datacard.py): one-row corpus documentation
aggregate — values, DuckDB parity, composition table, one-job plan."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from enrich_spark.datapipe.datacard import (
    data_card, data_card_json, data_card_sql, source_table,
)

ROWS = [
    (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa",
     "en", "web"),
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa",
     "en", "web"),                                   # exact dup of 0
    (2, "short doc", "en", "web"),
    (3, "mail me at someone@example.com from 10.1.2.3 please thanks "
     "and goodbye", "de", "books"),
    (4, "", "de", "books"),                          # empty text
]


def _docs(spark):
    return spark.createDataFrame(
        ROWS, "doc_id long, text string, lang string, source string")


def test_data_card_values(spark):
    card = data_card(_docs(spark)).collect()[0]
    assert card.n_docs == 5
    assert card.n_sources == 2 and card.n_langs == 2
    assert card.n_unique_texts == 4 and card.n_exact_dups == 1
    assert card.total_tokens == 10 + 10 + 2 + 10 + 0
    assert card.min_tokens == 0 and card.max_tokens == 10
    assert card.pii_emails == 1 and card.pii_ipv4 == 1
    assert card.n_docs_10plus_tokens == 3


def test_data_card_matches_duckdb(spark):
    got = tuple(data_card(_docs(spark)).collect()[0])
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR, "
                "lang VARCHAR, source VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?, ?, ?)", ROWS)
    want = con.execute(data_card_sql("docs")).fetchall()[0]
    assert got == tuple(want)


def test_source_table_and_json(spark):
    srcs = {r.source: r for r in source_table(_docs(spark)).collect()}
    assert srcs["web"].n_docs == 3 and srcs["books"].n_docs == 2
    assert srcs["web"].share_bp == 6000 and srcs["books"].share_bp == 4000
    card = data_card_json(_docs(spark))
    assert card["n_docs"] == 5
    assert [s["source"] for s in card["sources"]] == ["web", "books"]
    assert card["code_langs"] == []       # this fixture carries no fences


def test_data_card_is_one_aggregation(spark):
    """The card plan: map-side projection → ONE global aggregate (two
    exchanges for the partial/final split, no joins, no Python)."""
    plan = (data_card(_docs(spark))
            ._jdf.queryExecution().executedPlan().toString())
    assert "Join" not in plan
    assert "EvalPython" not in plan


def test_data_card_approx_mode(spark):
    """approx=True swaps exact percentiles for bounded-buffer GK
    percentile_approx — same schema, every non-percentile column
    identical, percentiles within the documented rank-error (exact
    here, since GK at accuracy≫n is lossless on tiny inputs)."""
    exact = data_card(_docs(spark)).collect()[0]
    approx = data_card(_docs(spark), approx=True).collect()[0]
    assert exact.__fields__ == approx.__fields__
    for f in exact.__fields__:
        if f in ("p50_tokens", "p90_tokens"):
            continue
        assert exact[f] == approx[f], f
    # GK with default accuracy is exact on 5 rows, and its result must
    # be a real data point (percentile_approx returns an OBSERVED value,
    # exact interpolates) — both land on integers here
    assert abs(approx.p50_tokens - exact.p50_tokens) <= 1
    assert abs(approx.p90_tokens - exact.p90_tokens) <= 1
    # plan stays ONE aggregation in approx mode too
    plan = (data_card(_docs(spark), approx=True)
            ._jdf.queryExecution().optimizedPlan().toString())
    assert plan.count("Aggregate") <= 2  # partial + final
    assert "percentile_approx" in plan


def test_data_card_code_composition(spark):
    """r14: the card states how much of the corpus is code — fence
    counts/chars (extract_code_blocks' pattern) and code_profile-
    flagged docs — and DuckDB replays the same integers."""
    import duckdb
    import pandas as pd

    rows = [
        (1, "prose only, nothing else here at all", "web", "en"),
        (2, "intro\n```py\nx = 1\n```\nmid\n```\nraw\n```\n", "web", "en"),
        (3, "const x = {};\n    foo(); bar();\n" * 8, "gh", "en"),
        (4, "more plain prose with ordinary words", "web", "en"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string")
    card = data_card(df).collect()[0]
    assert card.n_fenced_docs == 1 and card.n_fences == 2
    assert card.fenced_code_chars == len("x = 1\n") + 1 + len("raw\n")
    assert card.n_code_docs == 1          # doc 3 crosses the blend

    import tempfile as _tf
    with _tf.TemporaryDirectory() as tmp:
        pd.DataFrame(rows, columns=["doc_id", "text", "source",
                                    "lang"]).to_parquet(f"{tmp}/c.parquet")
        got = tuple(data_card(
            spark.read.parquet(f"{tmp}/c.parquet")).collect()[0])
        want = tuple(duckdb.connect().execute(
            data_card_sql(f"read_parquet('{tmp}/c.parquet')")).fetchone())
        assert got == want


def test_data_card_json_code_langs(spark):
    """The published card carries the code-mix table (r14)."""
    df = spark.createDataFrame(
        [(1, "a\n```py\nx\n```\nb\n```py\ny\n```", "web", "en"),
         (2, "```js\nz\n```", "web", "en")],
        "doc_id long, text string, source string, lang string")
    card = data_card_json(df)
    langs = {r["lang"]: r for r in card["code_langs"]}
    assert langs["py"]["n_blocks"] == 2 and langs["py"]["n_docs"] == 1
    assert langs["js"]["n_blocks"] == 1
