"""Data card — the one-row corpus documentation aggregate (the
"Datasheets for Datasets" / model-card companion a training-data
pipeline publishes with every corpus snapshot: Gebru et al. 2021,
arXiv:1803.09010).

One pass over the corpus computes the whole card: scale (docs, chars,
whitespace tokens, bytes), composition (distinct sources/languages and
their top entries), duplication (exact-dup fraction), text-quality
aggregates (mean/percentile lengths, quality-gate pass rate), PII
exposure counts (emails/IPs detected, not scrubbed), and code
composition (fenced docs/blocks/chars + code_profile-flagged docs —
r14). Every statistic
is an ALGEBRAIC aggregate (sum/count/min/max/count-distinct or an
exact percentile over a coarse distribution), so:

- the whole card is ONE job — a map-side projection, one global
  aggregation (plus one tiny groupBy for the top-source table);
- every number is engine-exact or integer, so the card sits inside
  the value-hash oracle gate (integers and exact percentiles only —
  no approx sketches in the published artifact);
- at 100 TB the shuffle carries one partial-agg row per partition.

`data_card` returns the one-row DataFrame (the gate-able form);
`data_card_json` collects it into a plain dict for publication next to
plans/manifest.dataset_manifest's content commitment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IPV4 = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"

from . import text as _T  # noqa: E402 — regex constants shared with the router


def _is_code(t) -> "F.Column":
    """The code_profile blend as a 0/1 column (same constants, same
    integer arithmetic — threshold 2000 bp, see text.code_profile)."""
    chars = F.length(t)
    raw = (F.regexp_count(t, F.lit(_T.CODE_SYM_RE)).cast("long") * 2
           + F.regexp_count(t, F.lit(_T.CODE_OPS_RE)).cast("long") * 6
           + F.regexp_count(t, F.lit(_T.CODE_INDENT_RE)).cast("long") * 8
           + F.regexp_count(t, F.lit(_T.CODE_KW_RE)).cast("long") * 8)
    score = F.when(chars > 0, F.least(
        F.lit(10000), F.floor(raw * 10000 / chars))).otherwise(F.lit(0))
    return (score >= 2000).cast("int")


def data_card(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    lang_col: str | None = "lang",
    approx: bool = False,
    approx_accuracy: int = 10_000,
) -> DataFrame:
    """→ ONE row: the corpus data card. All integers / exact
    percentiles — hash-gate stable.

    Memory contract of the percentile columns:

    - ``approx=False`` (default, the hash-gated form): exact
      ``F.percentile`` buffers EVERY ``_words`` value in one final
      aggregation buffer — O(n_docs) driver-adjacent memory. Fine at
      test scale; at 10¹⁰ documents that is tens of GB on one
      executor, so the full-corpus publication run should use
      ``approx=True``.
    - ``approx=True``: Greenwald–Khanna ``percentile_approx`` with a
      FIXED-SIZE buffer (O(accuracy) per partial, mergeable map-side),
      so the final buffer is bounded regardless of corpus size. Error
      ≤ 1/accuracy of rank; the result is still an integer column, but
      it is NOT value-hash-reproducible against the exact oracle, so
      the gate keeps exact mode.
    """
    words = F.filter(
        F.split(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")),
                " "),
        lambda w: w != "")
    n_words = F.size(words)
    base = docs.select(
        F.col(id_col).alias("_id"),
        F.col(source_col).alias("_src"),
        (F.col(lang_col) if lang_col and lang_col in docs.columns
         else F.lit(None).cast("string")).alias("_lang"),
        F.length(text_col).alias("_chars"),
        F.octet_length(text_col).alias("_bytes"),
        n_words.alias("_words"),
        F.md5(F.col(text_col)).alias("_h"),
        F.regexp_count(F.col(text_col), F.lit(_EMAIL)).alias("_emails"),
        F.regexp_count(F.col(text_col), F.lit(_IPV4)).alias("_ips"),
        # code composition (r14): fence counts/chars + the
        # code_profile blend, all map-side regexp — a card that says
        # how much of the corpus is code, not just how much is text
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(_T.FENCE_RE),
                                    2)).alias("_nf"),
        F.length(F.array_join(
            F.regexp_extract_all(F.col(text_col), F.lit(_T.FENCE_RE), 2),
            "\n")).alias("_fchars"),
        _is_code(F.col(text_col)).alias("_iscode"),
    )
    if approx:
        p50 = F.percentile_approx("_words", F.lit(0.5),
                                  F.lit(approx_accuracy))
        p90 = F.percentile_approx("_words", F.lit(0.9),
                                  F.lit(approx_accuracy))
    else:
        p50 = F.floor(F.percentile("_words", F.lit(0.5)))
        p90 = F.floor(F.percentile("_words", F.lit(0.9)))
    return base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_chars").cast("long").alias("total_chars"),
        F.sum("_bytes").cast("long").alias("total_bytes"),
        F.sum("_words").cast("long").alias("total_tokens"),
        F.count_distinct("_src").cast("long").alias("n_sources"),
        F.count_distinct("_lang").cast("long").alias("n_langs"),
        F.count_distinct("_h").cast("long").alias("n_unique_texts"),
        (F.count(F.lit(1)) - F.count_distinct("_h")).cast("long")
        .alias("n_exact_dups"),
        F.min("_words").cast("long").alias("min_tokens"),
        F.max("_words").cast("long").alias("max_tokens"),
        # exact mode: quantile_cont-replayable, floored to integers for
        # the hash gate; approx mode: bounded-buffer GK (see docstring)
        p50.cast("long").alias("p50_tokens"),
        p90.cast("long").alias("p90_tokens"),
        F.sum("_emails").cast("long").alias("pii_emails"),
        F.sum("_ips").cast("long").alias("pii_ipv4"),
        F.sum(F.when(F.col("_words") >= 10, 1).otherwise(0)).cast("long")
        .alias("n_docs_10plus_tokens"),
        F.sum(F.when(F.col("_nf") >= 1, 1).otherwise(0)).cast("long")
        .alias("n_fenced_docs"),
        F.sum("_nf").cast("long").alias("n_fences"),
        F.sum("_fchars").cast("long").alias("fenced_code_chars"),
        F.sum("_iscode").cast("long").alias("n_code_docs"),
    )


def source_table(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """The card's composition table: per-source doc/token counts and
    corpus share in basis points (integer — floor(n·10⁴/total))."""
    words = F.filter(
        F.split(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")),
                " "),
        lambda w: w != "")
    per = (docs.select(F.col(source_col).alias("source"),
                       F.size(words).alias("_w"))
           .groupBy("source")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum("_w").cast("long").alias("n_tokens")))
    total = per.agg(F.sum("n_docs")).collect()[0][0] or 0
    return per.select(
        "source", "n_docs", "n_tokens",
        F.expr(f"n_docs * 10000 div {max(total, 1)}").cast("long")
        .alias("share_bp"))


def data_card_json(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    lang_col: str | None = "lang",
    top_sources: int = 20,
    top_code_langs: int = 20,
) -> dict:
    """Collect the card + composition tables into a publishable dict
    (three bounded collects: one row + top-N sources + top-N fence
    languages — the code-mix table, r14)."""
    from .text import fence_language_mix

    card = data_card(docs, text_col, id_col, source_col,
                     lang_col).collect()[0].asDict()
    srcs = (source_table(docs, text_col, source_col)
            .orderBy(F.col("n_docs").desc(), F.col("source").asc())
            .limit(top_sources).collect())
    card["sources"] = [r.asDict() for r in srcs]
    langs = (fence_language_mix(docs, text_col=text_col, id_col=id_col)
             .orderBy(F.col("n_blocks").desc(), F.col("lang").asc())
             .limit(top_code_langs).collect())
    card["code_langs"] = [r.asDict() for r in langs]
    return card


def data_card_sql(from_sql: str, id_expr: str = "doc_id",
                  text_expr: str = "text", source_expr: str = "source",
                  lang_expr: str = "lang") -> str:
    """DuckDB mirror of :func:`data_card` (exact same integers)."""
    words = (f"list_filter(string_split(trim(regexp_replace("
             f"{text_expr}, '\\s+', ' ', 'g')), ' '), w -> w <> '')")
    craw = (f"(len(regexp_extract_all({text_expr}, '{_T.CODE_SYM_RE}')) * 2"
            f" + len(regexp_extract_all({text_expr}, '{_T.CODE_OPS_RE}')) * 6"
            f" + len(regexp_extract_all({text_expr}, "
            "chr(10) || '(    |' || chr(9) || ')')) * 8"
            f" + len(regexp_extract_all({text_expr}, '{_T.CODE_KW_RE}')) * 8)")
    cscore = (f"CASE WHEN length({text_expr}) > 0 THEN least(10000, "
              f"floor({craw} * 10000 / length({text_expr}))) ELSE 0 END")
    return f"""
        WITH b AS (
            SELECT {id_expr} AS _id, {source_expr} AS _src,
                   {lang_expr} AS _lang,
                   length({text_expr}) AS _chars,
                   octet_length(CAST({text_expr} AS BLOB)) AS _bytes,
                   len({words}) AS _words,
                   md5({text_expr}) AS _h,
                   length(regexp_extract_all({text_expr},
                       '{_EMAIL}')) AS _emails,
                   length(regexp_extract_all({text_expr},
                       '{_IPV4}')) AS _ips,
                   len(regexp_extract_all({text_expr},
                       '{_T.FENCE_RE}', 2)) AS _nf,
                   length(coalesce(array_to_string(regexp_extract_all(
                       {text_expr}, '{_T.FENCE_RE}', 2), chr(10)), ''))
                     AS _fchars,
                   CASE WHEN {cscore} >= 2000 THEN 1 ELSE 0 END
                     AS _iscode
            FROM {from_sql}
        )
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(_chars) AS BIGINT) AS total_chars,
               CAST(sum(_bytes) AS BIGINT) AS total_bytes,
               CAST(sum(_words) AS BIGINT) AS total_tokens,
               CAST(count(DISTINCT _src) AS BIGINT) AS n_sources,
               CAST(count(DISTINCT _lang) AS BIGINT) AS n_langs,
               CAST(count(DISTINCT _h) AS BIGINT) AS n_unique_texts,
               CAST(count(*) - count(DISTINCT _h) AS BIGINT) AS n_exact_dups,
               CAST(min(_words) AS BIGINT) AS min_tokens,
               CAST(max(_words) AS BIGINT) AS max_tokens,
               CAST(floor(quantile_cont(_words, 0.5)) AS BIGINT) AS p50_tokens,
               CAST(floor(quantile_cont(_words, 0.9)) AS BIGINT) AS p90_tokens,
               CAST(sum(_emails) AS BIGINT) AS pii_emails,
               CAST(sum(_ips) AS BIGINT) AS pii_ipv4,
               CAST(sum(CASE WHEN _words >= 10 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_docs_10plus_tokens,
               CAST(sum(CASE WHEN _nf >= 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_fenced_docs,
               CAST(sum(_nf) AS BIGINT) AS n_fences,
               CAST(sum(_fchars) AS BIGINT) AS fenced_code_chars,
               CAST(sum(_iscode) AS BIGINT) AS n_code_docs
        FROM b
    """
