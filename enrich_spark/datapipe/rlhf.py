"""Preference-pair preparation for reward-model / DPO training — the
step between a scored-responses table and a preference dataset: given
(prompt_id, response_id, text, score) rows, emit (chosen, rejected)
pairs whose score separation clears a margin, with the label-noise
guards every RLHF data pipeline applies:

- **verbatim guard**: a pair whose two texts are IDENTICAL is label
  noise by construction (same content, different score) — excluded by
  content digest, never by id.
- **margin guard**: pairs closer than ``margin`` carry more annotator
  noise than signal (the standard Bradley-Terry data-prep filter) —
  excluded.
- **degenerate-prompt guard**: prompts with a single (distinct)
  response can't form a pair — they simply emit nothing.

Two modes, both engine-exact and deterministic:

- ``best_vs_worst`` (default): ONE pair per prompt — the top-scored
  response vs the bottom-scored (ties broken by lowest response id,
  so any engine replays the same pick). The usual shape for DPO
  datasets distilled from k-way comparisons.
- ``all_pairs``: every (a, b) with score_a ≥ score_b + margin — the
  full Bradley-Terry expansion reward-model training uses.

Scale shape: everything is keyed by the prompt id, whose per-key
cardinality is the number of responses to one prompt (bounded by the
generation fan-out, like turns-per-dialogue — never a mega-key):
``best_vs_worst`` is one prompt-partitioned min/max aggregate (no
window, no sort beyond the agg); ``all_pairs`` is one prompt-keyed
self-join. No cross join, no driver state, zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["preference_pairs", "preference_pairs_sql"]


def preference_pairs(
    responses: DataFrame,
    prompt_col: str = "prompt_id",
    id_col: str = "response_id",
    text_col: str = "text",
    score_col: str = "score",
    margin: int = 1,
    mode: str = "best_vs_worst",
) -> DataFrame:
    """→ (prompt_id, chosen_id, rejected_id, score_margin) — see the
    module docstring for the guards and modes. ``score_margin`` is
    chosen_score − rejected_score (always ≥ ``margin``)."""
    if mode not in ("best_vs_worst", "all_pairs"):
        raise ValueError(f"preference_pairs: unknown mode {mode!r}")
    # NULL score or NULL text excludes the ROW, never the prompt: an
    # unscored/bodiless response can't vote. Without this filter a
    # NULL-score row would sort FIRST in the struct min (Spark orders
    # NULL fields first), make `best - worst >= margin` NULL, and
    # silently drop the prompt's valid pair — diverging from the SQL
    # mirror, whose min/max/ordered-first skip NULLs.
    base = responses.where(
        F.col(score_col).isNotNull() & F.col(text_col).isNotNull()
    ).select(
        F.col(prompt_col).alias("prompt_id"),
        F.col(id_col).alias("_id"),
        F.col(score_col).alias("_score"),
        F.md5(F.col(text_col)).alias("_digest"),
    )
    if mode == "all_pairs":
        a, b = base.alias("a"), base.alias("b")
        return (
            a.join(b, (F.col("a.prompt_id") == F.col("b.prompt_id"))
                   & (F.col("a._score") >= F.col("b._score")
                      + F.lit(margin))
                   & (F.col("a._digest") != F.col("b._digest")))
            .select(
                F.col("a.prompt_id").alias("prompt_id"),
                F.col("a._id").alias("chosen_id"),
                F.col("b._id").alias("rejected_id"),
                (F.col("a._score") - F.col("b._score")).cast("long")
                .alias("score_margin"))
        )
    # best_vs_worst: ONE aggregate per prompt — min/max over a struct
    # orders by (score, then NEGATED id) so ties deterministically
    # fall to the LOWEST id on both ends; no window, no sort
    best = F.max(F.struct(F.col("_score").alias("s"),
                          (-F.col("_id")).alias("ni"),
                          F.col("_id").alias("i"),
                          F.col("_digest").alias("d")))
    worst = F.min(F.struct(F.col("_score").alias("s"),
                           F.col("_id").alias("ni"),
                           F.col("_id").alias("i"),
                           F.col("_digest").alias("d")))
    agg = base.groupBy("prompt_id").agg(best.alias("_b"),
                                        worst.alias("_w"))
    return agg.where(
        (F.col("_b.s") - F.col("_w.s") >= F.lit(margin))
        & (F.col("_b.d") != F.col("_w.d"))
    ).select(
        "prompt_id",
        F.col("_b.i").alias("chosen_id"),
        F.col("_w.i").alias("rejected_id"),
        (F.col("_b.s") - F.col("_w.s")).cast("long")
        .alias("score_margin"),
    )


def preference_pairs_sql(
    responses_sql: str,
    prompt_expr: str = "prompt_id",
    id_expr: str = "response_id",
    text_expr: str = "text",
    score_expr: str = "score",
    margin: int = 1,
    mode: str = "best_vs_worst",
) -> str:
    """DuckDB mirror of :func:`preference_pairs` (same guards, same
    tie-breaks)."""
    base = f"""
        SELECT {prompt_expr} AS prompt_id, {id_expr} AS rid,
               {score_expr} AS s, md5({text_expr}) AS d
        FROM {responses_sql}
        WHERE {score_expr} IS NOT NULL AND {text_expr} IS NOT NULL
    """
    if mode == "all_pairs":
        return f"""
            WITH base AS ({base})
            SELECT a.prompt_id,
                   a.rid AS chosen_id, b.rid AS rejected_id,
                   CAST(a.s - b.s AS BIGINT) AS score_margin
            FROM base a JOIN base b
              ON a.prompt_id = b.prompt_id
             AND a.s >= b.s + {int(margin)}
             AND a.d <> b.d
        """
    # best: max score, ties to LOWEST id; worst: min score, ties to
    # lowest id — DuckDB's ordered-aggregate first() replays the same
    # tie-break the Spark struct min/max encodes
    return f"""
        WITH base AS ({base}),
        agg AS (
          SELECT prompt_id,
                 first(rid ORDER BY s DESC, rid ASC) AS chosen_id,
                 first(d   ORDER BY s DESC, rid ASC) AS bd,
                 max(s) AS bs,
                 first(rid ORDER BY s ASC, rid ASC) AS rejected_id,
                 first(d   ORDER BY s ASC, rid ASC) AS wd,
                 min(s) AS ws
          FROM base GROUP BY prompt_id
        )
        SELECT prompt_id, chosen_id, rejected_id,
               CAST(bs - ws AS BIGINT) AS score_margin
        FROM agg
        WHERE bs - ws >= {int(margin)} AND bd <> wd
    """
