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
  response vs the WORST response whose text differs from it (ties
  broken by lowest response id, so any engine replays the same pick).
  The usual shape for DPO datasets distilled from k-way comparisons.
  r14: when the absolute worst is a verbatim copy of the best, the
  pair falls back to the worst among DISTINCT digests instead of
  dropping the prompt (the r13 verdict's "best vs worst among
  distinct" policy) — a prompt emits nothing only when every response
  is textually identical to the best or the margin isn't met.
- ``all_pairs``: every (a, b) with score_a ≥ score_b + margin — the
  full Bradley-Terry expansion reward-model training uses.

Dirty-key guards (r14, both optional and SQL-mirrored): a corpus with
a default/empty prompt key upstream can hand ``all_pairs`` a mega-key
whose k responses mean O(k²) pairs. ``max_responses_per_prompt=R``
bounds the JOIN ITSELF by keeping the R most EXTREME responses per
prompt — top ⌈R/2⌉ by (score desc, seeded md5, id) ∪ bottom ⌊R/2⌋ by
(score asc, same tie) — extremes, not top-R, because pairs need score
CONTRAST (a top-only cap on a flat-score mega-key keeps 20 tied
responses and emits nothing). Both ranks come from one pass (two
row_number windows sharing one prompt-keyed Exchange — the SQL
mirror's literal shape; r14 replaced the two-domain_cap union +
dropDuplicates form, which built the input subplan twice and paid two
extra shuffles for the same kept set), salted two-phase against dirty
mega-keys with domain_cap's exactness proof applied per direction.
``max_pairs_per_prompt`` bounds the OUTPUT exactly (the top-P pairs
by (score_margin desc, seeded md5 of the pair key)). On a clean
corpus (generation fan-out k ≤ R) the response cap is a NO-OP: a row
with top-rank t is kept when t ≤ ⌈R/2⌉ or its bottom-rank k+1−t ≤
⌊R/2⌋, and k ≤ R makes one of the two always true.

Scale shape: everything is keyed by the prompt id, whose per-key
cardinality is the number of responses to one prompt (bounded by the
generation fan-out — and by ``max_responses_per_prompt`` against dirty
keys): ``best_vs_worst`` is one prompt-partitioned window + one
aggregate on the SAME key (one Exchange total — the aggregate reuses
the window's partitioning); ``all_pairs`` is one prompt-keyed
aggregate whose per-key array is the generation fan-out (≤ R under
the response cap), the k² expansion streamed map-side through two
Generates — the same per-key memory a sort-merge self-join buffers,
half the subplan executions, no join shuffle (r14; the join remains
the SQL mirror's shape). No cross join, no driver state, zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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
    max_responses_per_prompt: int | None = None,
    max_pairs_per_prompt: int | None = None,
    seed: int = 42,
    salt_factor: int = 64,
) -> DataFrame:
    """→ (prompt_id, chosen_id, rejected_id, score_margin) — see the
    module docstring for the guards, modes and dirty-key caps.
    ``score_margin`` is chosen_score − rejected_score (always ≥
    ``margin``). The caps only apply to ``all_pairs`` —
    ``best_vs_worst`` is one-pair-per-prompt by construction.
    ``salt_factor`` is domain_cap's two-phase salting knob for the cap
    windows (output-invariant): keep the default 64 against dirty
    mega-keys; pass 1 on small/clean inputs to run the plain
    single-window plan (the r14 bench lesson: 4 salted window phases
    on a clean fixture tripled the row for zero benefit)."""
    if mode not in ("best_vs_worst", "all_pairs"):
        raise ValueError(f"preference_pairs: unknown mode {mode!r}")
    # NULL score or NULL text excludes the ROW, never the prompt: an
    # unscored/bodiless response can't vote. Without this filter a
    # NULL-score row would sort FIRST (Spark orders NULLs first in
    # both the window and the struct min), silently dropping the
    # prompt's valid pair — diverging from the SQL mirror, whose
    # min/max/ordered-first skip NULLs.
    base = responses.where(
        F.col(score_col).isNotNull() & F.col(text_col).isNotNull()
    ).select(
        F.col(prompt_col).alias("prompt_id"),
        F.col(id_col).alias("_id"),
        F.col(score_col).alias("_score"),
        F.md5(F.col(text_col)).alias("_digest"),
    )
    if mode == "all_pairs":
        from .curation import domain_cap

        # The self-join this aggregate replaced could never match a
        # NULL prompt key (NULL = NULL is NULL), and the SQL mirror
        # still joins — but groupBy would collect NULL prompts into a
        # real group. Drop them so NULL-prompt rows keep emitting
        # nothing, exactly as the join (and the mirror) did.
        base = base.where(F.col("prompt_id").isNotNull())
        if max_responses_per_prompt is not None:
            # THE quadratic guard: bound the join's per-key fan-in
            # before any pair exists — keep the score EXTREMES (see
            # module docstring), computed in the SQL mirror's own
            # one-pass two-rank shape (r14 optimization): BOTH ranks —
            # top (score desc, tie) and bottom (score asc, same tie) —
            # come from two row_number windows over the SAME partition
            # key, so one Exchange serves both directions and the
            # union + (prompt,id) dropDuplicates of the old
            # two-domain_cap form (its whole extra subplan build, its
            # extra shuffle, its two SortAggregates) disappears. A row
            # is kept iff top-rank ≤ ⌈R/2⌉ OR bottom-rank ≤ ⌊R/2⌋ —
            # the same kept set, row for row. Salting keeps the
            # domain_cap two-phase exactness argument per DIRECTION: a
            # true top-rank-≤n row's bucket rank never exceeds its
            # domain rank (survives phase 1), and every row ranked
            # ahead of a kept row is itself kept, so phase-2 ranks over
            # survivors equal true domain ranks.
            top_n = (max_responses_per_prompt + 1) // 2
            bot_n = max_responses_per_prompt // 2
            tie = F.md5(F.concat(F.lit(f"{seed}:"),
                                 F.col("_id").cast("string")))
            o_top = [F.col("_score").cast("long").desc_nulls_last(),
                     tie.asc(), F.col("_id").asc()]
            o_bot = [(-F.col("_score")).cast("long").desc_nulls_last(),
                     tie.asc(), F.col("_id").asc()]

            def _extremes(df, *pkeys):
                wt = Window.partitionBy(*pkeys).orderBy(*o_top)
                wb = Window.partitionBy(*pkeys).orderBy(*o_bot)
                kept = ((F.row_number().over(wt) <= top_n)
                        | (F.row_number().over(wb) <= bot_n)
                        if bot_n else
                        (F.row_number().over(wt) <= top_n))
                return df.withColumn("_keep", kept) \
                    .where("_keep").drop("_keep")

            if salt_factor > 1:
                salt = F.pmod(F.xxhash64(F.col("_id")),
                              F.lit(salt_factor))
                base = _extremes(
                    base.withColumn("_rsalt", salt),
                    "prompt_id", "_rsalt").drop("_rsalt")
            base = _extremes(base, "prompt_id")
        # r14: the Bradley-Terry expansion as ONE prompt-keyed
        # aggregate + streamed map-side pair generation, replacing the
        # self-join (which executed the whole input subplan twice and
        # paid two shuffle+sorts). Per-prompt responses are collected
        # into an array — bounded state: the per-key cardinality IS the
        # generation fan-out, and under ``max_responses_per_prompt`` it
        # is ≤ R by construction (the same O(k) a sort-merge self-join
        # buffers per key) — then two Generates stream the qualifying
        # (a, b) pairs without ever materializing the k² pair array.
        # Bag semantics identical to the join for every input.
        g = base.groupBy("prompt_id").agg(
            F.collect_list(F.struct("_id", "_score", "_digest"))
            .alias("_rs"))
        expanded = g.select(
            "prompt_id", F.explode("_rs").alias("_a"), "_rs")
        qual = F.filter(
            "_rs",
            lambda b: (F.col("_a._score") >= b.getField("_score")
                       + F.lit(margin))
            & (F.col("_a._digest") != b.getField("_digest")))
        pairs = (
            expanded.select("prompt_id", "_a",
                            F.explode(qual).alias("_b"))
            .select(
                "prompt_id",
                F.col("_a._id").alias("chosen_id"),
                F.col("_b._id").alias("rejected_id"),
                (F.col("_a._score") - F.col("_b._score")).cast("long")
                .alias("score_margin"))
        )
        if max_pairs_per_prompt is not None:
            # exact output bound: top-P pairs per prompt by (margin
            # desc, seeded md5 of the pair key) — same domain_cap
            # machinery, the pair key standing in for the doc id
            pairs = domain_cap(
                pairs.withColumn(
                    "_pair_key",
                    F.concat(F.col("chosen_id").cast("string"),
                             F.lit(":"),
                             F.col("rejected_id").cast("string"))),
                max_pairs_per_prompt, domain_col="prompt_id",
                score_col="score_margin", id_col="_pair_key", seed=seed,
                salt_factor=salt_factor,
            ).drop("domain_rank", "_pair_key")
        return pairs
    # best_vs_worst (r14 window formulation): the prompt-partitioned
    # window pins the BEST response (score desc, id asc — same
    # tie-break the r13 struct max encoded) on every row; rows whose
    # digest equals the best's are excluded and ONE aggregate picks
    # the worst of what remains (min (score, id) — the best-distinct
    # fallback). The aggregate groups on the window's own partition
    # key, so the plan carries ONE Exchange total, and per-partition
    # sort state is the prompt fan-out — no collect_list, no join.
    w = Window.partitionBy("prompt_id").orderBy(
        F.col("_score").desc(), F.col("_id").asc())
    ann = base.select(
        "prompt_id", "_id", "_score", "_digest",
        F.first("_id").over(w).alias("_bid"),
        F.first("_score").over(w).alias("_bs"),
        F.first("_digest").over(w).alias("_bd"),
    )
    worst = F.min(F.struct(F.col("_score").alias("s"),
                           F.col("_id").alias("i")))
    return (
        ann.where(F.col("_digest") != F.col("_bd"))
        .groupBy("prompt_id")
        .agg(F.min("_bid").alias("chosen_id"),
             F.min("_bs").alias("_bs2"),
             worst.alias("_w"))
        .where(F.col("_bs2") - F.col("_w.s") >= F.lit(margin))
        .select(
            "prompt_id",
            "chosen_id",
            F.col("_w.i").alias("rejected_id"),
            (F.col("_bs2") - F.col("_w.s")).cast("long")
            .alias("score_margin"))
    )


def preference_pairs_sql(
    responses_sql: str,
    prompt_expr: str = "prompt_id",
    id_expr: str = "response_id",
    text_expr: str = "text",
    score_expr: str = "score",
    margin: int = 1,
    mode: str = "best_vs_worst",
    max_responses_per_prompt: int | None = None,
    max_pairs_per_prompt: int | None = None,
    seed: int = 42,
) -> str:
    """DuckDB mirror of :func:`preference_pairs` (same guards, same
    tie-breaks, same caps)."""
    base = f"""
        SELECT {prompt_expr} AS prompt_id, {id_expr} AS rid,
               {score_expr} AS s, md5({text_expr}) AS d
        FROM {responses_sql}
        WHERE {score_expr} IS NOT NULL AND {text_expr} IS NOT NULL
    """
    if mode == "all_pairs":
        if max_responses_per_prompt is not None:
            # domain_cap's single-window oracle shape, both extremes:
            # top ⌈R/2⌉ by (score desc, seeded md5, id) plus bottom
            # ⌊R/2⌋ by (score asc, same tie)
            top_n = (max_responses_per_prompt + 1) // 2
            bot_n = max_responses_per_prompt // 2
            base = f"""
                SELECT prompt_id, rid, s, d FROM (
                  SELECT *,
                    row_number() OVER (PARTITION BY prompt_id
                      ORDER BY CAST(s AS BIGINT) DESC NULLS LAST,
                               md5('{int(seed)}:' || rid) ASC, rid ASC)
                      AS _rt,
                    row_number() OVER (PARTITION BY prompt_id
                      ORDER BY CAST(-s AS BIGINT) DESC NULLS LAST,
                               md5('{int(seed)}:' || rid) ASC, rid ASC)
                      AS _rb
                  FROM ({base}))
                WHERE _rt <= {top_n} OR _rb <= {bot_n}
            """
        pairs = f"""
            WITH base AS ({base})
            SELECT a.prompt_id,
                   a.rid AS chosen_id, b.rid AS rejected_id,
                   CAST(a.s - b.s AS BIGINT) AS score_margin
            FROM base a JOIN base b
              ON a.prompt_id = b.prompt_id
             AND a.s >= b.s + {int(margin)}
             AND a.d <> b.d
        """
        if max_pairs_per_prompt is not None:
            pairs = f"""
                SELECT prompt_id, chosen_id, rejected_id, score_margin
                FROM (
                  SELECT *, row_number() OVER (PARTITION BY prompt_id
                    ORDER BY score_margin DESC NULLS LAST,
                             md5('{int(seed)}:' || chosen_id || ':'
                                 || rejected_id) ASC,
                             chosen_id || ':' || rejected_id ASC) AS _pr
                  FROM ({pairs}))
                WHERE _pr <= {int(max_pairs_per_prompt)}
            """
        return pairs
    # best_vs_worst: the window pins the best (score DESC, rid ASC —
    # ties to lowest id), rows matching its digest drop, the aggregate
    # takes the worst of the remainder (s ASC, rid ASC) — the same
    # best-distinct fallback the Spark plan encodes
    return f"""
        WITH base AS ({base}),
        ann AS (
          SELECT prompt_id, rid, s, d,
                 first_value(rid) OVER w AS bid,
                 first_value(s)   OVER w AS bs,
                 first_value(d)   OVER w AS bd
          FROM base
          WINDOW w AS (PARTITION BY prompt_id
                       ORDER BY s DESC, rid ASC)
        )
        SELECT prompt_id,
               min(bid) AS chosen_id,
               first(rid ORDER BY s ASC, rid ASC) AS rejected_id,
               CAST(min(bs) - min(s) AS BIGINT) AS score_margin
        FROM ann
        WHERE d <> bd
        GROUP BY prompt_id
        HAVING min(bs) - min(s) >= {int(margin)}
    """
