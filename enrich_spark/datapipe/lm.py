"""Corpus n-gram language-model scoring — the CCNet-style quality
signal: score every document by how "expected" its token stream is
under an n-gram LM trained on a reference corpus (Wenzek et al. 2020
use a Wikipedia-trained KenLM; the scoring side here is engine-native
and takes ANY counts table). The smoothing is stupid backoff (Brants
et al. 2007, "Large Language Models in Machine Translation"):

    S(w | w_prev) = c(w_prev w) / c(w_prev)        if the bigram exists
                  = alpha * S(w)                    otherwise
    S(w)          = c(w) / T                        if the unigram exists
                  = 1 / T                           otherwise (OOV floor)

— no normalization, no discounting: the backoff weight alpha (0.4 in
the paper) is a constant, which is exactly what makes the model a pair
of count JOINS instead of a special-purpose runtime.

Determinism discipline: per-token log10 scores are floored into
INTEGER micro-units (floor(1e6·log10 p)) before aggregation, so the
per-doc sums are order-independent integer arithmetic — the same
all-integer rule every gated operator here follows; float enters only
inside a single log10 whose floor is replayed identically by DuckDB.

Scale shape: train = ONE groupBy over exploded tokens + bigrams
(key-bounded by vocabulary, map-side combined). Score = explode +
three equi-joins against the counts table (Catalyst broadcasts it
while it fits, falls back to a shuffled hash join beyond that) + one
per-doc groupBy. No windows, no driver state, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["lm_counts", "lm_score", "lm_counts_sql", "lm_score_sql",
           "token_divergence", "token_divergence_tagged",
           "divergence_summary", "token_divergence_sql"]


def _words(text):
    return F.split(F.trim(F.regexp_replace(F.lower(text), "\\s+", " ")),
                   " ")


def lm_counts(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token unigram + bigram counts over a training corpus:
    ``(gram, n, cnt)`` with n ∈ {1, 2}; the bigram gram is
    ``w_prev || ' ' || w``. Same normalization as the shingle family
    (lowercase, whitespace-collapsed). ONE union of two
    map-side-combined groupBys — vocabulary-bounded output."""
    w = docs.select(_words(F.col(text_col)).alias("_w"))
    uni = (w.select(F.explode("_w").alias("gram"))
           .groupBy("gram").agg(F.count(F.lit(1)).alias("cnt"))
           .select("gram", F.lit(1).alias("n"), "cnt"))
    pairs = F.when(
        F.size("_w") >= 2,
        F.transform(
            F.slice("_w", 1, F.size("_w") - 1),
            lambda x, i: F.concat(x, F.lit(" "),
                                  F.element_at("_w", i + 2))),
    ).otherwise(F.array())
    big = (w.select(F.explode(pairs).alias("gram"))
           .groupBy("gram").agg(F.count(F.lit(1)).alias("cnt"))
           .select("gram", F.lit(2).alias("n"), "cnt"))
    return uni.unionByName(big)


def lm_score(
    docs: DataFrame,
    counts: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.4,
    hash_join_keys: bool = True,
) -> DataFrame:
    """Score each document under the stupid-backoff LM in ``counts``
    (a :func:`lm_counts` frame — typically trained on a REFERENCE
    corpus, CCNet-style). Output per doc:

    - ``n_tokens``
    - ``logp_micro``: Σ floor(1e6·log10 S(token)) — integer micro-log
      (≈ −1e6·log-perplexity·n_tokens), order-independent
    - ``avg_logp_micro``: logp_micro div n_tokens (integer floor) —
      the per-token quality score a threshold filter cuts on (higher =
      more fluent under the reference LM)

    First token scores as a unigram; later tokens as bigram-else-
    backoff. OOV floor: 1/T (T = total training tokens).

    ``hash_join_keys=False`` is the parity/debug switch (r14, r13
    advice): it joins bigrams on the raw string instead of the int64
    hash — collision-proof and byte-identical to the DuckDB oracle's
    join, at roughly double the shuffle bytes. If the gate ever
    mismatches on an lm row, rerun with False: same result ⇒ not a
    hash collision; different result ⇒ collision found, attributed in
    one rerun."""
    uni = counts.where(F.col("n") == 1).select(
        F.col("gram").alias("_ug"), F.col("cnt").alias("_uc"))
    # int64-hash the bigram join key at build time (the containment-
    # prefix lesson, dedup.py: every shuffle/sort moves 8-byte longs
    # instead of ~16+-byte "w1 w2" strings — halves the bytes through
    # the vocabulary join when it doesn't broadcast). The hash is a
    # JOIN KEY only, never an output value; an xxhash64 collision
    # between two distinct bigrams is the accepted approximation
    # (n²/2⁶⁵ — negligible below ~10⁹ distinct bigrams). The DuckDB
    # oracle joins on the string; parity holds absent collisions.
    bkey = (F.xxhash64("gram") if hash_join_keys
            else F.col("gram"))
    big = counts.where(F.col("n") == 2).select(
        bkey.alias("_bgh"), F.col("cnt").alias("_bc"))
    total = uni.agg(F.sum("_uc").cast("double").alias("_t"))

    w = docs.select(F.col(id_col), _words(F.col(text_col)).alias("_w"))
    toks = w.select(
        F.col(id_col),
        F.explode(F.transform(
            "_w",
            lambda x, i: F.struct(
                x.alias("_tok"),
                F.when(i > 0, F.element_at("_w", i)).alias("_prev")),
        )).alias("_s"),
    ).select(id_col, "_s._tok", "_s._prev")

    j = (toks
         .join(F.broadcast(total))
         .join(uni, F.col("_tok") == F.col("_ug"), "left")
         .join(big,
               (F.xxhash64(F.concat_ws(" ", "_prev", "_tok"))
                if hash_join_keys
                else F.concat_ws(" ", "_prev", "_tok"))
               == F.col("_bgh"),
               "left")
         .join(uni.select(F.col("_ug").alias("_pg"),
                          F.col("_uc").alias("_pc")),
               F.col("_prev") == F.col("_pg"), "left"))
    unigram_p = (F.coalesce(F.col("_uc").cast("double"), F.lit(1.0))
                 / F.col("_t"))
    logp = (
        F.when(F.col("_prev").isNotNull() & F.col("_bc").isNotNull(),
               F.log10(F.col("_bc").cast("double")
                       / F.col("_pc").cast("double")))
        .when(F.col("_prev").isNotNull(),
              F.log10(F.lit(float(alpha)) * unigram_p))
        .otherwise(F.log10(unigram_p))
    )
    return (j.select(id_col,
                     F.floor(logp * 1_000_000).cast("long")
                     .alias("_lp"))
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_tokens"),
                 F.sum("_lp").cast("long").alias("logp_micro"))
            .withColumn("avg_logp_micro",
                        F.expr("logp_micro div n_tokens")
                        .cast("long")))


def lm_counts_sql(
    from_sql: str,
    text_expr: str = "text",
) -> str:
    """DuckDB mirror of :func:`lm_counts`."""
    return f"""
        WITH w AS (
          SELECT string_split(trim(regexp_replace(lower({text_expr}),
                     '\\s+', ' ', 'g')), ' ') AS ws
          FROM {from_sql}
        ),
        uni AS (
          SELECT t.tok AS gram, 1 AS n, count(*) AS cnt
          FROM w, unnest(ws) AS t(tok) GROUP BY t.tok
        ),
        big AS (
          SELECT g.gram, 2 AS n, count(*) AS cnt
          FROM w, unnest(CASE WHEN len(ws) >= 2
                 THEN list_transform(range(1, len(ws)),
                      i -> ws[i] || ' ' || ws[i + 1])
                 ELSE [] END) AS g(gram)
          GROUP BY g.gram
        )
        SELECT gram, n, CAST(cnt AS BIGINT) AS cnt FROM uni
        UNION ALL
        SELECT gram, n, CAST(cnt AS BIGINT) AS cnt FROM big
    """


def lm_score_sql(
    docs_sql: str,
    counts_sql: str,
    text_expr: str = "text",
    id_expr: str = "doc_id",
    id_alias: str = "doc_id",
    alpha: float = 0.4,
) -> str:
    """DuckDB mirror of :func:`lm_score` (same floor micro-units, same
    backoff branches)."""
    return f"""
        WITH counts AS ({counts_sql}),
        uni AS (SELECT gram, cnt FROM counts WHERE n = 1),
        big AS (SELECT gram, cnt FROM counts WHERE n = 2),
        tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS t FROM uni),
        w AS (
          SELECT {id_expr} AS {id_alias},
                 string_split(trim(regexp_replace(lower({text_expr}),
                     '\\s+', ' ', 'g')), ' ') AS ws
          FROM {docs_sql}
        ),
        toks AS (
          SELECT {id_alias}, ws[i] AS tok,
                 CASE WHEN i > 1 THEN ws[i - 1] END AS prev
          FROM w, unnest(range(1, len(ws) + 1)) AS r(i)
        ),
        scored AS (
          SELECT {id_alias},
            CAST(floor(1000000 * (
              CASE WHEN prev IS NOT NULL AND b.cnt IS NOT NULL
                   THEN log10(CAST(b.cnt AS DOUBLE)
                              / CAST(p.cnt AS DOUBLE))
                   WHEN prev IS NOT NULL
                   THEN log10({float(alpha)!r}
                              * COALESCE(CAST(u.cnt AS DOUBLE), 1.0)
                              / tot.t)
                   ELSE log10(COALESCE(CAST(u.cnt AS DOUBLE), 1.0)
                              / tot.t)
              END)) AS BIGINT) AS lp
          FROM toks CROSS JOIN tot
          LEFT JOIN uni u ON u.gram = toks.tok
          LEFT JOIN big b ON prev IS NOT NULL
                         AND b.gram = prev || ' ' || toks.tok
          LEFT JOIN uni p ON p.gram = toks.prev
        )
        SELECT {id_alias},
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(lp) AS BIGINT) AS logp_micro,
               CAST(sum(lp) // count(*) AS BIGINT) AS avg_logp_micro
        FROM scored GROUP BY {id_alias}
    """


# ---------------------------------------------------------------------------
# cross-corpus token-distribution drift — the mix-monitoring complement
# of lm_score: not "is this DOC fluent under the reference" but "is this
# CORPUS drifting away from the reference distribution"


def token_divergence(
    counts_a: DataFrame,
    counts_b: DataFrame,
) -> DataFrame:
    """Per-token drift between two corpora's unigram distributions
    (two :func:`lm_counts` frames; their n==1 rows are used). Additive
    (+1) smoothing over the JOINT vocabulary keeps every log finite:
    p = (cnt_a+1)/(T_a+V), q = (cnt_b+1)/(T_b+V).

    Output per token: ``cnt_a``, ``cnt_b``, and integer micro-unit
    contributions ``kl_ab_micro`` = floor(1e6·p·log10(p/q)),
    ``kl_ba_micro``, ``js_micro`` (Jensen-Shannon: ½p·log10(p/m) +
    ½q·log10(q/m), m=(p+q)/2 — bounded, symmetric, the standard drift
    alarm). Contributions are floored BEFORE any aggregation, so every
    downstream rollup is order-independent integer arithmetic (the
    same micro-log discipline as :func:`lm_score`); the floor biases
    each sum down by < 1e-6·V — a committed deterministic estimate,
    not a float race.

    Scale shape: one full-outer equi-join on the token (vocabulary-
    bounded), two 1-row broadcast aggregates for (T, V) — no windows,
    no Python. Top movers come off this frame with an
    ``orderBy(...).limit(n)`` (TakeOrderedAndProject, the key_skew
    plan); full-corpus divergence via :func:`divergence_summary`.
    """
    a = counts_a.where(F.col("n") == 1).select(
        F.col("gram"), F.col("cnt").alias("cnt_a"))
    b = counts_b.where(F.col("n") == 1).select(
        F.col("gram"), F.col("cnt").alias("cnt_b"))
    j = a.join(b, "gram", "outer").select(
        "gram",
        F.coalesce("cnt_a", F.lit(0)).cast("long").alias("cnt_a"),
        F.coalesce("cnt_b", F.lit(0)).cast("long").alias("cnt_b"))
    return _divergence_from_joint(j)


def token_divergence_tagged(
    docs: DataFrame,
    side_a,
    side_b,
    text_col: str = "text",
) -> DataFrame:
    """One-pass form of ``token_divergence(lm_counts(docs.where(side_a)),
    lm_counts(docs.where(side_b)))`` (r14 optimization): instead of two
    corpus scans, two unigram groupBys and a vocabulary full-outer
    join, tag every doc with per-side membership flags and take ONE
    word explode + ONE (gram)-keyed groupBy carrying both sides'
    counts. Rows matching neither side are excluded (a NULL side
    predicate excludes, exactly as ``.where`` does), so the joint
    vocabulary — and every cnt_a/cnt_b pair, hence every downstream
    integer micro-log value — is identical to the join form. Scale
    shape: one map-side-combined shuffle, vocabulary-bounded, versus
    three shuffles and a join."""
    d = docs.where(side_a | side_b).select(
        F.when(side_a, F.lit(1)).otherwise(F.lit(0)).alias("_a"),
        F.when(side_b, F.lit(1)).otherwise(F.lit(0)).alias("_b"),
        _words(F.col(text_col)).alias("_w"))
    j = (d.select("_a", "_b", F.explode("_w").alias("gram"))
         .groupBy("gram")
         .agg(F.sum("_a").cast("long").alias("cnt_a"),
              F.sum("_b").cast("long").alias("cnt_b")))
    return _divergence_from_joint(j)


def _divergence_from_joint(j: DataFrame) -> DataFrame:
    """Shared arithmetic of the divergence family: per-token +1-smoothed
    KL/JS contributions in integer micro-log10 units over a joint
    ``(gram, cnt_a, cnt_b)`` vocabulary frame."""
    tot = j.agg(
        F.sum("cnt_a").cast("double").alias("_ta"),
        F.sum("cnt_b").cast("double").alias("_tb"),
        F.count(F.lit(1)).cast("double").alias("_v"))
    jj = j.join(F.broadcast(tot))
    p = (F.col("cnt_a") + 1) / (F.col("_ta") + F.col("_v"))
    q = (F.col("cnt_b") + 1) / (F.col("_tb") + F.col("_v"))
    m = (p + q) / 2
    mic = 1_000_000
    return jj.select(
        "gram", "cnt_a", "cnt_b",
        F.floor(mic * p * F.log10(p / q)).cast("long")
        .alias("kl_ab_micro"),
        F.floor(mic * q * F.log10(q / p)).cast("long")
        .alias("kl_ba_micro"),
        F.floor(mic * (p * F.log10(p / m) + q * F.log10(q / m)) / 2)
        .cast("long").alias("js_micro"))


def divergence_summary(per_token: DataFrame) -> DataFrame:
    """One-row rollup of :func:`token_divergence`: vocabulary size,
    token totals, and the summed KL(a‖b) / KL(b‖a) / JS divergences in
    integer micro-log10 units."""
    return per_token.agg(
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum("cnt_a").cast("long").alias("tokens_a"),
        F.sum("cnt_b").cast("long").alias("tokens_b"),
        F.sum("kl_ab_micro").cast("long").alias("kl_ab_micro"),
        F.sum("kl_ba_micro").cast("long").alias("kl_ba_micro"),
        F.sum("js_micro").cast("long").alias("js_micro"))


def token_divergence_sql(
    counts_a_sql: str,
    counts_b_sql: str,
) -> str:
    """DuckDB mirror of :func:`token_divergence`."""
    return f"""
        WITH ca AS (SELECT gram, cnt FROM ({counts_a_sql}) WHERE n = 1),
        cb AS (SELECT gram, cnt FROM ({counts_b_sql}) WHERE n = 1),
        j AS (
          SELECT COALESCE(ca.gram, cb.gram) AS gram,
                 CAST(COALESCE(ca.cnt, 0) AS BIGINT) AS cnt_a,
                 CAST(COALESCE(cb.cnt, 0) AS BIGINT) AS cnt_b
          FROM ca FULL OUTER JOIN cb ON ca.gram = cb.gram
        ),
        tot AS (
          SELECT CAST(sum(cnt_a) AS DOUBLE) AS ta,
                 CAST(sum(cnt_b) AS DOUBLE) AS tb,
                 CAST(count(*) AS DOUBLE) AS v
          FROM j
        )
        SELECT gram, cnt_a, cnt_b,
          CAST(floor(1000000 * ((cnt_a + 1) / (ta + v))
               * log10(((cnt_a + 1) / (ta + v))
                       / ((cnt_b + 1) / (tb + v)))) AS BIGINT)
            AS kl_ab_micro,
          CAST(floor(1000000 * ((cnt_b + 1) / (tb + v))
               * log10(((cnt_b + 1) / (tb + v))
                       / ((cnt_a + 1) / (ta + v)))) AS BIGINT)
            AS kl_ba_micro,
          CAST(floor(1000000 * (
               ((cnt_a + 1) / (ta + v))
                 * log10(((cnt_a + 1) / (ta + v))
                         / ((((cnt_a + 1) / (ta + v))
                             + ((cnt_b + 1) / (tb + v))) / 2))
               + ((cnt_b + 1) / (tb + v))
                 * log10(((cnt_b + 1) / (tb + v))
                         / ((((cnt_a + 1) / (ta + v))
                             + ((cnt_b + 1) / (tb + v))) / 2))) / 2)
            AS BIGINT) AS js_micro
        FROM j CROSS JOIN tot
    """
