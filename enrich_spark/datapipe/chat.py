"""Conversation assembly for instruction-tuning data — the turn-level
step between a raw dialogue table and the sequence packer: render each
conversation with role headers into ONE training text, compute the
ASSISTANT-SPAN LOSS MASK (character offsets of the regions a trainer
computes loss on), and validate the structural invariants every SFT
pipeline checks (role alternation, known roles, ends-with-assistant,
no empty turns).

Template (the ubiquitous public chat-markup shape, e.g. ChatML-style
``<|role|>`` headers):

    <|user|>\\n{text}\\n<|assistant|>\\n{text}\\n...

Span arithmetic instead of a fold: piece lengths are known per turn,
so every mask offset is a window CUMSUM over the conversation — both
engines replay the exact same integer arithmetic, no sequential
string-builder anywhere. The conversation window partitions by
conversation id: per-partition cardinality is the turn count of one
dialogue (bounded by construction, the sessionize argument — never a
mega-key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["chat_assemble", "chat_assemble_sql", "masked_content",
           "sft_decontaminate",
           "sft_masked_dedup"]


def chat_assemble(
    turns: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    roles: tuple[str, ...] = ("system", "user", "assistant"),
    mask_role: str = "assistant",
) -> DataFrame:
    """(conv, turn_idx, role, text) rows → one row per conversation:

    - ``text``: the assembled training text (``<|role|>\\n{t}\\n`` per
      turn, turn order by ``idx_col``)
    - ``mask_spans``: array<struct<s,e>> — character offsets of each
      ``mask_role`` turn's BODY inside ``text`` (headers excluded);
      the loss mask a trainer applies
    - ``mask_spans_str``: the same spans as a canonical ``s-e;s-e``
      string (engine-portable projection of the array)
    - ``n_turns`` / ``n_mask_turns`` / ``total_chars`` / ``mask_chars``
    - validation flags (all 0/1 ints): ``alternation_ok`` (no two
      consecutive turns share a role), ``roles_ok`` (every role is in
      ``roles``), ``ends_with_mask`` (last turn is ``mask_role`` — a
      training example must end in supervised tokens), ``no_empty``
      (every turn body non-empty)

    Scale shape: one window (cumsum + lag) partitioned by the
    conversation id, one groupBy — both keyed by conversation, whose
    cardinality is a dialogue's turn count. Zero Python.
    """
    txt = F.coalesce(F.col(text_col), F.lit(""))   # NULL body = empty
    hdr = F.concat(F.lit("<|"), F.col(role_col), F.lit("|>\n"))
    piece = F.concat(hdr, txt, F.lit("\n"))
    plen = F.length(piece)
    w = Window.partitionBy(conv_col).orderBy(idx_col)
    cum_before = F.coalesce(
        F.sum(plen).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0))
    span_s = (cum_before + F.length(hdr)).cast("long")
    span_e = (span_s + F.length(txt)).cast("long")
    prev_role = F.lag(F.col(role_col)).over(w)
    is_mask = F.col(role_col) == mask_role
    t = turns.select(
        F.col(conv_col).alias("conv_id"),
        F.col(idx_col).alias("_idx"),
        F.col(role_col).alias("_role"),
        piece.alias("_piece"), plen.alias("_plen"),
        span_s.alias("_s"), span_e.alias("_e"),
        is_mask.alias("_m"),
        # when/otherwise, not a bare cast: a NULL role makes the
        # comparison NULL, which min() would SKIP — the SQL mirror's
        # CASE ELSE 0 counts it not-ok, so must we (same NULL pitfall
        # as _role_ok below)
        F.when(prev_role.isNull() | (prev_role != F.col(role_col)), 1)
        .otherwise(0).alias("_alt_ok"),
        # when/otherwise, not a bare cast: a NULL role must count as
        # NOT-ok (the SQL mirror's CASE ELSE 0), not vanish from min()
        F.when(F.col(role_col).isin(*roles), 1).otherwise(0)
        .alias("_role_ok"),
        F.when(F.length(txt) > 0, 1).otherwise(0)
        .alias("_nonempty"),
    )
    ordered_pieces = F.transform(
        F.array_sort(F.collect_list(F.struct("_idx", "_piece"))),
        lambda x: x.getField("_piece"))
    spans = F.transform(
        F.array_sort(F.collect_list(
            F.when(F.col("_m"),
                   F.struct(F.col("_idx"), F.col("_s").alias("s"),
                            F.col("_e").alias("e"))))),
        lambda x: F.struct(x.getField("s").alias("s"),
                           x.getField("e").alias("e")))
    spans_str = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(
                F.when(F.col("_m"),
                       F.struct(F.col("_idx"),
                                F.concat_ws("-", "_s", "_e")
                                .alias("se"))))),
            lambda x: x.getField("se")),
        ";")
    last_role = F.max(F.struct("_idx", "_role")).getField("_role")
    return t.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum(F.col("_m").cast("long")).cast("long")
        .alias("n_mask_turns"),
        F.concat_ws("", ordered_pieces).alias("text"),
        spans.alias("mask_spans"),
        spans_str.alias("mask_spans_str"),
        F.sum("_plen").cast("long").alias("total_chars"),
        F.coalesce(F.sum(F.when(F.col("_m"), F.col("_e") - F.col("_s"))),
                   F.lit(0)).cast("long").alias("mask_chars"),
        F.min("_alt_ok").cast("long").alias("alternation_ok"),
        F.min("_role_ok").cast("long").alias("roles_ok"),
        (last_role == mask_role).cast("long").alias("ends_with_mask"),
        F.min("_nonempty").cast("long").alias("no_empty"),
    )


def chat_assemble_sql(
    turns_sql: str,
    conv_expr: str = "conv_id",
    idx_expr: str = "turn_idx",
    role_expr: str = "role",
    text_expr: str = "text",
    roles: tuple[str, ...] = ("system", "user", "assistant"),
    mask_role: str = "assistant",
) -> str:
    """DuckDB mirror of :func:`chat_assemble` (without the
    ``mask_spans`` struct array — the canonical ``mask_spans_str``
    projection carries the same information portably)."""
    role_list = ", ".join(f"'{r}'" for r in roles)
    return f"""
        WITH t AS (
          SELECT {conv_expr} AS conv_id, {idx_expr} AS idx,
                 {role_expr} AS role,
                 COALESCE({text_expr}, '') AS txt,
                 '<|' || {role_expr} || '|>' || chr(10) AS hdr,
                 '<|' || {role_expr} || '|>' || chr(10)
                   || COALESCE({text_expr}, '') || chr(10) AS piece
          FROM {turns_sql}
        ),
        c AS (
          SELECT *,
                 COALESCE(sum(length(piece)) OVER (
                   PARTITION BY conv_id ORDER BY idx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) + length(hdr) AS s,
                 lag(role) OVER (PARTITION BY conv_id ORDER BY idx)
                   AS prev_role
          FROM t
        ),
        e AS (
          SELECT *, s + length(txt) AS se,
                 CASE WHEN role = '{mask_role}' THEN 1 ELSE 0 END AS m
          FROM c
        )
        SELECT conv_id,
               CAST(count(*) AS BIGINT) AS n_turns,
               CAST(sum(m) AS BIGINT) AS n_mask_turns,
               string_agg(piece, '' ORDER BY idx) AS text,
               COALESCE(string_agg(
                 CASE WHEN m = 1 THEN s || '-' || se END, ';'
                 ORDER BY idx), '') AS mask_spans_str,
               CAST(sum(length(piece)) AS BIGINT) AS total_chars,
               CAST(COALESCE(sum(CASE WHEN m = 1 THEN se - s END), 0)
                 AS BIGINT) AS mask_chars,
               CAST(min(CASE WHEN prev_role IS NULL
                             OR prev_role <> role
                        THEN 1 ELSE 0 END) AS BIGINT)
                 AS alternation_ok,
               CAST(min(CASE WHEN role IN ({role_list})
                        THEN 1 ELSE 0 END) AS BIGINT) AS roles_ok,
               CAST(CASE WHEN max_by(role, idx) = '{mask_role}'
                    THEN 1 ELSE 0 END AS BIGINT) AS ends_with_mask,
               CAST(min(CASE WHEN length(txt) > 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS no_empty
        FROM e GROUP BY conv_id
    """


def masked_content(text_col: str = "text",
                   spans_col: str = "mask_spans",
                   sep: str = "\n"):
    """Column: the loss-MASKED content of an assembled conversation —
    ``text[s:e]`` per mask span, span order, joined by ``sep``. Pure
    span arithmetic over :func:`chat_assemble`'s output (native
    substring inside a higher-order transform — zero Python, and it
    exercises the spans themselves: if a span were off by one, the
    extracted content would differ from the turn bodies and every
    downstream fingerprint would move)."""
    return F.array_join(
        F.transform(
            F.col(spans_col),
            lambda s: F.col(text_col).substr(
                (s.getField("s") + 1).cast("int"),
                (s.getField("e") - s.getField("s")).cast("int"))),
        sep)


def sft_masked_dedup(
    turns: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    roles: tuple[str, ...] = ("system", "user", "assistant"),
    mask_role: str = "assistant",
    max_hamming: int = 8,
    hasher=None,
    assembled: DataFrame | None = None,
) -> DataFrame:
    """SFT-aware near-dedup: dedup conversations on the MASKED
    (assistant) content ONLY — duplicate assistant answers under
    different user prompts are the actual SFT dedup problem; hashing
    the full rendered dialogue would let a fresh user prompt launder a
    verbatim answer past the filter.

    Composition (each stage an existing operator): chat_assemble →
    :func:`masked_content` span extraction → simhash pairs over the
    masked text → connected components → keep-policy (keep the
    highest-``mask_chars`` member per cluster — the copy carrying the
    most supervised content — ties to the lowest conv id).

    Output per conversation: conv_id, cluster_id, cluster_size,
    is_kept. Scale shape: the chat window (conversation-bounded) +
    the simhash banded equi-join + diameter-bounded label propagation
    — no cross join, no unpartitioned window anywhere in the chain.

    ``assembled``: pass a :func:`chat_assemble` output frame (must
    carry conv_id, text, mask_spans, mask_chars) to skip re-assembling
    ``turns`` — a caller that already assembled (e.g. the
    sft_dedup_keep pipeline op) must not pay the conversation window
    twice; ``turns`` is ignored when this is given."""
    from .dedup import apply_dedup_policy, simhash_pairs

    if assembled is None:
        assembled = chat_assemble(
            turns, conv_col=conv_col, idx_col=idx_col,
            role_col=role_col, text_col=text_col, roles=roles,
            mask_role=mask_role)
    masked = assembled.select(
        "conv_id",
        masked_content().alias("_masked"),
        "mask_chars",
    )
    pairs = simhash_pairs(masked, text_col="_masked",
                          id_col="conv_id", max_hamming=max_hamming,
                          hasher=hasher)
    return apply_dedup_policy(masked, pairs,
                              quality_col="mask_chars",
                              id_col="conv_id")


def sft_decontaminate(
    turns: DataFrame,
    benchmarks: list,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    roles: tuple[str, ...] = ("system", "user", "assistant"),
    mask_role: str = "assistant",
    min_overlap_windows: int = 1,
    assembled: DataFrame | None = None,
) -> DataFrame:
    """Cross-corpus SFT decontamination: n-gram overlap of the MASKED
    (assistant) content against evaluation benchmarks — the eval twin
    of :func:`sft_masked_dedup`. A benchmark answer laundered into the
    SFT set under a FRESH user prompt is exactly what full-dialogue
    checking misses (the prompt windows dilute or break the overlap);
    evals need the same masked view intra-corpus dedup already uses.

    Composition of audited parts: :func:`chat_assemble` (conversation
    window) → :func:`masked_content` (span extraction, zero Python) →
    ``dedup.contamination_check_multi`` over the masked text (one
    broadcast gram map per distinct k + one (conv, set)-keyed
    groupBy — the benchmark side is tiny next to the corpus, so the
    check never shuffles the conversations).

    ``benchmarks``: list of ``(name, df, k)`` — same contract as
    ``contamination_check_multi``. Output: one row per (conv,
    benchmark) with ≥1 shared masked window — conv_id, benchmark, k,
    n_windows (masked-content windows at that k),
    contaminated_windows, contaminated_frac, contaminated.

    ``assembled``: pass a :func:`chat_assemble` output frame (conv_id,
    text, mask_spans) to skip re-assembling, same as
    :func:`sft_masked_dedup`."""
    from .dedup import contamination_check_multi

    if assembled is None:
        assembled = chat_assemble(
            turns, conv_col=conv_col, idx_col=idx_col,
            role_col=role_col, text_col=text_col, roles=roles,
            mask_role=mask_role)
    masked = assembled.select(
        "conv_id", masked_content().alias("_masked"))
    return contamination_check_multi(
        masked, benchmarks, text_col="_masked", id_col="conv_id",
        min_overlap_windows=min_overlap_windows)
