"""Unigram-LM (SentencePiece-style) tokenizer — distributed seeding,
driver EM, zero-Python Viterbi apply.

The second canonical subword tokenizer of LLM pipelines (Kudo 2018,
"Subword Regularization: Improving Neural Network Translation Models
with Multiple Subword Candidates"): model each word as the max-
likelihood segmentation under a unigram distribution over pieces,
learned by EM with vocabulary pruning. Complements the BPE trainer in
bpe.py with the same scale discipline:

- **Training**: the only distributed step is the word-frequency
  aggregation (one map-side-combined shuffle on word types, shared
  with bpe.word_freqs). Seeding + EM + pruning run driver-side over
  the bounded top-``top_words`` frequency dict — cost scales with
  vocabulary, never corpus size.
- **Apply** is pure Catalyst: the piece table folds into ONE ``map()``
  literal (the IVF-centroid lesson — a single expr, not thousands of
  py4j Column calls) and Viterbi is an ``aggregate()`` fold over
  character positions. Zero Python, zero shuffles, no UDFs — the 100
  TB side of the pipeline never leaves the JVM.
- **Engine portability**: piece scores are integer micro-nats
  (cost = round(-ln p * 1e6)), DP states pack (cost, n_pieces) into
  one BIGINT as ``cost * 64 + pieces`` (words are capped at
  ``MAX_WORD_LEN`` < 64 chars, so the piece count can never carry),
  and ``least()`` over candidates gives a total deterministic order:
  min cost first, then fewest pieces. :func:`apply_unigram_sql` emits
  a recursive-CTE DP replaying the exact same integers on DuckDB —
  the cross-engine-replay discipline of bpe.py/curation.py.

Reference scope note: the reference engine has no tokenizer; this is
part of the beyond-reference training-data layer (SURVEY.md §8).
"""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .bpe import _normalize_py, normalize_words, word_freqs

MAX_WORD_LEN = 20          # DP depth cap; longer words are truncated
UNK_COST = 25_000_000      # per-character fallback, micro-nats
_PIECES_BITS = 64          # cost*64 + n_pieces packing


# ---------------------------------------------------------------------------
# training: bounded driver EM over word types


def _seed_pieces(vocab: dict[str, int], max_piece_len: int,
                 seed_size: int) -> dict[str, float]:
    """Substring-frequency seed: every substring up to max_piece_len,
    kept to the ``seed_size`` most frequent (ties broken by piece, so
    the cut is deterministic); single chars always survive."""
    counts: Counter = Counter()
    for word, freq in vocab.items():
        n = len(word)
        for i in range(n):
            for ln in range(1, min(max_piece_len, n - i) + 1):
                counts[word[i:i + ln]] += freq
    chars = {p: c for p, c in counts.items() if len(p) == 1}
    multi = sorted(((p, c) for p, c in counts.items() if len(p) > 1),
                   key=lambda kv: (-kv[1], kv[0]))
    keep = dict(multi[:max(0, seed_size - len(chars))])
    keep.update(chars)
    total = sum(keep.values())
    return {p: c / total for p, c in keep.items()}


def _forward_backward(word: str, logp: dict[str, float],
                      max_piece_len: int) -> tuple[float, dict[str, float]]:
    """Lattice forward-backward over one word → (log-likelihood,
    expected piece counts). Pieces absent from ``logp`` are not arcs."""
    n = len(word)
    neg = float("-inf")
    alpha = [neg] * (n + 1)
    alpha[0] = 0.0
    arcs: list[tuple[int, int, str, float]] = []
    for j in range(1, n + 1):
        for k in range(1, min(max_piece_len, j) + 1):
            piece = word[j - k:j]
            lp = logp.get(piece)
            if lp is None or alpha[j - k] == neg:
                continue
            arcs.append((j - k, j, piece, lp))
            v = alpha[j - k] + lp
            m = max(alpha[j], v)
            alpha[j] = m + math.log(math.exp(alpha[j] - m)
                                    + math.exp(v - m)) if alpha[j] != neg \
                else v
    if alpha[n] == neg:
        return neg, {}
    beta = [neg] * (n + 1)
    beta[n] = 0.0
    for i, j, piece, lp in sorted(arcs, key=lambda a: -a[0]):
        if beta[j] == neg:
            continue
        v = beta[j] + lp
        m = max(beta[i], v)
        beta[i] = m + math.log(math.exp(beta[i] - m) + math.exp(v - m)) \
            if beta[i] != neg else v
    exp: dict[str, float] = {}
    z = alpha[n]
    for i, j, piece, lp in arcs:
        if beta[j] == neg:
            continue
        exp[piece] = exp.get(piece, 0.0) + math.exp(alpha[i] + lp
                                                    + beta[j] - z)
    return z, exp


def train_unigram(
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = 256,
    seed_size: int = 2000,
    max_piece_len: int = 6,
    em_iters: int = 4,
    top_words: int = 65536,
) -> list[tuple[str, int]]:
    """Learn a unigram piece table → sorted [(piece, cost_micronats)].

    One distributed aggregation (word_freqs), then EM with pruning on
    the driver. Each EM round: forward-backward expected counts per
    word type (weighted by frequency), re-estimate, prune multi-char
    pieces outside the top ``vocab_size`` by probability (ties by
    piece). Single characters are never pruned — full coverage."""
    rows = (word_freqs(docs, text_col)
            .orderBy(F.desc("freq"), F.asc("word"))
            .limit(top_words).collect())
    vocab = {r["word"][:MAX_WORD_LEN]: int(r["freq"]) for r in rows}
    probs = _seed_pieces(vocab, max_piece_len, seed_size)
    for _ in range(em_iters):
        logp = {p: math.log(v) for p, v in probs.items() if v > 0}
        counts: dict[str, float] = {}
        for word in sorted(vocab):
            _, exp = _forward_backward(word, logp, max_piece_len)
            freq = vocab[word]
            for piece, c in exp.items():
                counts[piece] = counts.get(piece, 0.0) + c * freq
        total = sum(counts.values())
        if total <= 0:
            break
        probs = {p: c / total for p, c in counts.items()}
        chars = {p: v for p, v in probs.items() if len(p) == 1}
        multi = sorted(((p, v) for p, v in probs.items() if len(p) > 1),
                       key=lambda kv: (-kv[1], kv[0]))
        probs = dict(multi[:max(0, vocab_size - len(chars))])
        probs.update(chars)
        norm = sum(probs.values())
        probs = {p: v / norm for p, v in probs.items()}
    return sorted((p, max(1, round(-math.log(v) * 1e6)))
                  for p, v in probs.items() if v > 0)


# ---------------------------------------------------------------------------
# reference tokenizer (tests + driver-side spot use)


def tokenize_unigram_py(text: str,
                        pieces: list[tuple[str, int]]) -> list[str]:
    """Viterbi segmentation with backtrack, integer costs — the same
    (cost, n_pieces) packing and candidate order as the native plan and
    the SQL oracle, so all three agree exactly."""
    cost = dict(pieces)
    max_len = max((len(p) for p in cost), default=1)
    out: list[str] = []
    for raw in _normalize_py(text):
        word = raw[:MAX_WORD_LEN]
        n = len(word)
        dp = [0] + [None] * n
        back = [0] * (n + 1)
        for j in range(1, n + 1):
            best = None
            bk = 1
            for k in range(1, min(max_len, j) + 1):
                piece = word[j - k:j]
                c = cost.get(piece)
                if c is None and k == 1:
                    c = UNK_COST
                if c is None or dp[j - k] is None:
                    continue
                cand = dp[j - k] + c * _PIECES_BITS + 1
                if best is None or cand < best:
                    best, bk = cand, k
            dp[j] = best
            back[j] = bk
        j = n
        toks: list[str] = []
        while j > 0:
            toks.append(word[j - back[j]:j])
            j -= back[j]
        out.extend(reversed(toks))
    return out


# ---------------------------------------------------------------------------
# apply: one map literal + aggregate-fold Viterbi, zero Python


def _vocab_map_expr(pieces: list[tuple[str, int]]) -> Column:
    """The whole piece table as ONE map literal (single expr build)."""
    body = ",".join(f"'{p}',{c}L" for p, c in pieces)
    return F.expr(f"map({body})")


def _word_dp(word: Column, vmap: Column, max_len: int) -> Column:
    """Packed Viterbi result (cost*64 + n_pieces) for one word column."""

    def cand(acc: Column, j: Column, k: int) -> Column:
        piece = word.substr(j - F.lit(k) + 1, F.lit(k))
        c = F.element_at(vmap, piece)
        if k == 1:
            c = F.coalesce(c, F.lit(UNK_COST))
        prev = F.element_at(acc, (j - k + 1).cast("int"))
        return F.when(j >= k, prev + c * _PIECES_BITS + 1)

    return F.aggregate(
        F.sequence(F.lit(1), F.length(word)),
        F.array(F.lit(0).cast("long")),
        lambda acc, j: F.concat(acc, F.array(
            F.least(*[cand(acc, j, k) for k in range(1, max_len + 1)]))),
        lambda acc: F.element_at(acc, -1),
    )


def apply_unigram(
    docs: DataFrame,
    pieces: list[tuple[str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize every document → id, n_words, n_tokens, cost_unats.

    Pure projection: normalize → split → per-word aggregate-fold DP →
    per-doc sums, all inside one JVM stage. No Python, no shuffle, no
    join — the piece table travels inside the plan like a broadcast
    but cheaper."""
    max_len = min(max((len(p) for p, _ in pieces), default=1),
                  MAX_WORD_LEN)
    vmap = _vocab_map_expr(pieces)
    words = F.filter(
        F.split(normalize_words(F.col(text_col)), " "),
        lambda s: s != "")
    packed = F.transform(
        words, lambda s: _word_dp(s.substr(1, MAX_WORD_LEN), vmap, max_len))
    zero = F.lit(0).cast("long")
    tot = F.aggregate(packed, zero, lambda a, x: a + x)
    n_tok = F.aggregate(packed, zero,
                        lambda a, x: a + x % _PIECES_BITS)
    return docs.select(
        F.col(id_col),
        F.size(words).cast("long").alias("n_words"),
        n_tok.alias("n_tokens"),
        # integer shift, NOT `/` + cast: float division round-trips
        # through double and loses exactness past 2^53, diverging from
        # the oracle's integer (tot - n_tok) // 64; the packed sum is
        # non-negative so >> 6 IS floor-division by _PIECES_BITS
        F.shiftright((tot - n_tok).cast("long"), 6).alias("cost_unats"),
    )


# ---------------------------------------------------------------------------
# SQL oracle mirror: recursive-CTE DP with the same packed integers


def apply_unigram_sql(
    from_sql: str,
    id_expr: str,
    text_expr: str,
    pieces: list[tuple[str, int]],
    id_alias: str = "doc_id",
) -> str:
    """ANSI-ish SQL (DuckDB dialect for unnest/list ops) replaying
    :func:`apply_unigram` exactly: same normalization, word cap, map
    lookups, packed costs, and candidate order."""
    max_len = min(max((len(p) for p, _ in pieces), default=1),
                  MAX_WORD_LEN)
    keys = ",".join(f"'{p}'" for p, _ in pieces)
    vals = ",".join(str(c) for _, c in pieces)
    m = f"MAP([{keys}], [CAST({vals} AS BIGINT)])" if len(pieces) == 1 \
        else f"MAP([{keys}], [{vals}]::BIGINT[])"
    norm = (f"trim(regexp_replace(lower({text_expr}), '[^a-z0-9]+', ' ', "
            f"'g'))")
    cands = []
    for k in range(1, max_len + 1):
        look = f"{m}[substr(word, j - {k} + 1, {k})][1]"
        if k == 1:
            look = f"coalesce({look}, {UNK_COST})"
        cands.append(f"CASE WHEN j >= {k} THEN acc[j - {k} + 1] + "
                     f"({look}) * {_PIECES_BITS} + 1 END")
    least = "least(" + ", ".join(cands) + ")"
    return f"""
WITH RECURSIVE _uni_base AS (
  SELECT {id_expr} AS {id_alias},
         list_filter(string_split({norm}, ' '), s -> s <> '') AS ws
  FROM {from_sql}
),
_uni_words AS (
  SELECT {id_alias}, i, substr(ws[i], 1, {MAX_WORD_LEN}) AS word
  FROM _uni_base, unnest(range(1, len(ws) + 1)) AS _r(i)
),
_uni_dp({id_alias}, i, word, j, acc) AS (
  SELECT {id_alias}, i, word, 1, [CAST(0 AS BIGINT)] FROM _uni_words
  UNION ALL
  SELECT {id_alias}, i, word, j + 1, list_append(acc, {least})
  FROM _uni_dp WHERE j <= length(word)
),
_uni_fin AS (
  SELECT {id_alias}, i, acc[length(word) + 1] AS packed
  FROM _uni_dp WHERE j = length(word) + 1
),
_uni_agg AS (
  SELECT {id_alias}, count(*) AS n_words,
         sum(packed % {_PIECES_BITS}) AS n_tokens,
         sum(packed // {_PIECES_BITS}) AS cost_unats
  FROM _uni_fin GROUP BY 1
)
SELECT b.{id_alias},
       CAST(coalesce(a.n_words, 0) AS BIGINT) AS n_words,
       CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(a.cost_unats, 0) AS BIGINT) AS cost_unats
FROM _uni_base b LEFT JOIN _uni_agg a USING ({id_alias})
"""
