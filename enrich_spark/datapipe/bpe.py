"""Byte-pair-encoding tokenizer — distributed training, native apply.

The tokenizer-training step of an LLM data pipeline (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units"):
learn a merge table from corpus statistics, then tokenize every
document with it.

Scale design (the part that must survive 100 TB):

- **Training** is one distributed word-frequency aggregation (shuffle
  on the word — the only shuffle), capped at ``top_words`` word types
  collected to the driver. The merge loop itself runs driver-side over
  that bounded frequency dict — the classic formulation: pair counts
  over word *types* weighted by frequency, so the loop cost depends on
  vocabulary size, never corpus size. 65k word types cover virtually
  all token mass of a natural-language corpus at any scale.
- **Apply** is a chain of codegen'd projections of literal ``replace``
  calls — zero Python, zero shuffles, runs at scan speed. The merge
  table is folded into the plan as literals (like a broadcast of ~48
  strings, but cheaper: no join at all).

Symbol representation (shared by trainer, native apply, and the SQL
oracle — all three must agree bit-for-bit):

- normalize: lowercase, every non-``[a-z0-9]`` run → one space
- each word becomes ``/c;/a;/t;/_;`` — every symbol wrapped as
  ``/sym;`` with a terminal ``_`` end-of-word symbol (``/``, ``;`` and
  ``_`` cannot appear in normalized text, so they are safe sentinels)
- applying merge ``(a, b)`` = ONE literal string replace ``/a;/b;`` →
  ``/ab;``, in merge-rank order. Because each occurrence is
  self-contained (adjacent occurrences share no characters), a single
  left-to-right non-overlapping replace IS the reference algorithm's
  leftmost-greedy merge sweep — no fixpoint iteration needed. (A
  separator-only scheme like ``/a/b/`` fails exactly there: adjacent
  occurrences share the boundary slash, so a run of ``a`` under merge
  ``(a,a)`` merges only alternate pairs per pass and permanently
  diverges from the reference — caught by the run-merge test.)

The same replace chain is emitted as ANSI SQL by
:func:`apply_bpe_sql`, so a DuckDB/BigQuery oracle replays the exact
tokenization — the cross-engine-replay discipline used across
datapipe (see curation.py, webtext.py).
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

END = "_"  # end-of-word symbol

# replaces per projection layer: keeps each generated codegen method far
# under Janino's 64KB limit, and each oracle CTE layer far under
# DuckDB's 128-deep expression-binder cap
_LAYER = 48


# ---------------------------------------------------------------------------
# shared normalization


def normalize_words(text: Column) -> Column:
    """lowercase, non-alphanumeric runs → single space, trimmed."""
    t = F.regexp_replace(F.lower(text), "[^a-z0-9]+", " ")
    return F.trim(t)


def _normalize_py(text: str) -> list[str]:
    """Python mirror of :func:`normalize_words` (trainer + tests)."""
    out, word = [], []
    for ch in text.lower():
        if ("a" <= ch <= "z") or ("0" <= ch <= "9"):
            word.append(ch)
        elif word:
            out.append("".join(word))
            word = []
    if word:
        out.append("".join(word))
    return out


# ---------------------------------------------------------------------------
# training: one shuffle + bounded driver loop


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus word-frequency table — the single distributed step.

    groupBy(word) is the only shuffle; partial aggregation makes it
    map-side combined, so the shuffle carries word *types*, not
    occurrences.
    """
    words = docs.select(
        F.explode(F.split(normalize_words(F.col(text_col)), " ")).alias("word")
    ).where(F.col("word") != "")
    return words.groupBy("word").agg(F.count("*").alias("freq"))


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 48,
    top_words: int = 65536,
) -> list[tuple[str, str]]:
    """Learn a BPE merge table from the corpus.

    The collect is bounded by ``top_words`` (ordered by frequency then
    word, so the cut is deterministic); the merge loop is pure Python
    over that dict. Tie-break: highest pair frequency, then
    lexicographically smallest pair — deterministic on any engine.
    """
    rows = (
        word_freqs(docs, text_col)
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(top_words)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {}
    for r in rows:
        key = tuple(r["word"]) + (END,)
        vocab[key] = vocab.get(key, 0) + int(r["freq"])
    return _train_merges(vocab, num_merges)


def _train_merges(
    vocab: dict[tuple[str, ...], int], num_merges: int
) -> list[tuple[str, str]]:
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for word, freq in vocab.items():
            for a, b in zip(word, word[1:]):
                pairs[(a, b)] += freq
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = {_merge_word(w, best): f for w, f in vocab.items()}
    return merges


def _merge_word(
    word: tuple[str, ...], pair: tuple[str, str]
) -> tuple[str, ...]:
    """Leftmost-greedy merge of one pair in one word (reference apply)."""
    a, b = pair
    out: list[str] = []
    i = 0
    while i < len(word):
        if i + 1 < len(word) and word[i] == a and word[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(word[i])
            i += 1
    return tuple(out)


def tokenize_py(text: str, merges: list[tuple[str, str]]) -> list[str]:
    """Pure-Python reference tokenizer (tests + driver-side spot use)."""
    toks: list[str] = []
    for w in _normalize_py(text):
        word = tuple(w) + (END,)
        for pair in merges:
            word = _merge_word(word, pair)
        toks.extend(word)
    return toks


# ---------------------------------------------------------------------------
# apply: native projections, zero Python


def symbolize(text: Column) -> Column:
    """text → ``/c;/a;/t;/_; /n;/e;/x;/t;/_;`` symbol string."""
    norm = normalize_words(text)
    marked = F.regexp_replace(norm, r"(\S+)", rf"$1{END}")  # word → word_
    return F.regexp_replace(marked, "([^ ])", "/$1;")  # char → /char;


def apply_merges(sym: Column, merges: list[tuple[str, str]]) -> Column:
    """Fold the merge table into one replace per merge, in rank order."""
    out = sym
    for a, b in merges:
        out = F.replace(out, F.lit(f"/{a};/{b};"), F.lit(f"/{a}{b};"))
    return out


def tokens_string(sym: Column) -> Column:
    """``/ab;/_; /cd;`` → ``ab _ cd`` (symbols joined by single spaces)."""
    t = F.replace(F.replace(sym, F.lit(";"), F.lit("")),
                  F.lit("/"), F.lit(" "))
    return F.trim(F.regexp_replace(t, " +", " "))


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    head_chars: int = 160,
) -> DataFrame:
    """Tokenize every document with a fixed merge table.

    Output: id, n_words, n_tokens, tokens_head. Token count is length
    arithmetic, not a split: every symbol carries exactly one ``;``.
    All map-side, zero shuffles; a stage boundary per ``_LAYER`` merges
    keeps each generated method far under Janino's 64KB limit AND stops
    CollapseProject from re-inlining the whole chain into every
    consumer of the symbol column (plans/stagecut.py — the r6
    Generate/Filter lesson).
    """
    from enrich_spark.plans.stagecut import stage_boundary

    norm = normalize_words(F.col(text_col))
    out = docs.select(
        F.col(id_col),
        norm.alias("_bpe_norm"),
        symbolize(F.col(text_col)).alias("_bpe_sym"),
    )
    for i in range(0, len(merges), _LAYER):
        out = stage_boundary(out).withColumn(
            "_bpe_sym", apply_merges(F.col("_bpe_sym"), merges[i:i + _LAYER]))
    out = stage_boundary(out)
    sym, nrm = F.col("_bpe_sym"), F.col("_bpe_norm")
    n_tokens = F.length(sym) - F.length(
        F.replace(sym, F.lit(";"), F.lit("")))
    n_words = F.when(F.length(nrm) == 0, F.lit(0)).otherwise(
        F.size(F.split(nrm, " ")))
    return out.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        n_tokens.cast("long").alias("n_tokens"),
        F.substring(tokens_string(sym), 1, head_chars).alias("tokens_head"),
    )


# ---------------------------------------------------------------------------
# SQL oracle mirror


def apply_bpe_sql(
    from_sql: str,
    id_expr: str,
    text_expr: str,
    merges: list[tuple[str, str]],
    head_chars: int = 160,
    id_alias: str = "doc_id",
) -> str:
    """A full ANSI-SQL SELECT replaying :func:`apply_bpe` exactly.

    One chained CTE layer per ``_LAYER`` merges (DuckDB's binder caps
    expression nesting at 128, so a large merge table must never fold
    into a single expression). Uses only replace/regexp_replace/lower/
    trim/length — runs on DuckDB (and any warehouse) unchanged.

    ``from_sql`` is a table name or parenthesized subquery providing
    ``id_expr`` and ``text_expr``.
    """
    norm = f"trim(regexp_replace(lower({text_expr}), '[^a-z0-9]+', ' ', 'g'))"
    marked = rf"regexp_replace({norm}, '(\S+)', '\1{END}', 'g')"
    sym0 = rf"regexp_replace({marked}, '([^ ])', '/\1;', 'g')"
    ctes = [
        f"_bpe0 as (select {id_expr} as {id_alias}, {norm} as nrm, "
        f"{sym0} as s from {from_sql})"
    ]
    layers = [merges[i:i + _LAYER] for i in range(0, len(merges), _LAYER)]
    for p, layer in enumerate(layers):
        s = "s"
        for a, b in layer:
            s = f"replace({s}, '/{a};/{b};', '/{a}{b};')"
        ctes.append(
            f"_bpe{p + 1} as (select {id_alias}, nrm, {s} as s from _bpe{p})")
    n_tokens = "(length(s) - length(replace(s, ';', '')))"
    n_words = ("(case when length(nrm) = 0 then 0 else "
               "length(nrm) - length(replace(nrm, ' ', '')) + 1 end)")
    toks = ("trim(regexp_replace(replace(replace(s, ';', ''), '/', ' '), "
            "' +', ' ', 'g'))")
    return (
        "with " + ",\n".join(ctes) + "\n"
        f"select {id_alias}, cast({n_words} as bigint) as n_words, "
        f"cast({n_tokens} as bigint) as n_tokens, "
        f"substr({toks}, 1, {head_chars}) as tokens_head "
        f"from _bpe{len(layers)}"
    )
