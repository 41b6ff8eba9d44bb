"""Text analysis operators — language-ID, quality scoring, token
counting, document fingerprinting.

All native Spark SQL (regexp + higher-order functions) so they run
inside codegen at 100 TB and are reproducible in ANSI-SQL oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# language ID — n-gram/stopword heuristic

# highly-discriminative function words per language (lowercase, match on
# word boundaries). A deliberately simple, deterministic heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "with", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "fr": ["le", "la", "les", "est", "dans", "une"],
    "es": ["el", "los", "las", "es", "una", "por"],
    "it": ["il", "della", "che", "per", "una", "sono"],
    "pt": ["o", "da", "os", "uma", "não", "para"],
    "nl": ["de", "het", "een", "van", "niet", "zijn"],
}


def _marker_hits(text: Column, words: list[str]) -> Column:
    pattern = "\\b(" + "|".join(words) + ")\\b"
    # count marker occurrences: size of split minus 1
    return F.size(F.split(F.concat(F.lit(" "), F.lower(text), F.lit(" ")), pattern)) - 1


def detect_language(text: Column) -> Column:
    """Best-scoring language code, 'und' when nothing matches."""
    scores = [(lang, _marker_hits(text, words)) for lang, words in LANG_MARKERS.items()]
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang, score in scores:
        is_better = score > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, score).otherwise(best_score)
    return best_lang


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.withColumn("detected_lang", detect_language(F.col(text_col)))


# ---------------------------------------------------------------------------
# quality scoring — length / punctuation / stopword / repetition ratios

_STOPWORDS = LANG_MARKERS["en"] + ["a", "to", "in", "it", "for", "on"]


def quality_features(text: Column) -> dict[str, Column]:
    n_chars = F.length(text)
    words = F.split(F.trim(F.regexp_replace(text, "\\s+", " ")), " ")
    n_words = F.when(F.trim(text) == "", 0).otherwise(F.size(words))
    mean_word_len = F.when(n_words > 0, n_chars / n_words).otherwise(F.lit(0.0))
    n_punct = F.length(F.regexp_replace(text, "[^.,;:!?]", ""))
    n_digit = F.length(F.regexp_replace(text, "[^0-9]", ""))
    n_upper = F.length(F.regexp_replace(text, "[^A-Z]", ""))
    stop_hits = F.size(
        F.filter(words, lambda w: F.lower(w).isin(*_STOPWORDS))
    )
    distinct_ratio = F.when(
        n_words > 0, F.size(F.array_distinct(words)) / n_words
    ).otherwise(F.lit(0.0))
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "mean_word_len": mean_word_len,
        "punct_ratio": F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0),
        "digit_ratio": F.when(n_chars > 0, n_digit / n_chars).otherwise(0.0),
        "upper_ratio": F.when(n_chars > 0, n_upper / n_chars).otherwise(0.0),
        "stopword_ratio": F.when(n_words > 0, stop_hits / n_words).otherwise(0.0),
        "distinct_word_ratio": distinct_ratio,
    }


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style heuristic quality gates → per-doc score in [0,1]."""
    f = quality_features(F.col(text_col))
    gates = [
        (f["n_words"] >= 10).cast("int"),
        (f["mean_word_len"] >= 2.0).cast("int"),
        (f["mean_word_len"] <= 12.0).cast("int"),
        (f["punct_ratio"] <= 0.2).cast("int"),
        (f["digit_ratio"] <= 0.3).cast("int"),
        (f["stopword_ratio"] >= 0.01).cast("int"),
        (f["distinct_word_ratio"] >= 0.3).cast("int"),
    ]
    score = sum(gates[1:], gates[0]) / F.lit(float(len(gates)))
    out = docs
    for name, col in f.items():
        out = out.withColumn(name, col)
    return out.withColumn("quality_score", score)


# ---------------------------------------------------------------------------
# token counting — whitespace + BPE-ish subword estimate


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """whitespace_tokens: split on \\s+; bpe_est_tokens: a BPE-ish regex
    segmentation (word pieces + digits + punctuation as separate tokens),
    ≈ GPT-style tokenizers' pre-tokenization."""
    text = F.col(text_col)
    ws = F.when(F.trim(text) == "", 0).otherwise(
        F.size(F.split(F.trim(text), "\\s+"))
    )
    # pre-tokenizer pieces: runs of letters, runs of digits, single punct
    pieces = F.regexp_count(text, F.lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"))
    # subword inflation: ~1 token per 4 chars within long words
    long_word_extra = F.aggregate(
        F.split(F.trim(text), "\\s+"),
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.greatest(
            (F.length(w) - 1) / F.lit(4), F.lit(0).cast("double")
        ).cast("long"),
    )
    return docs.withColumns({
        "ws_tokens": ws,
        "bpe_est_tokens": pieces + long_word_extra,
    })


# ---------------------------------------------------------------------------
# document fingerprinting — content hash + rolling winnow


def doc_fingerprint(docs: DataFrame, text_col: str = "text", window: int = 8) -> DataFrame:
    """content_hash: md5 of whitespace-normalized lowercase text.
    winnow_hash: min xxhash64 over character n-gram windows (a 1-hash
    winnowing fingerprint — robust to small edits)."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " ")
    n = F.length(norm)
    idx = F.sequence(F.lit(1), F.greatest(n - window + 1, F.lit(1)))
    grams = F.transform(idx, lambda i: norm.substr(i, F.lit(window)))
    winnow = F.array_min(F.transform(grams, lambda g: F.xxhash64(g)))
    return docs.withColumns({
        "content_hash": F.md5(norm),
        "winnow_hash": winnow,
    })
