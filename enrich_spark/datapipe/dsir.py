"""DSIR — Data Selection via Importance Resampling (Xie et al., 2023,
arXiv:2302.03169): select pretraining documents whose hashed n-gram
distribution matches a small target corpus.

Beyond-reference training-data operator (no snowplow/enrich
counterpart). The method:

1. Featurize every document as hashed n-gram (unigram + bigram) counts
   over ``n_buckets`` buckets.
2. Fit two bag-of-buckets models: p̂ on the target corpus, q̂ on the
   raw source corpus (Laplace-smoothed).
3. Importance log-weight per document: Σ over its gram occurrences of
   log p̂[bucket] − log q̂[bucket].
4. Resample: top-k by weight (deterministic), or Gumbel-perturbed
   top-k for the paper's sampling-without-replacement behavior.

Spark-first / 100 TB shape:
- Training is two bucket-count aggregations — groupBy(bucket) over at
  most ``n_buckets`` distinct keys, map-side combined, result ≤
  n_buckets rows collected (bounded driver materialization, same
  contract as the BPE merge table / IVF centroids).
- The log-ratio table is computed DRIVER-SIDE in Python with exact
  floats, then quantized to integer micro-nats — so the distributed
  apply is pure integer arithmetic, engine-exact, and sits inside the
  value-hash oracle gate (the unigram/BPE literal-table pattern).
- Apply is explode(grams) → broadcast join with the ≤n_buckets-row
  ratio table → one map-side-combined groupBy(doc). The corpus side
  never shuffles except that single keyed aggregation; no Python
  anywhere in the hot path.
- Hashing is the 60-bit md5-prefix family (dedup.md5_hash_family), so
  an ANSI-SQL oracle replays it verbatim.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .bpe import normalize_words
from .dedup import md5_hash_family

UNATS = 1_000_000  # integer micro-nats, the engine-exact currency


def gram_buckets(text: Column, n_buckets: int,
                 bigrams: bool = True) -> Column:
    """array<long> of hashed (uni+bi)gram bucket ids, multiplicity
    kept (DSIR weights count occurrences)."""
    words = F.filter(F.split(normalize_words(text), " "),
                     lambda w: w != "")
    grams = words
    if bigrams:
        bi = F.zip_with(
            F.slice(words, 1, F.greatest(F.size(words) - 1, F.lit(0))),
            F.slice(words, 2, F.greatest(F.size(words) - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit("_"), b))
        grams = F.concat(words, bi)
    h = md5_hash_family(0)
    # conv() yields a string — cast to long BEFORE the modulo, or Spark
    # coerces through double and mangles the 60-bit value
    return F.transform(grams, lambda g: h(g).cast("long") % n_buckets)


def _bucket_counts(docs: DataFrame, text_col: str,
                   n_buckets: int, bigrams: bool) -> dict[int, int]:
    """bucket -> occurrence count; ≤ n_buckets rows collected."""
    rows = (
        docs.select(F.explode(
            gram_buckets(F.col(text_col), n_buckets, bigrams)
        ).alias("b"))
        .groupBy("b").agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    return {int(r.b): int(r.n) for r in rows}


def train_dsir(
    target: DataFrame,
    source: DataFrame,
    text_col: str = "text",
    n_buckets: int = 512,
    alpha: float = 1.0,
    bigrams: bool = True,
) -> list[tuple[int, int]]:
    """Fit the importance log-ratio table.

    Returns [(bucket, ratio_unats)] for every bucket 0..n_buckets-1:
    ratio_unats = round(1e6 · (ln p̂_target[b] − ln q̂_source[b]))
    with Laplace(alpha) smoothing. The floats live only here on the
    driver; everything distributed downstream is integer."""
    t = _bucket_counts(target, text_col, n_buckets, bigrams)
    s = _bucket_counts(source, text_col, n_buckets, bigrams)
    t_tot = sum(t.values()) + alpha * n_buckets
    s_tot = sum(s.values()) + alpha * n_buckets
    out = []
    for b in range(n_buckets):
        lp = math.log((t.get(b, 0) + alpha) / t_tot)
        lq = math.log((s.get(b, 0) + alpha) / s_tot)
        out.append((b, round((lp - lq) * UNATS)))
    return out


def apply_dsir(
    docs: DataFrame,
    ratios: list[tuple[int, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 512,
    bigrams: bool = True,
    top_k: int | None = None,
) -> DataFrame:
    """Score every document with its integer importance weight.

    Output: id, n_grams, weight_unats (+ rank ≤ top_k if requested —
    ordered by weight desc then id asc, the deterministic tie-break).
    Documents with zero grams keep weight 0 (explode_outer)."""
    spark = docs.sparkSession
    rdf = spark.createDataFrame(ratios, "b long, unats long")
    exploded = docs.select(
        F.col(id_col),
        F.explode_outer(
            gram_buckets(F.col(text_col), n_buckets, bigrams)).alias("b"),
    )
    scored = (
        exploded.join(F.broadcast(rdf), on="b", how="left")
        .groupBy(id_col)
        .agg(
            F.count("b").alias("n_grams"),
            F.coalesce(F.sum("unats"), F.lit(0)).alias("weight_unats"),
        )
    )
    if top_k is None:
        return scored
    return _ranked_top_k(
        scored, top_k,
        [F.col("weight_unats").desc(), F.col(id_col).asc()])


def _ranked_top_k(df: DataFrame, k: int, order: list) -> DataFrame:
    """Distributed top-k with a rank column, WITHOUT sorting the whole
    frame in one partition: ``orderBy(...).limit(k)`` compiles to
    TakeOrderedAndProject (per-partition top-k, then a k-row merge on
    the driver side of the exchange), and only the surviving ≤k rows
    pass through the single-partition rank window — bounded by the
    user's k, never by the corpus. (r9 verdict: the old unpartitioned
    ``Window.orderBy`` over the full scored corpus was the classic
    single-reducer sort scale-killer.)"""
    from pyspark.sql import Window

    top = df.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w))


def gumbel_top_k(
    scored: DataFrame,
    k: int,
    seed: int = 7,
    id_col: str = "doc_id",
) -> DataFrame:
    """The paper's resampling-without-replacement: perturb each weight
    with seeded Gumbel noise and take the top k. Noise u derives from
    an md5 hash of (seed, id) — deterministic re-runs — but the
    -ln(-ln(u)) transform is float, so this variant is NOT in the
    value-hash gate (use apply_dsir(top_k=...) there); it exists for
    the statistical behavior the paper specifies."""
    u = (
        F.conv(F.substring(
            F.md5(F.concat(F.lit(f"{seed}:"),
                           F.col(id_col).cast("string"))), 1, 15), 16, 10
        ).cast("double") + 0.5
    ) / float(1 << 60)
    g = -F.log(-F.log(u))
    perturbed = scored.withColumn(
        "gumbel_key", F.col("weight_unats") / UNATS + g)
    return _ranked_top_k(
        perturbed, k,
        [F.col("gumbel_key").desc(), F.col(id_col).asc()],
    ).drop("gumbel_key")


# ---------------------------------------------------------------------------
# SQL oracle mirror


def apply_dsir_sql(
    from_sql: str,
    id_expr: str,
    text_expr: str,
    ratios: list[tuple[int, int]],
    n_buckets: int = 512,
    bigrams: bool = True,
    id_alias: str = "doc_id",
) -> str:
    """DuckDB SQL replaying apply_dsir exactly: same normalization,
    md5-prefix bucket hash, and integer unat sums."""
    vals = ", ".join(f"({b}, {u})" for b, u in ratios)
    norm = (f"trim(regexp_replace(lower({text_expr}), "
            f"'[^a-z0-9]+', ' ', 'g'))")
    gram_src = f"""
        SELECT {id_expr} AS {id_alias},
               str_split({norm}, ' ') AS ws
        FROM {from_sql}
    """
    bucket = ("CAST(('0x' || substr(md5('0:' || g), 1, 15)) AS BIGINT) "
              f"% {n_buckets}")
    uni = f"""
        SELECT {id_alias}, unnest(list_filter(ws, w -> w <> '')) AS g
        FROM grams_src
    """
    bi = f"""
        SELECT {id_alias},
               unnest(list_transform(range(1, len(ws)),
                                     i -> ws[i] || '_' || ws[i+1])) AS g
        FROM grams_src
        WHERE len(ws) > 1 AND ws[1] <> ''
    """
    gram_union = f"({uni}) UNION ALL ({bi})" if bigrams else uni
    return f"""
        WITH grams_src AS ({gram_src}),
        grams AS ({gram_union}),
        r(b, unats) AS (VALUES {vals}),
        scored AS (
            SELECT g.{id_alias},
                   count(*) AS n_grams,
                   sum(r.unats) AS weight_unats
            FROM grams g
            JOIN r ON ({bucket.replace("'0:' || g", "'0:' || g.g")}) = r.b
            GROUP BY g.{id_alias}
        ),
        everyone AS (
            SELECT {id_expr} AS {id_alias} FROM {from_sql}
        )
        SELECT e.{id_alias},
               coalesce(s.n_grams, 0) AS n_grams,
               coalesce(s.weight_unats, 0) AS weight_unats
        FROM everyone e LEFT JOIN scored s USING ({id_alias})
    """
