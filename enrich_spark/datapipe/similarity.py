"""Similarity search over embedding columns (array<float>).

* brute_force_topk — exact cosine top-k: broadcast the (small) query set,
  crossJoin, score natively with F.zip_with/F.aggregate, window top-k.
  The baseline and the oracle-checkable path.
* lsh_topk — random-hyperplane LSH bucketing: probe only vectors sharing
  a signature band with the query. The 100 TB path: candidates shrink by
  ~(1/2^bits) per table; recall tuned by num_tables.
* embedding_dup_pairs — cosine near-duplicate pairs via the same LSH
  buckets (dedup use-case).

All dot products stay JVM-side (higher-order functions over arrays), no
Python. Hyperplanes are generated deterministically from a seed via
xxhash64 so distributed runs and SQL oracles agree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k neighbours per query. queries must be small (broadcast).

    Plan: BroadcastNestedLoopJoin (queries side tiny) → per-row cosine →
    window top-k partitioned by query. The only shuffle is on query_id,
    bounded by |queries| × |vectors| rows pre-filtered to nothing — at
    scale prefer lsh_topk.
    """
    scored = vectors.crossJoin(F.broadcast(queries)).select(
        F.col(query_id_col),
        F.col(id_col),
        cosine(F.col(vec_col), F.col(query_vec_col)).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _hyperplane(dim: int, table: int, bit: int) -> list[float]:
    """Deterministic pseudo-random hyperplane component list (seeded)."""
    # simple LCG-free derivation: hash((table,bit,i)) → [-1, 1)
    import hashlib

    out = []
    for i in range(dim):
        h = int.from_bytes(
            hashlib.md5(f"{table}:{bit}:{i}".encode()).digest()[:8], "big"
        )
        out.append((h / 2**63) - 1.0)
    return out


def rh_signature(vec: Column, dim: int, table: int, bits: int = 8) -> Column:
    """Random-hyperplane signature: one int per table (bits sign bits)."""
    sig = F.lit(0)
    for b in range(bits):
        plane = F.array(*[F.lit(v) for v in _hyperplane(dim, table, b)])
        sig = sig + F.when(dot(vec, plane) > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return sig


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    num_tables: int = 4,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: equi-join on (table, signature) then exact rescore.

    Shuffle key (table, sig) has num_tables × 2^bits buckets — uniform for
    normalized embeddings; per-bucket candidate lists are small, so the
    join output is ~|queries| × bucket_size × tables instead of
    |queries| × |vectors|.
    """
    def with_sigs(df, vcol, idc, *extra):
        return df.select(
            *extra, F.col(idc), F.col(vcol),
            F.explode(
                F.array(*[
                    F.struct(F.lit(t).alias("tbl"), rh_signature(F.col(vcol), dim, t, bits).alias("sig"))
                    for t in range(num_tables)
                ])
            ).alias("bk"),
        ).select(*extra, idc, vcol, "bk.tbl", "bk.sig")

    v = with_sigs(vectors, vec_col, id_col)
    q = with_sigs(queries, query_vec_col, query_id_col)
    cand = (
        v.join(
            F.broadcast(q),
            (v["tbl"] == q["tbl"]) & (v["sig"] == q["sig"]),
        )
        .select(
            F.col(query_id_col), F.col(id_col),
            cosine(F.col(vec_col), F.col(query_vec_col)).alias("cosine_sim"),
        )
        .dropDuplicates([query_id_col, id_col])
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col(id_col).asc()
    )
    return cand.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    centroids: list | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: assign every vector to its
    nearest centroid, probe only the nprobe lists nearest each query,
    exact-rescore the candidates.

    Centroids are a driver-side list of (cid, vector) — in real IVF they
    come from k-means and always fit on the driver (K ≤ a few thousand);
    here the default is a deterministic sample (lowest-id vectors) so the
    SQL oracle can reproduce them. They are embedded as a literal array,
    so list assignment is a pure map-side `transform`+`array_max` over the
    scan — NO shuffle at any data size. The only shuffle in the whole plan
    is the final per-query top-k window, whose input is already cut to
    ~nprobe/K of the data.

    Tie-handling for oracle parity: centroid affinity is rounded to 6
    decimals and ties break toward the lower cid (encoded as
    struct(csim, -cid) under array_max's lexicographic max); final cosine
    is rounded to 4 decimals with ties toward the lower id.
    """
    if centroids is None:
        centroids = [
            (r[0], [float(x) for x in r[1]])
            for r in vectors.where(F.col(id_col) < n_centroids)
            .select(id_col, vec_col)
            .collect()
        ]

    def lit_vec(vs):
        return F.array(*[F.lit(float(x)) for x in vs])

    def best_cid(vec: Column) -> Column:
        affinities = F.array(*[
            F.struct(
                F.round(cosine(vec, lit_vec(cvec)), 6).alias("csim"),
                F.lit(-cid).alias("ncid"),
            )
            for cid, cvec in centroids
        ])
        return -F.array_max(affinities)["ncid"]

    def probe_cids(vec: Column) -> Column:
        affinities = F.array(*[
            F.struct(
                F.round(cosine(vec, lit_vec(cvec)), 6).alias("csim"),
                F.lit(-cid).alias("ncid"),
            )
            for cid, cvec in centroids
        ])
        top = F.slice(F.sort_array(affinities, asc=False), 1, nprobe)
        return F.transform(top, lambda s: -s["ncid"])

    assigned = vectors.select(
        F.col(id_col), F.col(vec_col), best_cid(F.col(vec_col)).alias("cid")
    )
    probes = queries.select(
        F.col(query_id_col), F.col(query_vec_col),
        F.explode(probe_cids(F.col(query_vec_col))).alias("cid"),
    )
    cand = assigned.join(F.broadcast(probes), "cid").select(
        F.col(query_id_col), F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col(query_vec_col)), 4).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col(id_col).asc()
    )
    return cand.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def embedding_dup_pairs(
    vectors: DataFrame,
    dim: int,
    threshold: float = 0.95,
    num_tables: int = 4,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cosine near-duplicate pairs (id_a < id_b, sim ≥ threshold) via
    shared random-hyperplane buckets."""
    sigs = vectors.select(
        F.col(id_col), F.col(vec_col),
        F.explode(
            F.array(*[
                F.struct(F.lit(t).alias("tbl"), rh_signature(F.col(vec_col), dim, t, bits).alias("sig"))
                for t in range(num_tables)
            ])
        ).alias("bk"),
    ).select(id_col, vec_col, "bk.tbl", "bk.sig")
    l, r = sigs.alias("l"), sigs.alias("r")
    return (
        l.join(
            r,
            (F.col("l.tbl") == F.col("r.tbl"))
            & (F.col("l.sig") == F.col("r.sig"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            cosine(F.col(f"l.{vec_col}"), F.col(f"r.{vec_col}")).alias("cosine_sim"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .where(F.col("cosine_sim") >= threshold)
    )
