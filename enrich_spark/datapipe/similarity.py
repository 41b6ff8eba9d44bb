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


def rh_signature_sql(col: str, dim: int, table: int, bits: int = 8) -> str:
    """Random-hyperplane signature as a SQL expression string: one int per
    table (bits sign bits). A string parses JVM-side in one round-trip —
    building it from py4j Column literals (bits × dim F.lit calls) costs
    ~1 ms each and dominates driver time for dim=64."""
    terms = []
    for b in range(bits):
        arr = "array(" + ", ".join(f"{v!r}D" for v in _hyperplane(dim, table, b)) + ")"
        dot_s = f"aggregate(zip_with({col}, {arr}, (x, y) -> x * y), 0.0D, (a, v) -> a + v)"
        terms.append(f"(CASE WHEN ({dot_s}) > 0 THEN {1 << b} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def rh_signature(vec: Column, dim: int, table: int, bits: int = 8) -> Column:
    """Random-hyperplane signature: one int per table (bits sign bits).
    `vec` must be a plain column reference (the expression is compiled
    from SQL text, see rh_signature_sql)."""
    return F.expr(rh_signature_sql(_col_name(vec), dim, table, bits))


def _col_name(c: Column | str) -> str:
    if isinstance(c, str):
        return c
    # Column.__repr__ is Column<'name'>
    s = str(c)
    return s[s.index("'") + 1 : s.rindex("'")]


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
    round_digits: int | None = None,
    multiprobe: int = 0,
) -> DataFrame:
    """Approximate top-k: equi-join on (table, signature) then exact rescore.
    round_digits rounds the cosine BEFORE ranking so rank order is stable
    across engines at float ties (needed for SQL-oracle parity).

    ``multiprobe`` additionally probes, per table, the buckets whose
    signature differs from the query's in one of the first ``multiprobe``
    bits — the classic recall lever that multiplies only the (tiny)
    QUERY side by (1+multiprobe) instead of adding whole hash tables on
    the corpus side; candidate dedup keeps rescoring each vector once.

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
                    F.struct(F.lit(t).alias("tbl"), rh_signature(vcol, dim, t, bits).alias("sig"))
                    for t in range(num_tables)
                ])
            ).alias("bk"),
        ).select(*extra, idc, vcol, "bk.tbl", "bk.sig")

    v = with_sigs(vectors, vec_col, id_col)
    q = with_sigs(queries, query_vec_col, query_id_col)
    if multiprobe:
        probes = F.array(F.col("sig"), *[
            F.col("sig").bitwiseXOR(F.lit(1 << b))
            for b in range(min(multiprobe, bits))
        ])
        q = q.select(query_id_col, query_vec_col, "tbl",
                     F.explode(probes).alias("sig"))
    cand = (
        v.join(
            F.broadcast(q),
            (v["tbl"] == q["tbl"]) & (v["sig"] == q["sig"]),
        )
        .select(
            F.col(query_id_col), F.col(id_col),
            (
                F.round(cosine(F.col(vec_col), F.col(query_vec_col)), round_digits)
                if round_digits is not None
                else cosine(F.col(vec_col), F.col(query_vec_col))
            ).alias("cosine_sim"),
        )
        .dropDuplicates([query_id_col, id_col])
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col(id_col).asc()
    )
    return cand.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def lsh_topk_plain_probe(
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
    round_digits: int | None = None,
    multiprobe: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """Plain AND multiprobe LSH top-k from ONE corpus candidate pass
    (r14, guide §1.2/§2.4): results are row-identical to
    ``lsh_topk(..., multiprobe=0)`` and ``lsh_topk(..., multiprobe=m)``
    run separately, but the corpus-side signature computation
    (num_tables × bits × dim multiply-adds per vector) and the
    candidate broadcast join execute once instead of twice.

    How: the probe candidate set is a superset of the plain one — per
    (table, query) the probes are the exact bucket plus the Hamming-1
    buckets on the first ``multiprobe`` bits. Each probe row carries an
    ``is_exact`` flag; per-(query, vector) dedup aggregates
    ``max(is_exact)``, so plain = the flagged subset, probe = all rows
    (a vector seen via BOTH an exact and a flipped bucket keeps
    is_exact=true, exactly the pair the plain search found; cosine is a
    function of the pair, so both rankings see the values the separate
    searches computed). The two returned frames share the dedup
    aggregate subplan. NOTE (measured r14): consuming the two frames
    through a UNION re-executes that subplan per branch — the branches
    prune differently (probe drops ``is_exact``) and exchange reuse
    dies; a union consumer must use
    :func:`lsh_topk_plain_probe_tagged` instead, which emits both
    parts from one windowed frame. This two-frame form is for
    consumers that use the frames in separate jobs/joins (the gated
    bundle's recall part)."""
    cand = _lsh_candidate_agg(
        vectors, queries, dim, num_tables, bits, id_col, vec_col,
        query_id_col, query_vec_col, round_digits, multiprobe)
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col(id_col).asc()
    )

    def ranked(df):
        return (df.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= k)
                .select(query_id_col, id_col, "cosine_sim", "rank"))

    plain = ranked(cand.where(F.col("is_exact")))
    probe = ranked(cand)
    return plain, probe


def _lsh_candidate_agg(
    vectors, queries, dim, num_tables, bits, id_col, vec_col,
    query_id_col, query_vec_col, round_digits, multiprobe,
) -> DataFrame:
    """Shared candidate pass for the plain+probe searches: corpus/query
    signatures, flagged probe explode (exact bucket first), candidate
    broadcast join, and the per-(query, vector) dedup aggregate
    carrying max(cosine)=the pair's cosine and max(is_exact)=did any
    exact bucket produce this pair."""
    def with_sigs(df, vcol, idc):
        return df.select(
            F.col(idc), F.col(vcol),
            F.explode(
                F.array(*[
                    F.struct(F.lit(t).alias("tbl"),
                             rh_signature(vcol, dim, t, bits).alias("sig"))
                    for t in range(num_tables)
                ])
            ).alias("bk"),
        ).select(idc, vcol, "bk.tbl", "bk.sig")

    v = with_sigs(vectors, vec_col, id_col)
    q = with_sigs(queries, query_vec_col, query_id_col)
    probes = F.array(
        F.struct(F.col("sig").alias("sig"), F.lit(True).alias("is_exact")),
        *[F.struct(F.col("sig").bitwiseXOR(F.lit(1 << b)).alias("sig"),
                   F.lit(False).alias("is_exact"))
          for b in range(min(multiprobe, bits))])
    q = q.select(query_id_col, query_vec_col, "tbl",
                 F.explode(probes).alias("pr")) \
         .select(query_id_col, query_vec_col, "tbl", "pr.sig", "pr.is_exact")
    cand = (
        v.join(
            F.broadcast(q),
            (v["tbl"] == q["tbl"]) & (v["sig"] == q["sig"]),
        )
        .select(
            F.col(query_id_col), F.col(id_col),
            (
                F.round(cosine(F.col(vec_col), F.col(query_vec_col)), round_digits)
                if round_digits is not None
                else cosine(F.col(vec_col), F.col(query_vec_col))
            ).alias("cosine_sim"),
            F.col("is_exact"),
        )
        .groupBy(query_id_col, id_col)
        .agg(F.max("cosine_sim").alias("cosine_sim"),
             F.max("is_exact").alias("is_exact"))
    )
    return cand


def lsh_topk_plain_probe_tagged(
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
    round_digits: int | None = None,
    multiprobe: int = 2,
) -> DataFrame:
    """The two :func:`lsh_topk_plain_probe` results as ONE part-tagged
    frame (columns: query_id, vec_id, cosine_sim, part∈{plain,probe}) —
    for consumers that union the two modes anyway (the bench row).

    Why a separate entry point: returning two DataFrames and unioning
    them re-executes the shared candidate subplan per branch — the
    union's branches are pruned independently, the probe branch drops
    ``is_exact``, its partial aggregate no longer canonicalizes equal
    to the plain branch's, and exchange reuse dies (measured: the
    two-frame union is ~2× the single pass). Here both rankings are
    windows over the SAME aggregate and a generator emits the two
    part rows, so the corpus signature pass, candidate broadcast join
    and (query, vector) dedup execute exactly once. The plain rank is
    row_number within (query, is_exact) — for the exact group that is
    precisely the rank among exact-bucket candidates, i.e. the plain
    search's rank."""
    cand = _lsh_candidate_agg(
        vectors, queries, dim, num_tables, bits, id_col, vec_col,
        query_id_col, query_vec_col, round_digits, multiprobe)
    w_all = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col(id_col).asc())
    w_exact = Window.partitionBy(query_id_col, "is_exact").orderBy(
        F.col("cosine_sim").desc(), F.col(id_col).asc())
    ranked = cand.select(
        F.col(query_id_col), F.col(id_col), "cosine_sim", "is_exact",
        F.row_number().over(w_all).alias("_rp"),
        F.row_number().over(w_exact).alias("_re"),
    )
    parts = F.array(
        F.when(F.col("is_exact") & (F.col("_re") <= k), F.lit("plain")),
        F.when(F.col("_rp") <= k, F.lit("probe")),
    )
    return (ranked
            .select(query_id_col, id_col, "cosine_sim",
                    F.explode(F.filter(parts, lambda x: x.isNotNull()))
                    .alias("part")))


def train_centroids(
    vectors: DataFrame,
    n_centroids: int = 16,
    iters: int = 10,
    sample: int = 10_000,
    vec_col: str = "embedding",
    seed: int = 7,
) -> list[tuple[int, list[float]]]:
    """Spherical k-means centroids for IVF, trained driver-side on a
    BOUNDED sample (`limit(sample)` → one bounded collect; real IVF
    trains on a sample too — K and the sample always fit on the driver,
    the 100 TB corpus never moves). k-means++ init with a fixed seed,
    cosine assignment, mean-renormalize update; empty clusters keep
    their previous centroid. Returns the (cid, vector) list `ivf_topk`
    accepts, which it embeds as plan constants — so serving stays
    map-side and shuffle-free regardless of corpus size."""
    import numpy as np

    rows = vectors.select(vec_col).limit(sample).collect()
    X = np.asarray([list(map(float, r[0])) for r in rows], dtype=np.float64)
    if X.size == 0:
        return []
    n = np.linalg.norm(X, axis=1)
    X = X[n > 0] / n[n > 0, None]
    if len(X) == 0:  # all-zero vectors: nothing trainable
        return []
    k = min(n_centroids, len(X))
    rng = np.random.default_rng(seed)
    # k-means++ seeding on cosine distance (1 - sim on unit vectors)
    first = int(rng.integers(len(X)))
    C = [X[first]]
    for _ in range(1, k):
        d2 = np.min(1.0 - np.stack([X @ c for c in C], axis=1), axis=1)
        d2 = np.clip(d2, 0, None)
        p = d2 / d2.sum() if d2.sum() > 0 else None
        C.append(X[int(rng.choice(len(X), p=p))])
    C = np.stack(C)
    for _ in range(iters):
        assign = (X @ C.T).argmax(axis=1)
        for j in range(k):
            members = X[assign == j]
            if len(members):
                m = members.mean(axis=0)
                nm = np.linalg.norm(m)
                if nm > 0:
                    C[j] = m / nm
    return [(j, C[j].tolist()) for j in range(k)]


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

    # The affinity expression is generated as ONE SQL string. Both naive
    # shapes are driver-bound, not executor-bound: a py4j Column per
    # literal (16 centroids × 64 dims × 2 call sites ≈ 2k round-trips)
    # costs ~4 s to build, and a statically-unrolled 1024-term Add chain
    # costs even more in Catalyst analysis/codegen. A single expr() with
    # array literals + higher-order aggregate keeps the tree shallow
    # (parses JVM-side in ms); the interpreted lambda eval is noise at
    # any |vectors| since it is one pass, map-side. Centroid norms fold
    # to Python-float constants.
    import math

    def d(v: float) -> str:
        return f"{float(v)!r}D"

    def sql_norm(col: str) -> str:
        return f"sqrt(aggregate({col}, 0.0D, (a, x) -> a + x * x))"

    def affinity_sql(col: str, vnorm_col: str) -> str:
        parts = []
        for cid, cvec in centroids:
            cnorm = math.sqrt(sum(x * x for x in cvec))
            arr = "array(" + ", ".join(d(v) for v in cvec) + ")"
            dot_s = (
                f"aggregate(zip_with({col}, {arr}, (x, y) -> x * y), 0.0D,"
                f" (a, v) -> a + v)"
            )
            parts.append(
                f"struct(round(({dot_s}) / ({vnorm_col} * {d(cnorm)}), 6) AS csim, "
                f"{-cid} AS ncid)"
            )
        return "array(" + ", ".join(parts) + ")"

    assigned = (
        vectors.withColumn("_vn", F.expr(sql_norm(vec_col)))
        .select(
            F.col(id_col), F.col(vec_col),
            F.expr(f"-(array_max({affinity_sql(vec_col, '_vn')}).ncid)").alias("cid"),
        )
    )
    probes = (
        queries.withColumn("_qn", F.expr(sql_norm(query_vec_col)))
        .select(
            F.col(query_id_col), F.col(query_vec_col),
            F.explode(
                F.expr(
                    f"transform(slice(sort_array({affinity_sql(query_vec_col, '_qn')},"
                    f" false), 1, {nprobe}), s -> -(s.ncid))"
                )
            ).alias("cid"),
        )
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
                F.struct(F.lit(t).alias("tbl"), rh_signature(vec_col, dim, t, bits).alias("sig"))
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
        # r14, the r13 pair-family rule: the threshold filter is a pure
        # function of the pair, so it runs BELOW the dedup — the dedup
        # exchange carries only pairs that survive the cosine cut
        # (duplicates of a pair agree on cosine_sim, so the kept rows
        # are identical either way)
        .where(F.col("cosine_sim") >= threshold)
        .dropDuplicates(["id_a", "id_b"])
    )


# ---------------------------------------------------------------------------
# k-means document clustering (centroid assignment + rollup)


def _sql_norm(col: str) -> str:
    return f"sqrt(aggregate({col}, 0.0D, (a, x) -> a + x * x))"


def _affinity_array_sql(centroids, col: str, vnorm_col: str) -> str:
    """Literal-centroid cosine affinities as ONE expr() string — the
    same driver-bound-cost rationale as ivf_topk: a py4j Column per
    literal costs seconds to build; a single array-literal expression
    parses JVM-side in ms. Rounded to 6dp, ties break to the lower cid
    (struct(csim, -cid) under array_max's lexicographic max)."""
    import math

    def d(v: float) -> str:
        return f"{float(v)!r}D"

    parts = []
    for cid, cvec in centroids:
        cnorm = math.sqrt(sum(x * x for x in cvec))
        arr = "array(" + ", ".join(d(v) for v in cvec) + ")"
        dot_s = (
            f"aggregate(zip_with({col}, {arr}, (x, y) -> x * y), 0.0D,"
            f" (a, v) -> a + v)"
        )
        parts.append(
            f"struct(round(({dot_s}) / ({vnorm_col} * {d(cnorm)}), 6) AS csim, "
            f"{-cid} AS ncid)"
        )
    return "array(" + ", ".join(parts) + ")"


def cluster_assign(
    vectors: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest centroid — pure map-side.

    Centroids (from :func:`train_centroids`, or any fixed list) fold
    into the plan as literals, so assignment is a single codegen'd
    projection over the scan: NO shuffle, NO broadcast, at any corpus
    size. Output: id, cid, sim_bp (cosine to the winning centroid in
    integer basis points — the all-integer discipline that keeps
    downstream aggregates bit-identical across engines).
    """
    best = f"array_max({_affinity_array_sql(centroids, vec_col, '_vn')})"
    return (
        vectors.withColumn("_vn", F.expr(_sql_norm(vec_col)))
        .select(
            F.col(id_col),
            F.expr(f"-({best}.ncid)").cast("long").alias("cid"),
            F.expr(f"cast(round(({best}).csim * 10000, 0) as long)")
            .alias("sim_bp"),
        )
    )


def semantic_dedup(
    vectors: DataFrame,
    centroids: list[tuple[int, list[float]]],
    threshold: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means-cluster
    the embeddings, then prune semantic near-duplicates WITHIN each
    cluster only — never across the corpus.

    Scale shape: assignment is the same literal-centroid map-side
    projection as :func:`cluster_assign` (zero shuffle); the pair join
    shuffles on ``cid`` alone, so the quadratic term is bounded by the
    cluster size — sizing K with the corpus (the paper uses 50k
    clusters at web scale) keeps per-cluster work constant as data
    grows. Keep rule is deterministic, no iterative connectivity: a
    vector is pruned iff a LOWER-id member of its cluster is within
    ``threshold`` cosine, so every duplicate group keeps exactly its
    minimum id.

    Output: id, cid, sim_bp (cosine-to-centroid in basis points),
    n_dups (earlier in-cluster near-dups), max_sim (4dp, -1.0 when
    none), is_kept (0/1).
    """
    best = f"array_max({_affinity_array_sql(centroids, vec_col, '_vn')})"
    av = (
        vectors.withColumn("_vn", F.expr(_sql_norm(vec_col)))
        .select(
            F.col(id_col), F.col(vec_col), F.col("_vn"),
            F.expr(f"-({best}.ncid)").cast("long").alias("cid"),
            F.expr(f"cast(round(({best}).csim * 10000, 0) as long)")
            .alias("sim_bp"),
        )
    )
    l, r = av.alias("l"), av.alias("r")
    sim = F.round(
        dot(F.col(f"l.{vec_col}"), F.col(f"r.{vec_col}"))
        / (F.col("l._vn") * F.col("r._vn")), 4)
    earlier = (
        l.join(r, (F.col("l.cid") == F.col("r.cid"))
               & (F.col(f"l.{id_col}") > F.col(f"r.{id_col}")))
        .select(F.col(f"l.{id_col}").alias(id_col), sim.alias("sim"))
        .where(F.col("sim") >= threshold)
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_dups"),
             F.max("sim").alias("max_sim"))
    )
    return (
        av.join(earlier, [id_col], "left")
        .select(
            F.col(id_col), "cid", "sim_bp",
            F.coalesce("n_dups", F.lit(0)).cast("long").alias("n_dups"),
            F.coalesce("max_sim", F.lit(-1.0)).alias("max_sim"),
            F.col("n_dups").isNull().cast("long").alias("is_kept"),
        )
    )


def cluster_stats(
    vectors: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-cluster rollup of a k-means assignment: size, cohesion.

    One shuffle (groupBy cid, map-side combined, ≤ K groups). All
    outputs integer: n, sum/mean/min/max of sim_bp (mean = integer
    division) — deterministic on any engine regardless of float sum
    order.
    """
    a = cluster_assign(vectors, centroids, id_col, vec_col)
    return a.groupBy("cid").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("sim_bp").cast("long").alias("sum_sim_bp"),
        # floor(double) mean: identical IEEE division + floor on every
        # engine (a bare cast diverges — Spark truncates, DuckDB rounds)
        F.floor(F.sum("sim_bp") / F.count(F.lit(1))).cast("long")
        .alias("mean_sim_bp"),
        F.min("sim_bp").cast("long").alias("min_sim_bp"),
        F.max("sim_bp").cast("long").alias("max_sim_bp"),
    )


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric per-vector int8 quantization of an embedding column —
    the standard 4× storage/bandwidth compression an embedding corpus
    gets before indexing (each vector: scale = max|v|/127, q_i =
    round(v_i/scale), reconstruction v̂_i = q_i·scale).

    Map-side only — zero shuffle, one pass, native array expressions
    (no Python). Output: id, q (array<int> in [-127,127]), scale_1e9
    (the per-vector scale in integer nano-units — engine-stable), and
    max_abs_err_1e6 (integer micro-units reconstruction error bound
    actually achieved, ≤ scale/2 by construction).
    """
    v = F.col(vec_col)
    amax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = amax / F.lit(127.0)
    q = F.transform(v, lambda x: F.round(x / scale).cast("int"))
    err = F.array_max(F.zip_with(
        v, q, lambda x, qi: F.abs(x - qi * scale)))
    return df.select(
        F.col(id_col),
        q.alias("q"),
        F.floor(scale * 1_000_000_000).cast("long").alias("scale_1e9"),
        F.floor(err * 1_000_000).cast("long").alias("max_abs_err_1e6"),
    )


def mine_margin_pairs(
    src: DataFrame,
    tgt: DataFrame,
    k: int = 4,
    margin_threshold_ppm: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_src_rows: int | None = 100_000,
) -> DataFrame:
    """Margin-based pair mining (Artetxe & Schwenk 2019, the standard
    bitext/hard-negative miner): a candidate pair (x ∈ src, y ∈ tgt)
    scores by its cosine RELATIVE to each side's neighborhood —

        margin(x, y) = cos(x, y) / ((avgₖ(x→tgt) + avgₖ(y→src)) / 2)

    — which suppresses hub vectors that are near everything. Emitted:
    pairs where y is x's top-1 target neighbor and margin >
    ``margin_threshold_ppm`` (parts-per-million integer).

    Engine-exact arithmetic: cosines become integer micro-units
    (floor(cos·10⁶)); the margin is one integer division
    ``(2k·cos_µ·10⁶) div (Σtopk_x_µ + Σtopk_y_µ)`` — sums of k
    integers, no float accumulation order anywhere, so the output is
    value-hash-gateable.

    Scale shape: assumes src is the SMALL side (a query batch, an eval
    set, the new-crawl slice) — both directions run through
    :func:`brute_force_topk`'s broadcast plan (both broadcasts are
    bounded by |src| rows: the reverse direction only broadcasts src's
    top-1 targets). That contract is ENFORCED, not advisory:
    ``max_src_rows`` (default 100k ≈ dim·8·100k bytes broadcast — size
    for your executors) is checked with one count and the function
    raises, pointing at :func:`lsh_topk`, instead of letting an
    oversized src reach a silent executor OOM. Pass ``None`` to skip
    the count when the caller already bounds src.
    """
    if max_src_rows is not None:
        n_src = src.count()
        if n_src > max_src_rows:
            raise ValueError(
                f"mine_margin_pairs: src has {n_src} rows > "
                f"max_src_rows={max_src_rows}; the broadcast plan would "
                "risk executor OOM — use lsh_topk for the neighbor "
                "search (same downstream margin algebra) or raise the "
                "cap explicitly")
    # widen to double BEFORE any multiply: float32 products rounded to
    # float then promoted differ from promote-then-multiply doubles at
    # ~1e-7 — enough to flip the 1e-6 integer floors this op gates on
    dbl = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    src = src.select(F.col(id_col), dbl.alias(vec_col))
    tgt = tgt.select(F.col(id_col), dbl.alias(vec_col))

    def scored(vectors, queries, qname, vname):
        # integer micro-unit cosine, ranked BY the integer (not the raw
        # float) so Spark and any SQL replay pick identical top-k
        # members even when two cosines share a floor bucket
        s = vectors.crossJoin(F.broadcast(
            queries.select(F.col(id_col).alias(qname),
                           F.col(vec_col).alias("_qv")))).select(
            F.col(qname), F.col(id_col).alias(vname),
            F.floor(cosine(F.col(vec_col), F.col("_qv")) * 1_000_000)
            .cast("long").alias("cos_u"))
        w = Window.partitionBy(qname).orderBy(
            F.col("cos_u").desc(), F.col(vname).asc())
        return s.withColumn("rank", F.row_number().over(w))

    x2y = scored(tgt, src, "x", "y")
    x_stats = x2y.where(F.col("rank") <= k).groupBy("x").agg(
        F.sum("cos_u").alias("sum_x_u"))
    best = x2y.where(F.col("rank") == 1).select("x", "y", "cos_u")
    ys = best.select("y").distinct()
    candidates = tgt.join(ys, F.col(id_col) == F.col("y"), "leftsemi")
    y2x = scored(src, candidates, "y", "x2")
    y_stats = y2x.where(F.col("rank") <= k).groupBy("y").agg(
        F.sum("cos_u").alias("sum_y_u"))

    return (best.join(x_stats, "x").join(y_stats, "y")
            .select(
                "x", "y", "cos_u",
                F.expr(f"(2 * {k} * cos_u * 1000000) div "
                       f"(sum_x_u + sum_y_u)").alias("margin_ppm"))
            .where(F.col("margin_ppm") > margin_threshold_ppm))


# ---------------------------------------------------------------------------
# deterministic negative sampling — contrastive / retrieval training


def negative_samples(
    docs: DataFrame,
    k: int = 4,
    id_col: str = "doc_id",
    seed: int = 42,
    n_buckets: int = 1024,
) -> DataFrame:
    """k deterministic "random" negatives per anchor doc — the pair
    generator behind contrastive/retrieval training (in-batch negatives
    are biased by batch composition; a corpus-level sampler must be a
    pure function of (id, seed) so every retry/repartition regenerates
    the SAME pairs).

    Construction: every id hashes to one of ``n_buckets`` buckets
    (md5-derived so a SQL oracle replays it); each bucket's
    representative is its MIN id (one groupBy over ≤ n_buckets groups
    — bounded shuffle); anchor a's j-th negative is the representative
    of bucket (bucket(a)+j) mod n_buckets. The ≤ n_buckets reps come to
    the driver and re-enter the plan as ONE map literal (the IVF
    plan-literal pattern), so the sampling pass itself is map-side
    zero-shuffle: explode k candidate offsets, map-lookup, drop
    self-pairs and empty buckets.

    Output: (anchor_id, j, neg_id), ≤ k rows per anchor. Negatives are
    shared within a bucket-offset class — by design: with n_buckets ≫
    batch size, collisions inside any training batch are rare, and rep
    reuse is what keeps the generator one bounded broadcast instead of
    a corpus-sized shuffle.
    """
    def bucket(c: Column) -> Column:
        h = F.conv(F.substring(F.md5(
            F.concat(F.lit(f"{seed}:neg:"), c.cast("string"))), 1, 15),
            16, 10).cast("long")
        return h % n_buckets

    ids = docs.select(F.col(id_col).alias("_id")).withColumn(
        "_b", bucket(F.col("_id")))
    reps = ids.groupBy("_b").agg(F.min("_id").alias("_rep")).collect()
    if not reps:
        # empty corpus: an argless create_map() is untyped and breaks
        # element_at analysis — return an empty frame with the same
        # schema as the populated path instead
        return (docs.select(
            F.col(id_col).alias("anchor_id"),
            F.lit(1).cast("long").alias("j"),
            F.col(id_col).alias("neg_id"))
            .where(F.lit(False)))
    rep_map = F.create_map(
        *[F.lit(x) for r in reps for x in (int(r._b), r._rep)])
    out = (docs.select(F.col(id_col).alias("anchor_id"))
           .withColumn("_b", bucket(F.col("anchor_id")))
           .select("anchor_id", "_b",
                   F.explode(F.sequence(F.lit(1), F.lit(k))).alias("j"))
           .withColumn("neg_id",
                       F.element_at(rep_map,
                                    (F.col("_b") + F.col("j"))
                                    % n_buckets))
           .where(F.col("neg_id").isNotNull()
                  & (F.col("neg_id") != F.col("anchor_id")))
           .select("anchor_id", F.col("j").cast("long").alias("j"),
                   "neg_id"))
    return out


def negative_samples_sql(
    from_sql: str,
    k: int = 4,
    id_expr: str = "doc_id",
    seed: int = 42,
    n_buckets: int = 1024,
) -> str:
    """DuckDB mirror of :func:`negative_samples` (same md5 bucket, same
    min-id representative, same (b+j) mod B probe)."""
    b = (f"CAST(('0x' || substr(md5('{seed}:neg:' || id), 1, 15)) "
         f"AS BIGINT) % {n_buckets}")
    return f"""
        WITH ids AS (
          SELECT {id_expr} AS id, {b} AS b FROM {from_sql}
        ),
        reps AS (SELECT b, min(id) AS rep FROM ids GROUP BY b),
        cand AS (
          SELECT i.id, t.j, (i.b + t.j) % {n_buckets} AS cb
          FROM ids i, LATERAL unnest(generate_series(1, {k})) AS t(j)
        )
        SELECT c.id AS anchor_id, CAST(c.j AS BIGINT) AS j,
               r.rep AS neg_id
        FROM cand c JOIN reps r ON r.b = c.cb
        WHERE r.rep <> c.id
    """


# ---------------------------------------------------------------------------
# ANN quality measurement — recall@k of an approximate index vs ground truth


def topk_recall(
    approx: DataFrame,
    exact: DataFrame,
    query_col: str = "query_id",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-query recall of an ANN result against brute-force ground
    truth — the acceptance metric every approximate index (LSH tables,
    IVF probe counts, PQ bits) is tuned by. A recall number next to
    the latency number is what makes "approximate" an engineering
    choice instead of a leap of faith.

    Both inputs are (query, neighbor) result sets (extra columns
    ignored; duplicates collapsed). Output per ground-truth query:
    ``n_true``, ``n_hits`` (ground-truth neighbors the approx result
    found), ``recall_bp`` (= n_hits·10000 div n_true — integer basis
    points, engine-exact). Queries the approx result missed entirely
    score 0, not NULL.

    Scale shape: two dropDuplicates + one equi-join + one groupBy, all
    keyed by query — result sets are |queries|·k rows (tiny next to
    the corpus), so every stage is bounded by the evaluation set, not
    the indexed corpus.
    """
    e = exact.select(F.col(query_col).alias("_q"),
                     F.col(id_col).alias("_n")).dropDuplicates()
    a = approx.select(F.col(query_col).alias("_q"),
                      F.col(id_col).alias("_n")).dropDuplicates()
    hits = e.join(a, ["_q", "_n"], "left_semi") \
        .groupBy("_q").agg(F.count(F.lit(1)).alias("n_hits"))
    base = e.groupBy("_q").agg(F.count(F.lit(1)).alias("n_true"))
    out = base.join(hits, "_q", "left")
    n_hits = F.coalesce(F.col("n_hits"), F.lit(0)).cast("long")
    return out.select(
        F.col("_q").alias(query_col),
        F.col("n_true").cast("long").alias("n_true"),
        n_hits.alias("n_hits"),
        F.expr("coalesce(n_hits, 0) * 10000 div n_true")
        .cast("long").alias("recall_bp"),
    )


def topk_recall_summary(
    approx: DataFrame,
    exact: DataFrame,
    query_col: str = "query_id",
    id_col: str = "vec_id",
) -> DataFrame:
    """One-row corpus rollup of :func:`topk_recall`: query count,
    micro-averaged recall (total hits over total truths, basis
    points), and the count of perfectly-recalled queries. Callers
    that already hold the per-query frame should roll IT up via
    :func:`summarize_topk_recall` instead of paying the recall join
    twice."""
    per_q = topk_recall(approx, exact, query_col, id_col)
    return summarize_topk_recall(per_q)


def summarize_topk_recall(per_q: DataFrame) -> DataFrame:
    """Roll up an existing :func:`topk_recall` result (reuses the
    already-built join subtree instead of reconstructing it)."""
    return per_q.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.sum("n_true").cast("long").alias("n_true"),
        F.sum("n_hits").cast("long").alias("n_hits"),
        F.expr("sum(n_hits) * 10000 div sum(n_true)")
        .cast("long").alias("recall_bp"),
        F.sum((F.col("n_hits") == F.col("n_true")).cast("long"))
        .cast("long").alias("perfect_queries"),
    )


def topk_recall_sql(approx_sql: str, exact_sql: str,
                    query_expr: str = "query_id",
                    id_expr: str = "vec_id") -> str:
    """DuckDB mirror of :func:`topk_recall` over two result-set
    subqueries (each yielding query/neighbor columns)."""
    return f"""
        WITH e AS (SELECT DISTINCT {query_expr} AS q, {id_expr} AS n
                   FROM ({exact_sql})),
        a AS (SELECT DISTINCT {query_expr} AS q, {id_expr} AS n
              FROM ({approx_sql})),
        h AS (SELECT e.q, count(*) AS n_hits
              FROM e JOIN a ON a.q = e.q AND a.n = e.n GROUP BY e.q),
        b AS (SELECT q, count(*) AS n_true FROM e GROUP BY q)
        SELECT b.q AS {query_expr},
               CAST(b.n_true AS BIGINT) AS n_true,
               CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
               CAST(COALESCE(h.n_hits, 0) * 10000 // b.n_true AS BIGINT)
                 AS recall_bp
        FROM b LEFT JOIN h ON h.q = b.q
    """


def topk_recall_summary_sql(approx_sql: str, exact_sql: str,
                            query_expr: str = "query_id",
                            id_expr: str = "vec_id") -> str:
    """DuckDB mirror of :func:`topk_recall_summary`."""
    per_q = topk_recall_sql(approx_sql, exact_sql, query_expr, id_expr)
    return f"""
        SELECT CAST(count(*) AS BIGINT) AS n_queries,
               CAST(sum(n_true) AS BIGINT) AS n_true,
               CAST(sum(n_hits) AS BIGINT) AS n_hits,
               CAST(sum(n_hits) * 10000 // sum(n_true) AS BIGINT)
                 AS recall_bp,
               CAST(sum(CASE WHEN n_hits = n_true THEN 1 ELSE 0 END)
                 AS BIGINT) AS perfect_queries
        FROM ({per_q})
    """


# ---------------------------------------------------------------------------
# recall-targeted ANN auto-tuning — turns the gated recall@k honesty
# number (topk_recall) into a control knob: "give me ≥ X recall on this
# sampled query set and tell me what it costs"


def tune_lsh_recall(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    target_recall_bp: int = 9000,
    num_tables_grid: tuple[int, ...] = (2, 4, 8, 16),
    multiprobe_grid: tuple[int, ...] = (0, 1, 2),
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    round_digits: int | None = None,
) -> tuple[dict | None, list[dict]]:
    """Pick the CHEAPEST (num_tables, multiprobe) that reaches
    ``target_recall_bp`` recall@k on a SAMPLED query set, measured
    against brute-force ground truth. Returns ``(best, trace)``:
    ``best`` is the winning config dict (with its measured
    ``recall_bp`` and a ``cost_units`` proxy = probes per query =
    num_tables·(1+multiprobe), the quantity LSH latency scales with)
    or None if no grid point reaches the target; ``trace`` records
    every configuration evaluated, in escalation order — the measured
    recall/cost curve, ready for a tuning report.

    This is a DRIVER-SIDE TUNING LOOP, not a data-path operator: the
    query set is the caller's (small, broadcastable) recall sample, the
    brute ground truth is computed ONCE and persisted, and each grid
    point costs one bucketed LSH search + one result-set-bounded recall
    join. Configs are tried cheapest-first so the loop exits on the
    first (= cheapest) config meeting the target.
    """
    kw = dict(id_col=id_col, vec_col=vec_col, query_id_col=query_id_col,
              query_vec_col=query_vec_col)
    exact = brute_force_topk(vectors, queries, k=k, **kw).persist()
    exact.count()
    configs = sorted(
        ((t, m) for t in num_tables_grid for m in multiprobe_grid),
        key=lambda tm: (tm[0] * (1 + tm[1]), tm[0]))
    trace: list[dict] = []
    best: dict | None = None
    try:
        for t, m in configs:
            approx = lsh_topk(vectors, queries, dim=dim, k=k,
                              num_tables=t, bits=bits, multiprobe=m,
                              round_digits=round_digits, **kw)
            row = topk_recall_summary(
                approx, exact, query_col=query_id_col,
                id_col=id_col).collect()[0]
            rec = {"num_tables": t, "multiprobe": m, "bits": bits,
                   "recall_bp": int(row.recall_bp),
                   "cost_units": t * (1 + m)}
            trace.append(rec)
            if row.recall_bp >= target_recall_bp:
                best = rec
                break
    finally:
        exact.unpersist()
    return best, trace


def tune_ivf_recall(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    target_recall_bp: int = 9000,
    nprobe_grid: tuple[int, ...] = (1, 2, 4, 8),
    n_centroids: int = 16,
    centroids: list | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> tuple[dict | None, list[dict]]:
    """IVF twin of :func:`tune_lsh_recall`: walk ``nprobe`` upward
    (cheapest first) until the sampled recall@k reaches the target.
    ``cost_units`` is the expected corpus share scanned per query in
    basis points (= nprobe·10000 / n_centroids under balanced lists —
    the quantity IVF latency scales with). Same driver-side tuning
    contract: sampled queries, ground truth computed once."""
    kw = dict(id_col=id_col, vec_col=vec_col, query_id_col=query_id_col,
              query_vec_col=query_vec_col)
    exact = brute_force_topk(vectors, queries, k=k, **kw).persist()
    exact.count()
    trace: list[dict] = []
    best: dict | None = None
    try:
        for nprobe in sorted(set(nprobe_grid)):
            approx = ivf_topk(vectors, queries, k=k,
                              n_centroids=n_centroids, nprobe=nprobe,
                              centroids=centroids, **kw)
            row = topk_recall_summary(
                approx, exact, query_col=query_id_col,
                id_col=id_col).collect()[0]
            rec = {"nprobe": nprobe, "n_centroids": n_centroids,
                   "recall_bp": int(row.recall_bp),
                   "cost_units": nprobe * 10000 // n_centroids}
            trace.append(rec)
            if row.recall_bp >= target_recall_bp:
                best = rec
                break
    finally:
        exact.unpersist()
    return best, trace


# ---------------------------------------------------------------------------
# distributed k-means training — full-corpus Lloyd iterations


def kmeans_update_stats(
    vectors: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """ONE distributed Lloyd-update statistics pass over the FULL
    corpus: map-side assignment against literal centroids (the
    :func:`cluster_assign` affinity — 6dp-rounded cosine, ties to the
    lower cid), then ONE ``groupBy(cid)`` carrying d per-component
    integer micro-unit sums (map-side combined, k rows out). This is
    the distributed sibling of :func:`train_centroids`'s bounded-sample
    driver loop: when the sample is not representative (heavy-tailed
    corpora, rare-language clusters), each full-corpus iteration costs
    one scan plus a k-row shuffle — nothing corpus-sized ever moves.

    Integer discipline: component sums are Σ floor(x·scale) — exact
    int64 (overflow bound: rows · |x|·scale < 2⁶³, i.e. > 9·10¹² rows
    at |x| ≤ 1), so the stats row value-hashes across engines; the
    float mean/renormalize happens on the DRIVER in
    :func:`kmeans_iterate` (the fit_pca eigensolve pattern). Vectors
    should be pre-cast to double (as every operator here expects).

    Output: cid, n_members, comp_sums (array<long>, length d).
    Clusters with no members are absent (the caller keeps the previous
    centroid — standard Lloyd empty-cluster handling).
    """
    dim = len(centroids[0][1])
    best = f"array_max({_affinity_array_sql(centroids, vec_col, '_vn')})"
    assigned = (vectors.withColumn("_vn", F.expr(_sql_norm(vec_col)))
                .select(F.expr(f"-({best}.ncid)").cast("long")
                        .alias("cid"),
                        F.col(vec_col).alias("_v")))
    sums = [
        F.sum(F.floor(F.element_at("_v", i + 1) * scale)).cast("long")
        .alias(f"_s{i}")
        for i in range(dim)
    ]
    agg = assigned.groupBy("cid").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"), *sums)
    return agg.select(
        "cid", "n_members",
        F.array(*[F.col(f"_s{i}") for i in range(dim)])
        .alias("comp_sums"))


def kmeans_iterate(
    vectors: DataFrame,
    centroids: list[tuple[int, list[float]]],
    iters: int = 1,
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> list[tuple[int, list[float]]]:
    """Full-corpus spherical Lloyd iterations: per iteration, one
    :func:`kmeans_update_stats` pass (map-side assignment + k-row
    aggregate) and a driver-side mean/renormalize over the k×d integer
    sums. Empty clusters keep their previous centroid. Returns the
    (cid, vector) list :func:`ivf_topk` / :func:`cluster_assign`
    accept as plan literals."""
    import math

    for _ in range(iters):
        rows = {r.cid: r for r in kmeans_update_stats(
            vectors, centroids, vec_col, scale).collect()}
        nxt = []
        for cid, old in centroids:
            r = rows.get(cid)
            if r is None or r.n_members == 0:
                nxt.append((cid, list(old)))
                continue
            m = [s / r.n_members / scale for s in r.comp_sums]
            nm = math.sqrt(sum(x * x for x in m))
            nxt.append((cid, [x / nm for x in m]) if nm > 0
                       else (cid, list(old)))
        centroids = nxt
    return centroids


def kmeans_update_stats_sql(
    from_sql: str,
    centroids: list[tuple[int, list[float]]],
    vec_expr: str = "embedding",
    id_expr: str = "vec_id",
    scale: int = 1_000_000,
    digest: bool = True,
) -> str:
    """DuckDB mirror of :func:`kmeans_update_stats` (same 6dp-rounded
    affinity assignment / low-cid ties as the cluster oracle, same
    floor(x·scale) integer sums). With ``digest`` the comp_sums array
    is emitted as one md5 of the comma-joined values — the scalar the
    value-hash comparator wants."""
    import math

    dim = len(centroids[0][1])
    affin = []
    for cid, cvec in centroids:
        cnorm = math.sqrt(sum(x * x for x in cvec))
        arr = "[" + ", ".join(repr(float(v)) for v in cvec) + "]"
        affin.append(
            f"SELECT {cid} AS cid, {arr}::DOUBLE[] AS cvec,"
            f" {cnorm!r} AS cnorm")
    cents = " UNION ALL ".join(affin)
    sums = ", ".join(
        f"CAST(sum(CAST(floor(emb[{i + 1}] * {scale}) AS BIGINT))"
        f" AS BIGINT) AS s{i}"
        for i in range(dim))
    # concat_ws (one flat call), NOT chained || — d nested binary
    # concats exceed DuckDB's 128-deep binder recursion limit at d=64
    out_sums = ("md5(concat_ws(','," + ", ".join(
        f"CAST(s{i} AS VARCHAR)" for i in range(dim))
        + ")) AS sums_digest" if digest else ", ".join(
            f"s{i}" for i in range(dim)))
    return f"""
        WITH v AS (SELECT {id_expr} AS rid, {vec_expr} AS emb
                   FROM {from_sql}),
        c AS ({cents}),
        assign AS (
          SELECT emb, cid FROM (
            SELECT v.rid, v.emb, c.cid,
                   row_number() OVER (
                     PARTITION BY v.rid
                     ORDER BY round(list_dot_product(v.emb, c.cvec)
                              / (sqrt(list_dot_product(v.emb, v.emb))
                                 * c.cnorm), 6) DESC,
                              c.cid ASC) AS r
            FROM v, c)
          WHERE r = 1),
        g AS (
          SELECT cid, CAST(count(*) AS BIGINT) AS n_members, {sums}
          FROM assign GROUP BY cid)
        SELECT cid, n_members, {out_sums} FROM g
    """
