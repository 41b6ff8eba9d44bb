"""Data-layout operators — Z-order clustering for scan locality and
deterministic exact-k sampling.

**Z-order** (Morton order) is the standard multi-dimensional clustering
a 100 TB lakehouse applies before writing (Delta/Iceberg ``ZORDER BY``):
rows close in EVERY clustered dimension land in the same files, so
min/max file statistics prune scans on ANY of the dimensions, not just
the first sort key. The key is pure integer bit-interleaving — native
Spark expressions (shift/and/or), zero Python, fully codegen'd — and
the clustering itself is one ``repartitionByRange(zkey)`` +
``sortWithinPartitions``: exactly one shuffle, the same cost as a plain
sort-by-one-column write.

**sample_exact_k** is uniform sampling without replacement with an
EXACT output size: rank rows by a seeded md5 of their id and take the
first k via ``orderBy().limit(k)`` — TakeOrderedAndProject, i.e.
per-partition top-k then a k-row merge, never a full sort in one
partition (``df.sample()`` gives a BERNOULLI sample whose size is only
approximately n·fraction; training-data recipes usually need exactly-k
per bucket).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# spread-bits magic masks: interleave zeros between the low 16 bits
# (the classic Morton-code construction, e.g. Graphics Gems / HAKMEM)
_SPREAD = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread16(x: Column) -> Column:
    """low 16 bits of x → 32-bit value with a zero between every bit."""
    x = x.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def zorder_key(a: Column, b: Column) -> Column:
    """Morton key of two 16-bit integer columns (bit-interleaved, a in
    the even positions). Inputs must already be in [0, 65536) — use
    :func:`zorder_by` for min/max normalization from raw columns."""
    return _spread16(a).bitwiseOR(F.shiftleft(_spread16(b), 1))


def zorder_by(
    df: DataFrame,
    cols: tuple[str, str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Cluster ``df`` by the Z-order of two numeric columns: one
    bounded min/max aggregate (driver gets 4 numbers), a map-side
    normalization of each column into [0, 65536), then ONE range
    shuffle on the interleaved key + an in-partition sort. Written out,
    each file covers a small rectangle in (a, b) space, so min/max
    stats prune scans filtered on EITHER column."""
    ca, cb = cols
    mm = df.agg(
        F.min(ca).alias("amin"), F.max(ca).alias("amax"),
        F.min(cb).alias("bmin"), F.max(cb).alias("bmax"),
    ).collect()[0]

    def norm(c: str, lo, hi) -> Column:
        span = max(int(hi) - int(lo), 1)
        return ((F.col(c).cast("long") - F.lit(int(lo)))
                * F.lit(65535) / F.lit(span)).cast("long")

    keyed = df.withColumn(
        "_zkey", zorder_key(norm(ca, mm.amin, mm.amax),
                            norm(cb, mm.bmin, mm.bmax)))
    parts = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions")
    return (keyed.repartitionByRange(int(parts), "_zkey")
            .sortWithinPartitions("_zkey")
            .drop("_zkey"))


def sample_exact_k(
    df: DataFrame,
    k: int,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """EXACTLY min(k, n) rows, uniform without replacement,
    deterministic under retries/repartitioning: rank = md5(seed:id),
    take the k smallest. Distributed top-k (TakeOrderedAndProject),
    never a single-partition sort."""
    rank = F.md5(F.concat(F.lit(f"{seed}:"),
                          F.col(id_col).cast("string")))
    return (df.withColumn("_rk", rank)
            .orderBy(F.col("_rk").asc(), F.col(id_col).asc())
            .limit(k)
            .drop("_rk"))


def weighted_sample_k(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: int = 42,
    max_weight: int = 64,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES,
    2006) with INTEGER-EXACT keys: the A-ES key u^(1/w) for an integer
    weight w has exactly the distribution of the MAX of w i.i.d.
    uniforms, so each row's rank key is max_{j=1..w} md5(seed:id:j) —
    no float ln/pow anywhere, which keeps the selection bit-reproducible
    across engines (this repo's rule for hash-gated outputs: DSIR's
    integer micro-nats, PageRank's fixed-point iteration). Take the k
    LARGEST keys via ``orderBy().limit(k)`` — TakeOrderedAndProject,
    per-partition top-k then a k-row merge, never a single-partition
    sort (the dsir.py r9 lesson).

    Per-row cost is O(w); weights are clamped to [1, ``max_weight``] —
    rescale wide-range weights into that band first (selection
    probabilities only depend on weight RATIOS, so a common rescale
    preserves the design).
    """
    w = F.greatest(
        F.least(F.col(weight_col).cast("int"), F.lit(max_weight)),
        F.lit(1))
    key = F.array_max(F.transform(
        F.sequence(F.lit(1), w),
        lambda j: F.md5(F.concat_ws(
            ":", F.lit(str(seed)), F.col(id_col).cast("string"),
            j.cast("string"))),
    ))
    return (df.withColumn("_wk", key)
            .orderBy(F.col("_wk").desc(), F.col(id_col).asc())
            .limit(k)
            .drop("_wk"))


def weighted_sample_k_sql(
    from_sql: str,
    k: int,
    weight_expr: str,
    id_expr: str = "doc_id",
    seed: int = 42,
    max_weight: int = 64,
) -> str:
    """DuckDB mirror of :func:`weighted_sample_k` (same md5 key stream,
    same clamp, same DESC-key/ASC-id tie-break)."""
    return f"""
        WITH w AS (
          SELECT {id_expr} AS doc_id,
                 greatest(least(CAST({weight_expr} AS INT),
                                {max_weight}), 1) AS weight
          FROM {from_sql}
        ),
        keyed AS (
          SELECT doc_id, weight,
                 list_aggregate(list_transform(
                     generate_series(1, weight),
                     j -> md5('{seed}:' || doc_id || ':' || j)),
                   'max') AS wk
          FROM w
        )
        SELECT doc_id, CAST(weight AS BIGINT) AS weight
        FROM keyed ORDER BY wk DESC, doc_id LIMIT {k}
    """


def sample_exact_k_per_group(
    df: DataFrame,
    k: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """:func:`sample_exact_k` per stratum: exactly min(k, |group|) rows
    from EVERY group, one partitioned window (the per-group rank sorts
    only each group's rows — scale-safe, unlike a global sort).
    Training-data recipes use this for per-domain caps ("keep at most
    k docs per registrable domain")."""
    from pyspark.sql import Window

    rank = F.md5(F.concat(F.lit(f"{seed}:"),
                          F.col(id_col).cast("string")))
    w = (Window.partitionBy(group_col)
         .orderBy(rank.asc(), F.col(id_col).asc()))
    return (df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= k)
            .drop("_rn"))


def repartition_for_bytes(
    df: DataFrame,
    target_bytes: int,
    size_expr: Column | str | None = None,
) -> DataFrame:
    """Repartition so each output file lands near ``target_bytes`` —
    the knob behind "write ~512 MB parquet shards", which downstream
    scan parallelism and object-store request counts both care about.

    One bounded aggregate estimates total payload bytes (default: sum
    of the lengths of all string/binary columns — the columns that
    dominate a document corpus), then a single round-robin
    ``repartition(ceil(total/target))``. An explicit ``size_expr``
    (e.g. ``F.length("text") + F.length("media")``) overrides the
    default estimate. Parquet encoding/compression shrinks the actual
    files below the raw estimate — pick ``target_bytes`` as the RAW
    payload budget per shard.
    """
    if size_expr is None:
        cols = [f.name for f in df.schema.fields
                if f.dataType.simpleString() in ("string", "binary")]
        if not cols:
            size_expr = F.lit(64)   # narrow numeric rows: ~64 B flat
        else:
            size_expr = sum((F.coalesce(F.length(c), F.lit(0))
                             for c in cols), F.lit(0))
    elif isinstance(size_expr, str):
        size_expr = F.col(size_expr)
    total = df.agg(F.sum(size_expr.cast("long")).alias("b")) \
        .collect()[0].b or 0
    n = max(1, -(-total // max(target_bytes, 1)))
    return df.repartition(int(n))


# ---------------------------------------------------------------------------
# key-skew diagnostics — the pre-flight check before any big keyed shuffle


def key_skew_topn(
    df: DataFrame,
    key_cols: list[str] | str,
    top_n: int = 20,
) -> DataFrame:
    """Exact heaviest keys of a prospective join/groupBy key, with
    corpus share — the diagnostic a 100 TB pipeline runs BEFORE a big
    keyed shuffle to decide whether it needs salting or an AQE skew
    hint (a single key holding >1% of a 100 TB table is a straggler
    task measured in hours). Complements the streaming heavy-hitters
    sketch (sketches.py) with the exact batch answer.

    Output: key columns + ``cnt``, ``share_bp`` (key's share of all
    rows, integer basis points), ``total_rows``, ``n_keys`` (distinct
    key count — share context rides along so the result is
    self-contained), ordered heaviest-first, ties broken by key value
    so the result is deterministic.

    Scale shape: ONE map-side-combined groupBy over the key (the same
    shuffle the diagnosed operation would pay, once, at count width),
    a 2-value rollup of that key table broadcast back, and a
    distributed top-n (``orderBy().limit`` = per-partition top-n +
    n-row merge — never a single-reducer sort).
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("total_rows"),
        F.count(F.lit(1)).alias("n_keys"))
    out = counts.join(F.broadcast(totals))
    out = out.select(
        *keys,
        F.col("cnt").cast("long").alias("cnt"),
        F.expr("cnt * 10000 div total_rows").cast("long")
        .alias("share_bp"),
        F.col("total_rows").cast("long").alias("total_rows"),
        F.col("n_keys").cast("long").alias("n_keys"),
    )
    # asc_nulls_last: Spark's bare asc is NULLS FIRST, DuckDB's ASC is
    # NULLS LAST — a NULL key (common among hot join keys) tied at the
    # top_n boundary would otherwise select different rows per engine
    order = [F.col("cnt").desc()] + [F.col(c).asc_nulls_last()
                                     for c in keys]
    return out.orderBy(*order).limit(top_n)


def key_skew_topn_sql(
    from_sql: str,
    key_exprs: list[str] | str,
    top_n: int = 20,
) -> str:
    """DuckDB mirror of :func:`key_skew_topn` (same integer share,
    same count-desc-then-key order)."""
    keys = [key_exprs] if isinstance(key_exprs, str) else list(key_exprs)
    klist = ", ".join(keys)
    korder = ", ".join(f"{k} ASC NULLS LAST" for k in keys)
    return f"""
        WITH c AS (
          SELECT {klist}, count(*) AS cnt FROM {from_sql}
          GROUP BY {klist}
        ),
        t AS (SELECT sum(cnt) AS total_rows, count(*) AS n_keys FROM c)
        SELECT {klist},
               CAST(cnt AS BIGINT) AS cnt,
               CAST(cnt * 10000 // total_rows AS BIGINT) AS share_bp,
               CAST(total_rows AS BIGINT) AS total_rows,
               CAST(n_keys AS BIGINT) AS n_keys
        FROM c, t
        ORDER BY cnt DESC, {korder}
        LIMIT {top_n}
    """


# ---------------------------------------------------------------------------
# sharded export — the last-mile step: deterministic shard assignment,
# per-shard content manifests, and the physical one-file-per-shard write


def shard_assign(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic shard id per row: the 60-bit md5 of ``seed:id``
    mod ``n_shards`` — a pure function of (id, seed), so assignment is
    retry/partitioning-invariant, any engine can recompute which shard
    holds a row, and re-exporting an unchanged corpus reproduces
    byte-identical shard membership. (The md5 family, not xxhash64:
    shard membership is a PUBLISHED contract a reader may need to
    replay off-Spark — the same portability rule the minhash oracle
    family follows.) Appends ``shard_id``."""
    if n_shards < 1:
        raise ValueError("shard_assign: n_shards must be >= 1")
    h = F.conv(F.substring(
        F.md5(F.concat(F.lit(f"{seed}:"),
                       F.col(id_col).cast("string"))), 1, 15),
        16, 10).cast("long")
    return df.withColumn("shard_id",
                         F.pmod(h, F.lit(n_shards)).cast("long"))


def shard_manifest(
    assigned: DataFrame,
    cols: list[str],
) -> DataFrame:
    """Per-shard content commitment: one row per shard_id with n_rows,
    content_xor (order-independent 60-bit-md5 XOR fold), bytes_total —
    :func:`enrich_spark.plans.manifest.dataset_manifest` grouped by
    the shard key. Verifying an export = recomputing this from the
    written files and comparing; smaller XOR domains per shard also
    tighten the manifest's documented pair-cancellation caveat."""
    from ..plans.manifest import dataset_manifest

    return dataset_manifest(assigned, cols=cols,
                            group_cols=["shard_id"], hash="md5")


def write_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    order_col: str | None = None,
    seed: int = 0,
) -> DataFrame:
    """Physically export ``df`` as ``shard_id=K/`` parquet directories
    with exactly ONE part-file per shard: md5 shard assignment →
    ``repartition(n, shard_id)`` (each shard's rows land in exactly
    one task — several shards may share a task, but a shard never
    splits) → ``sortWithinPartitions`` on (shard_id, order_col or id)
    for stable intra-shard order → ``write.partitionBy(shard_id)``
    (one file per shard per task = one file per shard). Returns the
    per-shard manifest frame (computed from the INPUT; re-read the
    written files and recompute to verify the export). Scale shape:
    one exchange + local sort — embarrassingly parallel at any corpus
    size; pick n_shards so each shard lands near the target file size
    (:func:`repartition_for_bytes` estimates row bytes)."""
    assigned = shard_assign(df, n_shards, id_col=id_col, seed=seed)
    order = [F.col("shard_id"), F.col(order_col or id_col)]
    (assigned.repartition(n_shards, F.col("shard_id"))
     .sortWithinPartitions(*order)
     .write.partitionBy("shard_id").mode("overwrite").parquet(path))
    return shard_manifest(assigned,
                          cols=[c for c in df.columns])


def shard_diff(old_manifest: DataFrame,
               new_manifest: DataFrame) -> DataFrame:
    """The incremental-export planner: given two :func:`shard_manifest`
    frames (same n_shards/seed/cols), report per shard whether its
    content moved — re-export ONLY the non-'same' shards instead of
    the whole corpus. Output per shard_id: ``status`` ('same' when
    rows+xor+bytes all match, else 'changed' / 'added' / 'removed')
    and ``rows_delta``. One tiny (≤ n_shards rows per side) outer
    join; pairs with CDC snapshots the way snapshot_diff pairs with
    row-level audits."""
    def pre(df, tag):
        return df.select(
            "shard_id",
            F.col("n_rows").alias(f"{tag}_rows"),
            F.col("content_xor").alias(f"{tag}_xor"),
            F.col("bytes_total").alias(f"{tag}_bytes"))

    j = pre(old_manifest, "o").join(pre(new_manifest, "n"),
                                    "shard_id", "outer")
    same = ((F.col("o_rows") == F.col("n_rows"))
            & (F.col("o_xor") == F.col("n_xor"))
            & (F.col("o_bytes") == F.col("n_bytes")))
    status = (F.when(F.col("o_rows").isNull(), F.lit("added"))
              .when(F.col("n_rows").isNull(), F.lit("removed"))
              .when(same, F.lit("same"))
              .otherwise(F.lit("changed")))
    return j.select(
        "shard_id", status.alias("status"),
        (F.coalesce("n_rows", F.lit(0)) - F.coalesce("o_rows", F.lit(0)))
        .cast("long").alias("rows_delta"))
