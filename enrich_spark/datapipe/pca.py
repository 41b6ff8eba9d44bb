"""One-pass distributed PCA / whitening for embedding columns.

Beyond-reference: the standard preprocessing in a large-scale
embedding pipeline — dimensionality reduction before ANN indexing and
SemDeDup (Jégou et al. 2011 apply a PCA rotation before PQ; OPQ is a
PCA-family rotation), decorrelation ("whitening") before cosine
thresholds, and compaction of storage (a 64-d float corpus projected
to 16 d is a 4× scan saving for every downstream similarity job).

Architecture (the one-pass pattern of regress.py, scaled to matrices):

1. ``pca_gram`` — ONE Arrow-batched pass over the corpus accumulates
   the integer Gram matrix of milli-unit-quantized components
   (``q = floor(x · scale)``): each executor batch contributes
   ``qᵀq`` (numpy int64 matmul), partials collapse per partition and
   then through one tiny groupBy over at most d·(d+1)/2 + d + 1 keys.
   Integer sums are EXACT — no float association drift across
   partitionings — which is what makes the gate row possible: DuckDB
   replays the same quantization and the same sums bit-for-bit.
2. ``fit_pca`` — the d×d covariance is assembled on the DRIVER from
   those bounded sums ((d²+3d)/2 + 1 values — KBs, corpus-size-
   independent) and eigendecomposed with numpy (symmetric ``eigh``).
   Component signs are canonicalized (largest-|coefficient| entry
   positive) so the model is a pure function of the corpus.
3. ``pca_project`` — application is NATIVE column algebra: each output
   coordinate is one ``zip_with``/``aggregate`` fold against the
   component vector inlined as a literal array, minus a precomputed
   scalar offset (the mean's projection). Zero Python, zero shuffle:
   training cost is one scan, application rides any existing scan for
   free (the score_linear_model contract, lifted to matrices).

Scale shape at 100 TB: the only corpus-sized work is two map-side
passes (gram + project); driver state is O(d²) regardless of rows.
Overflow bound: with |x|·scale ≤ B per component, a single int64
partial holds up to rows_per_partition · B²; at B = 2¹⁵ (≈ |x| ≤ 32
at scale 1000) that allows > 8·10⁹ rows per partition — far beyond
any sane partition size; the final groupBy sums are exact as long as
the corpus-wide sum stays under 2⁶³ (≈ 9·10¹² rows at B = 2¹⁵).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["pca_gram", "pca_gram_sql", "fit_pca", "pca_project",
           "PcaModel"]


def pca_gram(
    vecs: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """Integer second-moment statistics of a vector column, one pass.

    Output rows (i INT, j INT, v LONG):
      - (i, j, Σ q_i·q_j) for 0 ≤ i ≤ j < dim   (upper-triangle Gram)
      - (i, -1, Σ q_i)    for 0 ≤ i < dim        (component sums)
      - (-1, -1, n)                               (row count)
    where q = floor(x·scale) per component (cast to double first, so
    float32 inputs quantize identically in any engine).

    Plan: mapInPandas computes a per-Arrow-batch ``qᵀq`` (one numpy
    int64 matmul — the vectorized fast path, no per-row Python) and
    emits ONE partial triangle per batch; the groupBy that follows
    sums at most d·(d+1)/2 + d + 1 keys — a shuffle of kilobytes
    regardless of corpus size. NULL vectors and wrong-length vectors
    are rejected (a silent skip would desync the count row).
    """
    import numpy as np
    import pandas as pd

    d = int(dim)
    iu = np.triu_indices(d)

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gram = np.zeros((d, d), dtype=np.int64)
        sums = np.zeros(d, dtype=np.int64)
        n = 0
        for pdf in batches:
            if len(pdf) == 0:
                # a zero-row Arrow batch inside a non-empty partition is
                # legal; np.stack([]) below would raise on it
                continue
            col = pdf[vec_col]
            if col.isna().any():
                raise ValueError("pca_gram: NULL vector encountered")
            x = np.stack([np.asarray(v, dtype=np.float64) for v in col])
            if x.shape[1] != d:
                raise ValueError(
                    f"pca_gram: vector length {x.shape[1]} != dim {d}")
            # element-level check: a NULL inside a vector arrives as
            # NaN, and floor(nan).astype(int64) silently produces
            # INT64_MIN — corrupted sums, not an error
            if np.isnan(x).any():
                raise ValueError(
                    "pca_gram: NULL/NaN vector element encountered")
            q = np.floor(x * scale).astype(np.int64)
            gram += q.T @ q
            sums += q.sum(axis=0)
            n += q.shape[0]
        if n == 0:
            return
        yield pd.DataFrame({
            "i": np.concatenate([iu[0], np.arange(d), [-1]]).astype("int32"),
            "j": np.concatenate([iu[1], np.full(d, -1), [-1]]).astype("int32"),
            "v": np.concatenate([gram[iu], sums, [n]]).astype("int64"),
        })

    sel = vecs.select(F.transform(F.col(vec_col),
                                  lambda x: x.cast("double")).alias(vec_col))
    parts = sel.mapInPandas(part, schema="i int, j int, v long")
    # one literal (-1,-1,0) seed row unioned BEFORE the groupBy: the
    # count key then exists even on an empty corpus (the batch fn
    # yields nothing when n == 0), matching pca_gram_sql's UNION ALL
    # count branch which always returns one (-1,-1,0) row there. On a
    # non-empty corpus it sums n + 0 = n — a no-op.
    seed = vecs.sparkSession.range(1).select(
        F.lit(-1).cast("int").alias("i"),
        F.lit(-1).cast("int").alias("j"),
        F.lit(0).cast("long").alias("v"))
    return parts.unionByName(seed).groupBy("i", "j").agg(
        F.sum("v").alias("v"))


def pca_gram_sql(
    from_sql: str,
    dim: int,
    vec_expr: str = "embedding",
    scale: int = 1000,
) -> str:
    """DuckDB mirror of :func:`pca_gram` — same floor(x·scale)
    quantization (float→double cast first), same exact integer sums.
    The (i, j) pair products are expanded per ROW with two lateral
    position ranges — no synthetic row id anywhere (a row_number()
    OVER () self-join key is only deterministic while the engine
    preserves scan order; per-row expansion needs no such
    assumption)."""
    return f"""
        WITH q AS (
          SELECT list_transform({vec_expr},
                   x -> CAST(floor(CAST(x AS DOUBLE) * {scale}) AS BIGINT))
                 AS qv
          FROM {from_sql}
        )
        SELECT CAST(ti.i AS INT) AS i, CAST(tj.j AS INT) AS j,
               CAST(sum(qv[ti.i + 1] * qv[tj.j + 1]) AS BIGINT) AS v
        FROM q,
             (SELECT unnest(range({dim})) AS i) ti,
             (SELECT unnest(range({dim})) AS j) tj
        WHERE ti.i <= tj.j
        GROUP BY ti.i, tj.j
        UNION ALL
        SELECT CAST(t.i AS INT), CAST(-1 AS INT),
               CAST(sum(qv[t.i + 1]) AS BIGINT)
        FROM q, (SELECT unnest(range({dim})) AS i) t
        GROUP BY t.i
        UNION ALL
        SELECT CAST(-1 AS INT), CAST(-1 AS INT),
               CAST(count(*) AS BIGINT)
        FROM q
    """


@dataclass
class PcaModel:
    """Driver-side PCA fit: per-component mean (original units), the
    top-k eigenvectors (rows, unit-norm, sign-canonicalized) and their
    eigenvalues (variance explained, original units²)."""
    mean: list[float]
    components: list[list[float]]   # k × d
    eigenvalues: list[float]        # k, descending
    scale: int
    n: int

    @property
    def k(self) -> int:
        return len(self.components)

    @property
    def dim(self) -> int:
        return len(self.mean)


def fit_pca(
    vecs: DataFrame,
    dim: int,
    k: int,
    vec_col: str = "embedding",
    scale: int = 1000,
) -> PcaModel:
    """Fit PCA in ONE corpus pass: :func:`pca_gram` statistics to the
    driver (O(d²) values), covariance assembly + symmetric
    eigendecomposition locally. Eigenvector signs are canonicalized
    (entry of largest magnitude made positive, first index winning
    ties) so the model — and everything projected with it — is a pure
    function of the corpus, independent of LAPACK's sign freedom."""
    import numpy as np

    rows = pca_gram(vecs, dim=dim, vec_col=vec_col, scale=scale).collect()
    d = int(dim)
    gram = np.zeros((d, d), dtype=np.float64)
    sums = np.zeros(d, dtype=np.float64)
    n = 0
    for r in rows:
        if r.i == -1:
            n = int(r.v)
        elif r.j == -1:
            sums[r.i] = float(r.v)
        else:
            gram[r.i, r.j] = float(r.v)
            gram[r.j, r.i] = float(r.v)
    if n == 0:
        raise ValueError("fit_pca: empty input")
    if not (0 < k <= d):
        raise ValueError(f"fit_pca: k={k} must be in 1..{d}")
    s2 = float(scale) * float(scale)
    mean_q = sums / n                      # quantized units
    cov = gram / (n * s2) - np.outer(mean_q, mean_q) / s2
    evals, evecs = np.linalg.eigh(cov)     # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = []
    eig = []
    for idx in order:
        v = evecs[:, idx]
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        comps.append([float(x) for x in v])
        eig.append(float(max(evals[idx], 0.0)))
    return PcaModel(mean=[float(x) for x in mean_q / scale],
                    components=comps, eigenvalues=eig,
                    scale=scale, n=n)


def pca_project(
    vecs: DataFrame,
    model: PcaModel,
    vec_col: str = "embedding",
    out_col: str = "pca",
    whiten: bool = False,
    eps: float = 1e-9,
) -> DataFrame:
    """Project the vector column onto the fitted components — NATIVE
    column algebra only: output coordinate j is a ``zip_with`` product
    fold against component j inlined as a literal array, minus the
    precomputed scalar mean offset. With ``whiten`` each coordinate is
    divided by √eigenvalue (unit variance out — the decorrelation step
    cosine-threshold pipelines want). Appends ``out_col``
    (array<double>, length k); all other columns pass through.

    Scale shape: a pure projection — no shuffle, no Python, k·d
    multiply-adds per row inside whole-stage codegen. The whole
    projection compiles as ONE ``expr()`` string (r12): k·d literals
    as ``F.lit`` py4j Columns cost 1,000+ gateway round-trips per plan
    build at d=64, k=16 — the exact driver-bound pattern SCALE.md §7
    measured at ~4 s for IVF and replaced with an array-literal SQL
    string that parses JVM-side in milliseconds
    (``_affinity_array_sql``'s rationale; ``{v!r}D`` round-trips every
    double exactly, so the plan is bit-identical to the old form).
    """
    import math

    def d(v: float) -> str:
        return f"{float(v)!r}D"

    dbl = f"transform({vec_col}, x -> CAST(x AS DOUBLE))"
    coords = []
    for j, comp in enumerate(model.components):
        arr = "array(" + ", ".join(d(w) for w in comp) + ")"
        offset = sum(m * w for m, w in zip(model.mean, comp))
        c = (f"(aggregate(zip_with({dbl}, {arr}, (x, w) -> x * w), "
             f"0.0D, (acc, x) -> acc + x) - {d(offset)})")
        if whiten:
            c = f"({c} / {d(math.sqrt(model.eigenvalues[j] + eps))})"
        coords.append(c)
    return vecs.withColumn(
        out_col, F.expr("array(" + ", ".join(coords) + ")"))
