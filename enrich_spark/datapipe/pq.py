"""Product quantization (PQ) for embedding compression + ADC top-k
(Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
Search", TPAMI 2011).

Beyond-reference similarity-search scale path. A 64-dim float vector
(256 bytes) compresses to m=8 4-bit-ish codes (8 bytes here, one small
int per subspace): split the vector into m subspaces, k-means each
subspace, store only the per-subspace centroid ids. Queries score
against codes with an Asymmetric Distance Computation (ADC) lookup
table — m·k distances computed ONCE per query, then each corpus vector
costs m table lookups instead of a full d-dim dot product.

Engine-exact by construction: embeddings are quantized to fixed-point
integers (×10⁴) in-plan, centroids are integer literals trained
driver-side on a bounded sample, and every distance is an integer sum
of squares — so code assignment, LUTs, ADC scores and rank order are
bit-identical in Spark and the DuckDB oracle (ties broken by lowest
centroid id / vec id, the array_position == list_position contract).

100 TB shape:
- train: one bounded sample collect (like IVF's train_centroids); the
  model is m·k·dsub integers — a plan literal.
- assign (apply_pq): map-side only, zero shuffle, zero Python; at
  serving time the corpus is stored as codes (32× smaller scan).
- adc_topk: queries broadcast WITH their precomputed LUT arrays; per
  (vector, query) pair the score is m integer array lookups; the only
  shuffle is the per-query top-k window. Compose with IVF bucketing
  (similarity.ivf_topk) for candidate pruning; PQ is the compression
  layer, IVF the pruning layer — together they are FAISS's IVF-PQ.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SCALE = 10_000  # fixed-point: long(round(x * SCALE))


def quantize(vec: Column) -> Column:
    """array<float> → array<long> fixed-point (the in-plan quantizer;
    DuckDB mirror: list_transform(v, x -> CAST(round(x*10000) AS
    BIGINT)))."""
    return F.transform(vec, lambda x: F.round(x * SCALE).cast("long"))


def train_pq(
    vectors: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    sample: int = 10_000,
    iters: int = 10,
    seed: int = 7,
) -> list[list[list[int]]]:
    """Per-subspace k-means over the quantized sample. Returns
    centroids[j][c] = dsub integers — the plan-literal model."""
    import numpy as np

    rows = vectors.select(vec_col).limit(sample).collect()
    X = np.asarray([[round(float(x) * SCALE) for x in r[0]] for r in rows],
                   dtype=np.int64)
    if X.size == 0:
        return []
    dim = X.shape[1]
    assert dim % m == 0, f"dim {dim} not divisible by m={m}"
    dsub = dim // m
    rng = np.random.default_rng(seed)
    model: list[list[list[int]]] = []
    for j in range(m):
        S = X[:, j * dsub:(j + 1) * dsub].astype(np.float64)
        kk = min(k, len(np.unique(S, axis=0)))
        # k-means++ init on the subspace
        C = [S[int(rng.integers(len(S)))]]
        for _ in range(1, kk):
            d2 = np.min(
                ((S[:, None, :] - np.stack(C)[None, :, :]) ** 2).sum(-1),
                axis=1)
            p = d2 / d2.sum() if d2.sum() > 0 else None
            C.append(S[int(rng.choice(len(S), p=p))])
        C = np.stack(C)
        for _ in range(iters):
            assign = ((S[:, None, :] - C[None, :, :]) ** 2).sum(-1).argmin(1)
            for c in range(kk):
                members = S[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        model.append([[int(round(v)) for v in row] for row in C])
    return model


def _cent_lit(cents: list[list[int]]) -> Column:
    return F.array(*[
        F.array(*[F.lit(int(v)).cast("long") for v in c]) for c in cents])


def _sub(qv: Column, j: int, dsub: int) -> Column:
    return F.slice(qv, j * dsub + 1, dsub)


def _sqdist(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"), lambda acc, v: acc + v)


def pq_codes(vec: Column, model: list[list[list[int]]]) -> Column:
    """array<long> of per-subspace centroid ids (argmin sq-distance,
    FIRST minimum on ties — array_position semantics)."""
    dsub = len(model[0][0])
    qv = quantize(vec)
    codes = []
    for j, cents in enumerate(model):
        dists = F.transform(_cent_lit(cents),
                            lambda c: _sqdist(_sub(qv, j, dsub), c))
        codes.append(F.array_position(dists, F.array_min(dists)) - 1)
    return F.array(*codes)


def apply_pq(
    vectors: DataFrame,
    model: list[list[list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (id, codes array<long>) — the compressed corpus. Map-side
    only: no shuffle, no Python."""
    return vectors.select(
        F.col(id_col), pq_codes(F.col(vec_col), model).alias("codes"))


def adc_topk(
    vectors: DataFrame,
    queries: DataFrame,
    model: list[list[list[int]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Asymmetric top-k: corpus as codes, queries exact. The LUT
    (m × k_cent integer distances) is computed once per query inside
    the broadcast side; scoring a vector is m array lookups."""
    dsub = len(model[0][0])
    m = len(model)
    coded = apply_pq(vectors, model, id_col, vec_col)
    qv = quantize(F.col(query_vec_col))
    lut = F.array(*[
        F.transform(_cent_lit(cents),
                    lambda c: _sqdist(_sub(qv, j, dsub), c))
        for j, cents in enumerate(model)
    ])
    qlut = queries.select(F.col(query_id_col), lut.alias("lut"))
    scored = coded.crossJoin(F.broadcast(qlut)).select(
        query_id_col, id_col,
        F.aggregate(
            F.zip_with(F.col("lut"), F.col("codes"),
                       lambda tbl, c: F.element_at(tbl, (c + 1).cast("int"))),
            F.lit(0).cast("long"), lambda acc, v: acc + v,
        ).alias("adc_dist"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("adc_dist").asc(), F.col(id_col).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


# ---------------------------------------------------------------------------
# SQL oracle mirrors (DuckDB)


def _sql_qv(col: str) -> str:
    return (f"list_transform({col}, "
            f"x -> CAST(round(x * {SCALE}) AS BIGINT))")


def _sql_cents(cents: list[list[int]]) -> str:
    return "[" + ", ".join(
        "[" + ", ".join(str(v) for v in c) + "]" for c in cents) + "]"


def _sql_sqdist(sub: str, c: str) -> str:
    return (f"list_sum(list_transform(range(1, len({c}) + 1), "
            f"i -> ({sub}[i] - {c}[i]) * ({sub}[i] - {c}[i])))")


def _sql_codes(model: list[list[list[int]]], qv: str) -> str:
    dsub = len(model[0][0])
    parts = []
    for j, cents in enumerate(model):
        sub = f"{qv}[{j * dsub + 1}:{j * dsub + dsub}]"
        d = (f"list_transform({_sql_cents(cents)}, "
             f"c -> {_sql_sqdist(sub, 'c')})")
        parts.append(f"(list_position({d}, list_min({d})) - 1)")
    return "[" + ", ".join(f"CAST({p} AS BIGINT)" for p in parts) + "]"


def pq_codes_sql(from_sql: str, id_expr: str, vec_expr: str,
                 model: list[list[list[int]]],
                 id_alias: str = "vec_id") -> str:
    qv = _sql_qv(vec_expr)
    return f"""
        SELECT {id_expr} AS {id_alias},
               list_aggregate(list_transform({_sql_codes(model, qv)},
                              c -> CAST(c AS VARCHAR)), 'string_agg', ',')
                   AS codes_str
        FROM {from_sql}
    """


def adc_topk_sql(from_sql: str, id_expr: str, vec_expr: str,
                 query_pred: str, model: list[list[list[int]]],
                 k: int = 10, id_alias: str = "vec_id") -> str:
    dsub = len(model[0][0])
    qv = _sql_qv(vec_expr)
    lut_parts = []
    for j, cents in enumerate(model):
        sub = f"qv[{j * dsub + 1}:{j * dsub + dsub}]"
        lut_parts.append(f"list_transform({_sql_cents(cents)}, "
                         f"c -> {_sql_sqdist(sub, 'c')})")
    m = len(model)
    return f"""
        WITH corpus AS (
            SELECT {id_expr} AS {id_alias},
                   {_sql_codes(model, qv)} AS codes
            FROM {from_sql}
        ),
        q AS (
            SELECT {id_expr} AS query_id,
                   [{", ".join(lut_parts)}] AS lut
            FROM (SELECT {id_expr}, {qv} AS qv FROM {from_sql})
            WHERE {query_pred}
        ),
        scored AS (
            SELECT q.query_id, c.{id_alias},
                   CAST(list_sum(list_transform(range(1, {m} + 1),
                        j -> q.lut[j][c.codes[j] + 1])) AS BIGINT)
                       AS adc_dist
            FROM corpus c CROSS JOIN q
        )
        SELECT query_id, {id_alias}, adc_dist,
               CAST(rank AS BIGINT) AS rank
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id
                ORDER BY adc_dist ASC, {id_alias} ASC) AS rank
            FROM scored
        )
        WHERE rank <= {k}
    """
