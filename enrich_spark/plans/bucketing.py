"""Bucketing and skew mitigation — the 100 TB join/agg toolkit.

Three scale tools the enrichment chain and the datapipe operators
lean on when a broadcast is impossible and a plain shuffle would be
dominated by hot keys:

- **Bucketed tables** (`write_bucketed` / `bucketed_join`): persist
  both sides of a recurring join pre-hashed into the same number of
  buckets on the join key. Spark's scan then reports the hash
  partitioning, and the SortMergeJoin needs NO Exchange on either
  side — the join runs entirely map-side. This is the storage-level
  answer to "this join happens every batch": pay the shuffle once at
  write time, never again. (Reference pipelines pay it per run.)

- **Salted aggregation** (`salted_agg`): two-phase agg for skewed
  group keys. Phase 1 aggregates on (key, salt) — the hot key's rows
  spread over ``salt`` reducers; phase 2 combines the ``salt``
  partials per key. Two balanced shuffles instead of one shuffle with
  a straggler. Only algebraic aggregates (count/sum/min/max) compose
  across phases; the helper exposes exactly those.

- **Salted join** (`salted_join`): replicate the small-but-not-
  broadcastable side ``salt`` times (one copy per salt value) and
  shuffle both sides on (key, salt). The hot key's probe rows split
  across ``salt`` tasks. Result-identical to the plain join
  (inner/left), verified by tests.

AQE's skew-join split (``spark.sql.adaptive.skewJoin.enabled``, on by
default in session.get_spark) handles *sort-merge* skew at runtime;
salting is for the cases AQE can't re-plan: skewed aggregation and
skewed joins that must keep a specific partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "write_bucketed",
    "bucketed_join",
    "salted_agg",
    "salted_join",
    "exchange_count",
]


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    num_buckets: int = 32,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Persist ``df`` hash-bucketed (and sorted) by ``keys``.

    Both sides of a recurring equi-join written with the SAME
    ``num_buckets`` and ``keys`` join with zero Exchange and (when
    ``sort``) zero Sort. At 100 TB this converts the per-run shuffle
    of a fact-fact join into a one-time write cost. ``path`` makes the
    table external (bucketing metadata lives in the catalog either
    way — reading the bare files through ``spark.read`` loses it).
    """
    w = df.write.mode("overwrite").bucketBy(num_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed tables — shuffle-free by construction.

    The plan contract (asserted in tests): zero Exchange nodes. If a
    table was not bucketed on ``on``, Spark silently falls back to a
    shuffle — use :func:`exchange_count` to guard.
    """
    return spark.table(left_table).join(spark.table(right_table), on, how)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange nodes in the executed plan — the
    scale budget a co-located join must keep at zero."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1 for line in plan.splitlines() if "Exchange hashpartitioning" in line
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    sums: list[str] = (),
    counts: bool = True,
    mins: list[str] = (),
    maxs: list[str] = (),
    salt: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    Output columns: ``keys…, n (if counts), sum_<c>, min_<c>,
    max_<c>`` — bit-identical to the single-phase groupBy (algebraic
    aggregates only), but no reducer ever sees more than ~1/salt of a
    hot key's rows. ``salt_on`` picks the column whose hash spreads
    rows (default: a uniform row hash over all of ``df``'s columns).
    """
    salt_col = (
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt))
        if salt_on is None
        else F.pmod(F.xxhash64(F.col(salt_on)), F.lit(salt))
    )
    phase1 = [F.count(F.lit(1)).alias("_n")] if counts else []
    phase1 += [F.sum(c).alias(f"_sum_{c}") for c in sums]
    phase1 += [F.min(c).alias(f"_min_{c}") for c in mins]
    phase1 += [F.max(c).alias(f"_max_{c}") for c in maxs]
    partial = (
        df.withColumn("_salt", salt_col)
        .groupBy(*keys, "_salt")
        .agg(*phase1)
    )
    phase2 = [F.sum("_n").alias("n")] if counts else []
    phase2 += [F.sum(f"_sum_{c}").alias(f"sum_{c}") for c in sums]
    phase2 += [F.min(f"_min_{c}").alias(f"min_{c}") for c in mins]
    phase2 += [F.max(f"_max_{c}").alias(f"max_{c}") for c in maxs]
    return partial.groupBy(*keys).agg(*phase2)


def salted_join(
    skewed: DataFrame,
    dim: DataFrame,
    on: list[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: replicate ``dim`` per salt value, spread
    the skewed side's hot keys across ``salt`` tasks.

    Result-identical to ``skewed.join(dim, on, how)`` for inner/left
    joins (dim replicated exactly once per salt bucket). ``dim`` grows
    ``salt``×, so this is for the middle regime: too big to
    broadcast, small enough that salt× replication beats a stragglered
    shuffle.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt_col = F.pmod(
        F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salt))
    left = skewed.withColumn("_salt", salt_col)
    right = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    return left.join(right, [*on, "_salt"], how).drop("_salt")
