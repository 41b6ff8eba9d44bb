"""As-of join — for each left row, the latest right row at or before
its timestamp (per key): the canonical point-in-time lookup (currency
rates, slowly-changing dimensions, sensor snapshots, model-version
attribution). Spark has no built-in; this is the custom-operator
composition the engine provides (SURVEY §2.5 #7's currency enrichment
is the special case "as-of against a daily table"; this is the general
operator).

Two physical strategies, same semantics:

- ``mode="union"`` (default, the 100 TB path): tag and UNION both
  inputs, ONE shuffle on the keys, sort within partitions by (ts,
  side), and carry the right payload forward with
  ``last(..., ignorenulls=True)`` over an unbounded-preceding window —
  the distributed equivalent of pandas ``merge_asof``. No join node at
  all: cost is one exchange of |left| + |right| rows regardless of key
  skew in the match density (a hot key with millions of left rows
  never builds a candidate cross product).
- ``mode="broadcast"``: for a small right side — broadcast equi-join on
  the keys, keep candidates with right_ts ≤ left_ts, per-left-row
  ``row_number`` keep-latest. Candidate volume = left × (right rows
  per key), so only for dimension-sized right inputs.

Semantics (both modes, asserted identical in tests):
- backward inclusive: right_ts ≤ left_ts, latest wins; ties on
  right_ts broken by keeping the LAST in (right_ts, right input
  order) — deterministic given unique (key, ts) right rows (the
  normal as-of contract: one snapshot per key per instant).
- ``tolerance`` (seconds): a match older than the tolerance is
  discarded (row kept, right columns NULL) — pandas' tolerance knob.
- unmatched left rows survive with NULL right columns (left join).

DuckDB mirrors this natively (``ASOF LEFT JOIN``), which is what the
oracle uses — two engines, two independent implementations, one
hash-checked result.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    mode: str = "union",
    tolerance_s: float | None = None,
    right_prefix: str = "",
) -> DataFrame:
    """Point-in-time join. Right payload columns (everything except
    `on` + `right_ts`) land on the left rows, optionally prefixed;
    plus ``_asof_ts`` = the matched right timestamp (NULL if none)."""
    payload = [c for c in right.columns if c not in on and c != right_ts]
    out_names = {c: right_prefix + c for c in payload}

    if mode == "broadcast":
        # the small right side folds to ONE row per key holding its
        # time-sorted snapshots; after the broadcast join the as-of
        # resolution is a map-side array filter + last-element pick —
        # the LEFT side never shuffles and never candidate-explodes
        r_arr = right.groupBy(*on).agg(
            F.sort_array(F.collect_list(F.struct(
                F.col(right_ts).alias("_rt"),
                *[F.col(c).alias("_rc_" + c) for c in payload],
            ))).alias("_rarr"))
        joined = left.join(F.broadcast(r_arr), on=on, how="left")
        lts = F.col(left_ts)
        cands = F.filter(F.col("_rarr"), lambda x: x["_rt"] <= lts)
        best = F.when(F.size(cands) > 0, F.element_at(cands, -1))
        out = joined.select(
            *[c for c in left.columns],
            *[best["_rc_" + c].alias("_r_" + c) for c in payload],
            best["_rt"].alias("_r_ts"),
        )
    elif mode == "union":
        lcols = [c for c in left.columns]
        l_tagged = left.select(
            *on,
            F.col(left_ts).alias("_ts"),
            F.lit(1).alias("_side"),
            F.struct(*lcols).alias("_l"),
            *[F.lit(None).cast(right.schema[c].dataType).alias("_r_" + c)
              for c in payload],
            F.lit(None).cast(right.schema[right_ts].dataType)
            .alias("_r_ts"),
        )
        r_tagged = right.select(
            *on,
            F.col(right_ts).alias("_ts"),
            F.lit(0).alias("_side"),
            F.lit(None).cast(
                l_tagged.schema["_l"].dataType).alias("_l"),
            *[F.col(c).alias("_r_" + c) for c in payload],
            F.col(right_ts).alias("_r_ts"),
        )
        both = l_tagged.unionByName(r_tagged)
        # right rows sort BEFORE left rows at equal ts (backward
        # inclusive); among equal right ts, input order last-wins
        w = (Window.partitionBy(*on)
             .orderBy(F.col("_ts").asc(), F.col("_side").asc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        filled = both.select(
            "*",
            *[F.last("_r_" + c, ignorenulls=True).over(w)
              .alias("_f_" + c) for c in payload],
            F.last("_r_ts", ignorenulls=True).over(w).alias("_f_ts"),
        )
        out = (
            filled.where(F.col("_side") == 1)
            .select(
                "_l.*",
                *[F.col("_f_" + c).alias("_r_" + c) for c in payload],
                F.col("_f_ts").alias("_r_ts"),
            )
        )
    else:
        raise ValueError(f"unknown asof mode {mode!r}")

    if tolerance_s is not None:
        stale = (
            F.col("_r_ts").isNotNull()
            & (F.unix_timestamp(F.col(left_ts))
               - F.unix_timestamp(F.col("_r_ts")) > tolerance_s)
        )
        for c in payload:
            out = out.withColumn(
                "_r_" + c, F.when(stale, F.lit(None))
                .otherwise(F.col("_r_" + c)))
        out = out.withColumn(
            "_r_ts", F.when(stale, F.lit(None)).otherwise(F.col("_r_ts")))

    for c in payload:
        out = out.withColumnRenamed("_r_" + c, out_names[c])
    return out.withColumnRenamed("_r_ts", "_asof_ts").drop("_lid")
