"""One-pass distributed linear-model training (normal equations).

``score_linear_model`` (curation.py) applies a trained quality model at
scan speed; this module TRAINS one the one-pass way: for a small
feature count d, ridge regression has the closed form

    (XᵀX + λI) β = Xᵀy

and XᵀX / Xᵀy are plain algebraic aggregates — ONE map-side-combined
aggregation over the corpus produces the (d+1)² Gram sums, the (d+1)-
vector solve happens on the driver. No gradient iterations, no
per-epoch passes: at 100 TB this is a single scan, the same cost as
any corpus statistic. (MLlib's LinearRegression runs L-BFGS epochs —
the right tool for large d; for the 2-10 engineered quality features a
curation pipeline actually uses, the normal equations are strictly
cheaper and deterministic.)

Determinism contract (what makes the gated row possible): with INTEGER
feature/label columns the Gram sums are exact 64-bit integers (no
float-association drift across partitionings); the driver solve uses
Cramer's rule written with the SAME expression shape as the DuckDB
mirror, so both engines perform identical IEEE-double operations on
identical integers — the coefficients match bit-for-bit, rounded to
6dp for the gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fit_ridge_2f(
    df: DataFrame,
    x1: str,
    x2: str,
    y: str,
    l2: int = 0,
) -> dict:
    """Ridge fit of ``y ~ b0 + b1·x1 + b2·x2`` — one aggregation pass.

    Integer columns in, exact integer Gram sums out of the cluster;
    the 3×3 solve (Cramer) runs on the driver. ``l2`` (integer) is
    added to the x1/x2 diagonal, not the intercept. Returns
    {"b0","b1","b2","n"}."""
    c1, c2, cy = F.col(x1).cast("long"), F.col(x2).cast("long"), \
        F.col(y).cast("long")
    s = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(c1).alias("s1"), F.sum(c2).alias("s2"),
        F.sum(cy).alias("sy"),
        F.sum(c1 * c1).alias("s11"), F.sum(c1 * c2).alias("s12"),
        F.sum(c2 * c2).alias("s22"),
        F.sum(c1 * cy).alias("s1y"), F.sum(c2 * cy).alias("s2y"),
    ).collect()[0]
    return _cramer_3x3(s.n, s.s1, s.s2, s.sy, s.s11 + l2, s.s12,
                       s.s22 + l2, s.s1y, s.s2y)


def _cramer_3x3(n, s1, s2, sy, s11, s12, s22, s1y, s2y) -> dict:
    """Cramer's rule for the 3×3 normal equations. The expression
    SHAPE here is mirrored verbatim in :func:`fit_ridge_2f_sql` —
    identical operand order means identical IEEE rounding in any
    double-arithmetic engine."""
    n, s1, s2, sy = float(n), float(s1), float(s2), float(sy)
    s11, s12, s22 = float(s11), float(s12), float(s22)
    s1y, s2y = float(s1y), float(s2y)
    det = (n * (s11 * s22 - s12 * s12)
           - s1 * (s1 * s22 - s12 * s2)
           + s2 * (s1 * s12 - s11 * s2))
    b0 = (sy * (s11 * s22 - s12 * s12)
          - s1 * (s1y * s22 - s12 * s2y)
          + s2 * (s1y * s12 - s11 * s2y)) / det
    b1 = (n * (s1y * s22 - s12 * s2y)
          - sy * (s1 * s22 - s12 * s2)
          + s2 * (s1 * s2y - s1y * s2)) / det
    b2 = (n * (s11 * s2y - s1y * s12)
          - s1 * (s1 * s2y - s1y * s2)
          + sy * (s1 * s12 - s11 * s2)) / det
    return {"b0": b0, "b1": b1, "b2": b2, "n": int(n)}


def fit_ridge_2f_df(
    df: DataFrame, x1: str, x2: str, y: str, l2: int = 0,
) -> DataFrame:
    """:func:`fit_ridge_2f` as a ONE-ROW DataFrame (6dp-rounded
    coefficients + exact n) — the gate-able form."""
    spark = df.sparkSession
    fit = fit_ridge_2f(df, x1, x2, y, l2)
    return spark.createDataFrame(
        [(round(fit["b0"], 6), round(fit["b1"], 6),
          round(fit["b2"], 6), fit["n"])],
        "b0 double, b1 double, b2 double, n long")


def fit_ridge_2f_sql(
    from_sql: str, x1: str, x2: str, y: str, l2: int = 0,
) -> str:
    """DuckDB mirror: same integer Gram sums, same Cramer expression
    shape (operand-order-identical doubles)."""
    return f"""
        WITH g AS (
          SELECT CAST(count(*) AS DOUBLE) AS n,
                 CAST(sum({x1}) AS DOUBLE) AS s1,
                 CAST(sum({x2}) AS DOUBLE) AS s2,
                 CAST(sum({y}) AS DOUBLE) AS sy,
                 CAST(sum({x1} * {x1}) + {l2} AS DOUBLE) AS s11,
                 CAST(sum({x1} * {x2}) AS DOUBLE) AS s12,
                 CAST(sum({x2} * {x2}) + {l2} AS DOUBLE) AS s22,
                 CAST(sum({x1} * {y}) AS DOUBLE) AS s1y,
                 CAST(sum({x2} * {y}) AS DOUBLE) AS s2y,
                 CAST(count(*) AS BIGINT) AS n_rows
          FROM {from_sql}
        ),
        d AS (
          SELECT *,
                 (n * (s11 * s22 - s12 * s12)
                  - s1 * (s1 * s22 - s12 * s2)
                  + s2 * (s1 * s12 - s11 * s2)) AS det
          FROM g
        )
        SELECT round((sy * (s11 * s22 - s12 * s12)
                      - s1 * (s1y * s22 - s12 * s2y)
                      + s2 * (s1y * s12 - s11 * s2y)) / det, 6) AS b0,
               round((n * (s1y * s22 - s12 * s2y)
                      - sy * (s1 * s22 - s12 * s2)
                      + s2 * (s1 * s2y - s1y * s2)) / det, 6) AS b1,
               round((n * (s11 * s2y - s1y * s12)
                      - s1 * (s1 * s2y - s1y * s2)
                      + sy * (s1 * s12 - s11 * s2)) / det, 6) AS b2,
               n_rows AS n
        FROM d
    """
