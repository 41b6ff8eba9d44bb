"""Dataset manifest — content-addressed equality for corpus copies.

Moving a 100 TB corpus between stores/engines needs a cheap answer to
"is this the same data?" that does not depend on row order, file
layout, or partition count. The manifest here is a single aggregate:

- ``n_rows`` exact;
- ``content_xor``: bit_xor of a per-row hash over the canonical
  string form of the selected columns. XOR is commutative and
  associative, so the fold is order- and partitioning-independent,
  map-side combined — one shuffle of 64 bits per group.
- ``bytes_total``: exact sum of the canonical-form lengths.

``hash="xxhash64"`` (default) is the fast JVM path;
``hash="md5"`` derives the 60-bit prefix of md5 — slower but
replayable on any engine with md5 (the oracle-gate mode).

Caveat (documented, not hidden): XOR cancels PAIRS of identical rows
— two datasets differing by adding the same row twice share the xor.
``n_rows`` + ``bytes_total`` catch every such case except
swap-a-duplicate-pair permutations, which additionally require equal
lengths. For a stronger commitment use per-group manifests (smaller
XOR domains) — ``group_cols`` exists for exactly that.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _canon(cols: list[str]):
    # canonical row form: name=value joined with \x1f, NULL → \x00.
    # Engine-portable for integer/string/boolean/decimal columns;
    # DOUBLE→string rendering differs across engines in scientific-
    # notation ranges — round/cast float columns to DECIMAL or string
    # upstream when the manifest must replay off-Spark.
    parts = [
        F.concat(F.lit(c + "="),
                 F.coalesce(F.col(c).cast("string"), F.lit("\x00")))
        for c in sorted(cols)
    ]
    return F.concat_ws("\x1f", *parts)


def _row_hash(canon: Column, hash: str) -> Column:
    if hash == "xxhash64":
        return F.xxhash64(canon)
    if hash == "md5":
        # 60-bit md5 prefix as a BIGINT — portable across engines
        return F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("long")
    raise ValueError(f"unknown manifest hash {hash!r}")


def dataset_manifest(
    df: DataFrame,
    cols: list[str] | None = None,
    group_cols: list[str] | None = None,
    hash: str = "xxhash64",
) -> DataFrame:
    """One manifest row per group (or one total row): n_rows,
    content_xor, bytes_total. Two datasets with equal manifests over
    the same ``cols`` are content-equal up to the documented XOR
    caveat; unequal manifests prove difference."""
    cols = cols or [c for c in df.columns
                    if not group_cols or c not in group_cols]
    canon = _canon(cols)
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.bit_xor(_row_hash(canon, hash)).cast("long")
        .alias("content_xor"),
        F.sum(F.length(canon)).cast("long").alias("bytes_total"),
    ]
    if group_cols:
        return df.groupBy(*group_cols).agg(*aggs)
    return df.agg(*aggs)


def dataset_manifest_sql(
    from_sql: str,
    cols: list[str],
    group_cols: list[str] | None = None,
) -> str:
    """DuckDB mirror of the ``hash="md5"`` mode."""
    canon = ("concat_ws(chr(31), " + ", ".join(
        f"'{c}=' || COALESCE(CAST({c} AS VARCHAR), chr(0))"
        for c in sorted(cols)) + ")")
    row_h = f"CAST(('0x' || substr(md5({canon}), 1, 15)) AS BIGINT)"
    aggs = (
        "CAST(count(*) AS BIGINT) AS n_rows, "
        f"CAST(bit_xor({row_h}) AS BIGINT) AS content_xor, "
        f"CAST(sum(length({canon})) AS BIGINT) AS bytes_total"
    )
    if group_cols:
        g = ", ".join(group_cols)
        return f"SELECT {g}, {aggs} FROM ({from_sql}) GROUP BY {g}"
    return f"SELECT {aggs} FROM ({from_sql})"
