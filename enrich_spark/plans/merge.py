"""Snapshot maintenance: CDC latest-wins merge (upsert + tombstones).

A 100 TB training corpus is not static — crawls re-fetch URLs, labels
get corrected, takedown/right-to-erasure requests delete documents.
The standard answer is a periodically compacted snapshot:
``base ⊎ changes → one row per key``, highest sequence wins, tombstone
rows drop the key. This is the MERGE semantics of the lakehouse table
formats, expressed as a plain deterministic DataFrame plan so the
result (not the storage format) is the contract.

Scale shape — the interesting part is what does NOT shuffle:

- ``prune_untouched=True`` (default) splits the base with a broadcast
  semi/anti join on the update keys. Rows whose key has no change
  stream entry pass through MAP-SIDE — zero shuffle for the unchanged
  99.9% of a 100 TB snapshot. Only (touched base rows ∪ updates) enter
  the one row_number window, so the shuffle is proportional to the
  DELTA, not the snapshot. This is the copy-on-write discipline of the
  table formats, minus the file bookkeeping.
- ``prune_untouched=False`` is the full-shuffle fallback for change
  streams too large to broadcast; same semantics, one wide shuffle.

Determinism contract: ties on ``(seq_col)`` break toward the change
stream (updates beat base), then toward the tombstone (a delete at the
same seq wins over an upsert — erasure must dominate), so the merge is
a pure function of the inputs; callers needing total determinism keep
``seq_col`` unique per key, which every real CDC stream provides
(log offset / LSN).

No reference analogue (the reference enriches an event stream); part
of the beyond-reference training-data pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_snapshot(
    base: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    seq_col: str,
    delete_col: str | None = None,
    prune_untouched: bool = True,
) -> DataFrame:
    """Latest-wins merge of a change stream into a snapshot.

    ``updates`` rows carry the same schema as ``base`` plus optionally
    ``delete_col`` (boolean tombstone marker). Output: one row per
    surviving key, the columns of ``base``.
    """
    del_flag = (
        F.coalesce(F.col(delete_col), F.lit(False)) if delete_col
        else F.lit(False)
    )
    b = base
    if delete_col and delete_col not in base.columns:
        b = b.withColumn(delete_col, F.lit(False))
    b = b.withColumn("_src", F.lit(0))
    u = updates.withColumn("_src", F.lit(1))

    def window_merge(rows: DataFrame) -> DataFrame:
        w = Window.partitionBy(*key_cols).orderBy(
            F.col(seq_col).desc(), del_flag.desc(), F.col("_src").desc())
        out = (
            rows.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .where(~del_flag)
            .drop("_rn", "_src")
        )
        return out.drop(delete_col) if delete_col else out

    if not prune_untouched:
        return window_merge(b.unionByName(u, allowMissingColumns=True))

    keys = updates.select(*key_cols).distinct()
    untouched = (
        base.join(F.broadcast(keys), key_cols, "left_anti")
        .drop(*([delete_col] if delete_col in base.columns else []))
    )
    touched = b.join(F.broadcast(keys), key_cols, "left_semi")
    return untouched.unionByName(
        window_merge(touched.unionByName(u, allowMissingColumns=True)))


def read_snapshot(spark, snapshot_dir: str) -> DataFrame | None:
    """Read the current committed version of a streaming-maintained
    snapshot (None before the first commit)."""
    import os

    ptr = os.path.join(snapshot_dir, "_VERSION")
    if not os.path.exists(ptr):
        return None
    with open(ptr) as fh:
        version = fh.read().strip()
    return spark.read.parquet(os.path.join(snapshot_dir, version))


def streaming_merge_sink(
    changes: DataFrame,
    snapshot_dir: str,
    key_cols: list[str],
    seq_col: str,
    delete_col: str | None = None,
    checkpoint_dir: str | None = None,
):
    """Maintain a parquet snapshot from a CDC change STREAM.

    Each micro-batch folds into the stored snapshot via
    :func:`merge_snapshot` (latest-wins, delta-proportional shuffle),
    writes a NEW ``v<batch_id>`` directory, then atomically flips the
    ``_VERSION`` pointer — readers never observe a half-written
    snapshot (write-new-then-swap, the minimal lakehouse commit
    protocol). Replays are safe: foreachBatch re-delivery merges the
    same rows again, and latest-wins over identical (key, seq) rows is
    idempotent, so a crash between write and pointer flip loses
    nothing. Old versions are retained for readers in flight;
    compaction/GC is the deployment's retention policy.

    Returns the started StreamingQuery.
    """
    import os

    def fold(batch: DataFrame, batch_id: int):
        spark = batch.sparkSession
        cur = read_snapshot(spark, snapshot_dir)
        drop = [delete_col] if delete_col else []
        base = cur if cur is not None else batch.drop(*drop).limit(0)
        merged = merge_snapshot(base, batch, key_cols, seq_col,
                                delete_col=delete_col)
        vdir = f"v{batch_id}"
        merged.write.mode("overwrite").parquet(
            os.path.join(snapshot_dir, vdir))
        tmp = os.path.join(snapshot_dir, "_VERSION.tmp")
        with open(tmp, "w") as fh:
            fh.write(vdir)
        os.replace(tmp, os.path.join(snapshot_dir, "_VERSION"))

    writer = changes.writeStream.foreachBatch(fold).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def merge_snapshot_sql(
    base_sql: str,
    updates_sql: str,
    key_cols: list[str],
    seq_col: str,
    out_cols: list[str],
    delete_col: str | None = None,
) -> str:
    """ANSI-SQL mirror of :func:`merge_snapshot` (oracle parity)."""
    keys = ", ".join(key_cols)
    dflag = (f"COALESCE({delete_col}, FALSE)" if delete_col else "FALSE")
    cols = ", ".join(out_cols)
    return f"""
        SELECT {cols} FROM (
          SELECT u.*, row_number() OVER (
                   PARTITION BY {keys}
                   ORDER BY {seq_col} DESC, {dflag} DESC, _src DESC
                 ) AS _rn
          FROM (
            SELECT *, {'FALSE AS ' + delete_col + ',' if delete_col else ''}
                   0 AS _src FROM ({base_sql})
            UNION ALL BY NAME
            SELECT *, 1 AS _src FROM ({updates_sql})
          ) u
        ) WHERE _rn = 1 AND NOT {dflag}
    """


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff of two corpus snapshots: for each key, status ∈
    {added, removed, changed, unchanged} plus content hashes — the
    audit a pipeline runs between dataset versions (pairs with
    plans/manifest.dataset_manifest, which commits WHAT a snapshot is;
    this explains HOW it moved).

    ``compare_cols`` defaults to every shared non-key column; change
    detection is md5 over the concatenated compared columns (NULL-safe
    via a unit separator), so two engines agree byte-for-byte.

    Scale shape: ONE full outer join on the keys — both sides shuffle
    once; the hash is map-side. Skewless by construction when keys are
    ids. Output is one row per key in either snapshot; feed it to
    ``groupBy("status").count()`` for the summary.
    """
    if compare_cols is None:
        shared = [c for c in old.columns
                  if c in new.columns and c not in key_cols]
        compare_cols = shared

    def hashed(df: DataFrame, alias: str) -> DataFrame:
        h = F.md5(F.concat_ws(
            "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                      for c in compare_cols]))
        return df.select(*key_cols, h.alias(alias))

    o = hashed(old, "_h_old")
    n = hashed(new, "_h_new")
    joined = o.join(n, on=key_cols, how="full_outer")
    status = (
        F.when(F.col("_h_old").isNull(), F.lit("added"))
        .when(F.col("_h_new").isNull(), F.lit("removed"))
        .when(F.col("_h_old") != F.col("_h_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(*key_cols, status.alias("status"),
                         F.col("_h_old").alias("hash_old"),
                         F.col("_h_new").alias("hash_new"))


def snapshot_diff_summary(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """→ (status, n) — the four-line audit record."""
    return (snapshot_diff(old, new, key_cols, compare_cols)
            .groupBy("status").agg(F.count(F.lit(1)).alias("n")))
