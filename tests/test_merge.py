"""CDC snapshot merge (plans/merge.merge_snapshot)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from enrich_spark.plans.merge import merge_snapshot, merge_snapshot_sql


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10), (3, "c", 10), (4, "d", 10)],
        "id INT, val STRING, seq INT")


def _updates(spark):
    # upsert id=2 (newer), stale update id=3 (older seq — must lose),
    # tombstone id=4, brand-new id=5
    return spark.createDataFrame(
        [(2, "B2", 20, False), (3, "zzz", 5, False),
         (4, None, 20, True), (5, "e", 20, False)],
        "id INT, val STRING, seq INT, deleted BOOLEAN")


EXPECT = {(1, "a", 10), (2, "B2", 20), (3, "c", 10), (5, "e", 20)}


@pytest.mark.parametrize("prune", [True, False])
def test_merge_snapshot_semantics(spark, prune):
    out = merge_snapshot(_base(spark), _updates(spark), ["id"], "seq",
                         delete_col="deleted", prune_untouched=prune)
    assert out.columns == ["id", "val", "seq"]
    assert {tuple(r) for r in out.collect()} == EXPECT


def test_merge_snapshot_incremental_composition(spark):
    # merge(merge(base, u1), u2) == merge(base, u1 ∪ u2) when seqs
    # are unique per key — the compaction-schedule invariance real
    # pipelines rely on
    base = _base(spark)
    u1 = spark.createDataFrame([(2, "B2", 20, False)],
                               "id INT, val STRING, seq INT, deleted BOOLEAN")
    u2 = spark.createDataFrame([(2, "B3", 30, False), (1, None, 25, True)],
                               "id INT, val STRING, seq INT, deleted BOOLEAN")
    two_step = merge_snapshot(
        merge_snapshot(base, u1, ["id"], "seq", delete_col="deleted"),
        u2, ["id"], "seq", delete_col="deleted")
    one_step = merge_snapshot(base, u1.unionByName(u2), ["id"], "seq",
                              delete_col="deleted")
    assert ({tuple(r) for r in two_step.collect()}
            == {tuple(r) for r in one_step.collect()})


def test_merge_snapshot_delete_beats_upsert_same_seq(spark):
    base = _base(spark)
    u = spark.createDataFrame([(2, "B2", 20, False), (2, None, 20, True)],
                              "id INT, val STRING, seq INT, deleted BOOLEAN")
    out = merge_snapshot(base, u, ["id"], "seq", delete_col="deleted")
    assert {r.id for r in out.collect()} == {1, 3, 4}


def test_merge_snapshot_untouched_path_has_no_exchange(spark):
    # the copy-on-write contract: unchanged rows never shuffle — the
    # anti-join side of the plan is broadcast, and the only Exchange
    # in the whole plan feeds the delta window
    out = merge_snapshot(_base(spark), _updates(spark), ["id"], "seq",
                         delete_col="deleted")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_merge_snapshot_sql_mirror_matches(spark):
    out = merge_snapshot(_base(spark), _updates(spark), ["id"], "seq",
                         delete_col="deleted")
    srows = sorted(tuple(r) for r in out.collect())
    con = duckdb.connect()
    sql = merge_snapshot_sql(
        "SELECT * FROM (VALUES (1,'a',10),(2,'b',10),(3,'c',10),(4,'d',10))"
        " t(id, val, seq)",
        "SELECT * FROM (VALUES (2,'B2',20,FALSE),(3,'zzz',5,FALSE),"
        "(4,NULL,20,TRUE),(5,'e',20,FALSE)) t(id, val, seq, deleted)",
        ["id"], "seq", ["id", "val", "seq"], delete_col="deleted")
    drows = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert drows == srows


def test_streaming_merge_sink_maintains_snapshot(spark):
    import os
    import tempfile

    from enrich_spark.plans.merge import read_snapshot, streaming_merge_sink

    schema = "id INT, val STRING, seq INT, deleted BOOLEAN"
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "in")
        snap = os.path.join(tmp, "snap")
        os.makedirs(src)
        os.makedirs(snap)
        # batch 0: initial inserts
        spark.createDataFrame(
            [(1, "a", 1, False), (2, "b", 1, False)], schema
        ).write.parquet(os.path.join(src, "b0"))
        changes = (spark.readStream.schema(schema)
                   .option("recursiveFileLookup", "true").parquet(src))
        q = streaming_merge_sink(
            changes, snap, ["id"], "seq", delete_col="deleted",
            checkpoint_dir=os.path.join(tmp, "ckpt"))
        try:
            q.processAllAvailable()
            s0 = {tuple(r) for r in read_snapshot(spark, snap).collect()}
            assert s0 == {(1, "a", 1), (2, "b", 1)}

            # batch 1: upsert id=2, delete id=1, insert id=3
            spark.createDataFrame(
                [(2, "B", 2, False), (1, None, 2, True), (3, "c", 2, False)],
                schema).write.parquet(os.path.join(src, "b1"))
            q.processAllAvailable()
            s1 = {tuple(r) for r in read_snapshot(spark, snap).collect()}
            assert s1 == {(2, "B", 2), (3, "c", 2)}
        finally:
            q.stop()


def test_snapshot_diff_statuses(spark):
    """Row-level version audit: added/removed/changed/unchanged, change
    detection NULL-safe, one full-outer join."""
    from enrich_spark.plans.merge import snapshot_diff, snapshot_diff_summary

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        "k long, v string, x long")
    new = spark.createDataFrame(
        [(1, "a", 10),            # unchanged
         (2, "B", 20),            # changed (v)
         (4, None, 41),           # changed (x; NULL v on both sides)
         (5, "e", 50)],           # added       (3 removed)
        "k long, v string, x long")
    got = {r.k: r.status for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed",
                   4: "changed", 5: "added"}
    summary = {r.status: r.n for r in
               snapshot_diff_summary(old, new, ["k"]).collect()}
    assert summary == {"unchanged": 1, "changed": 2, "removed": 1,
                       "added": 1}
    # compare_cols subset: x ignored -> row 4 becomes unchanged
    got = {r.k: r.status
           for r in snapshot_diff(old, new, ["k"],
                                  compare_cols=["v"]).collect()}
    assert got[4] == "unchanged" and got[2] == "changed"
    # plan: exactly one equi-join, no Python
    plan = (snapshot_diff(old, new, ["k"])
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Join") == 1 and "EvalPython" not in plan
