"""Fixed-point PageRank (datapipe/graph.pagerank)."""

from __future__ import annotations

import duckdb
import pytest

from enrich_spark.datapipe.graph import pagerank, pagerank_sql

EDGES = [  # hub: everyone links to 0; 0 links to 1; 3→4 side chain
    (1, 0), (2, 0), (3, 0), (4, 0), (0, 1), (3, 4),
]


def _edges_df(spark):
    return spark.createDataFrame(EDGES, "src INT, dst INT")


def test_pagerank_orders_hub_first(spark):
    # 40 iterations: the 0↔1 cycle gives the iteration an oscillating
    # mode with |λ| = d² = 0.7225 — at 40 iters its amplitude is far
    # below the analytic r0−r1 gap (r0 ≈ 0.469, r1 ≈ 0.428)
    ranks = {r.node: r.rank for r in
             pagerank(_edges_df(spark), iters=40).collect()}
    assert set(ranks) == {0, 1, 2, 3, 4}
    assert ranks[0] == max(ranks.values())        # the hub wins
    assert ranks[1] > ranks[2]                    # 0's sole outlink beats leaf
    assert ranks[2] == ranks[3]                   # symmetric leaves
    # total mass bounded by scale, and not degenerately small
    assert sum(ranks.values()) <= 1_000_000
    assert sum(ranks.values()) > 900_000


def test_pagerank_matches_duckdb_mirror(spark):
    for iters in (1, 3, 5):
        srows = sorted(
            (r.node, r.rank)
            for r in pagerank(_edges_df(spark), iters=iters).collect())
        sql = pagerank_sql(
            "SELECT * FROM (VALUES " +
            ",".join(f"({a},{b})" for a, b in EDGES) + ") t(src, dst)",
            iters=iters)
        drows = sorted(tuple(r) for r in duckdb.connect().execute(sql).fetchall())
        assert drows == srows, f"iters={iters}"


def test_pagerank_shuffle_mode_matches_broadcast(spark):
    a = sorted((r.node, r.rank) for r in pagerank(
        _edges_df(spark), iters=3, broadcast_ranks=True).collect())
    b = sorted((r.node, r.rank) for r in pagerank(
        _edges_df(spark), iters=3, broadcast_ranks=False).collect())
    assert a == b


def test_pagerank_empty_graph(spark):
    empty = spark.createDataFrame([], "src INT, dst INT")
    assert pagerank(empty, iters=2).count() == 0


def test_pagerank_deterministic_across_partitionings(spark):
    e = _edges_df(spark)
    a = sorted((r.node, r.rank)
               for r in pagerank(e.repartition(7), iters=4).collect())
    b = sorted((r.node, r.rank)
               for r in pagerank(e.coalesce(1), iters=4).collect())
    assert a == b  # integer sums are associative — the whole point
