"""Link-graph analytics for crawl/corpus curation.

Web-scale training pipelines rank their crawl frontier by link-graph
importance (CommonCrawl publishes harmonic-centrality/PageRank ranks
for exactly this use). This module gives the standard power-iteration
PageRank in a DETERMINISTIC fixed-point form:

floating-point PageRank sums partial contributions in partition order,
so the low bits differ run-to-run and engine-to-engine — fine for
ranking, fatal for a value-hash oracle gate. Here ranks live in
integer parts-per-``scale`` and every contribution is an integer
division, so the iteration is exact on any engine (integer sums are
associative) and the output hash-matches a SQL replay. Truncation
loses ≤ out_deg-1 parts per node per iteration — a deliberate,
documented bias (the deterministic contract matters more than the
last ppm of mass; dangling-node mass is likewise dropped, as most
large-scale implementations do).

Scale shape (per iteration): ONE join ranks⋈edges on src + ONE
groupBy dst (map-side combined). Ranks are |nodes| rows — broadcast
them while they fit (``broadcast_ranks=True``, the web-domain-graph
case: millions of nodes vs billions of edges); for node sets beyond
broadcast, the join falls back to shuffle, where AQE reuses the
edge-side partitioning across iterations. The only driver-side values
are |nodes| (one count) — the graph itself never leaves the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    damping_bp: int = 8500,
    scale: int = 1_000_000,
    src: str = "src",
    dst: str = "dst",
    broadcast_ranks: bool = True,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Fixed-point power-iteration PageRank over an edge list.

    ``damping_bp`` is the damping factor in basis points (8500 =
    0.85). Output: (node, rank) with rank in integer parts-per-
    ``scale``; sum over nodes ≤ scale (truncation/dangling loss).
    Duplicate edges contribute multiply (multigraph semantics —
    consistent with counting repeated links).

    ``checkpoint_every``: iterative plans grow lineage — without a cut,
    iteration i re-derives every earlier join and the total work is
    O(iters²). A ``localCheckpoint`` every few iterations truncates the
    lineage so long runs stay linear (0 disables — fine for ≤ ~8
    iterations, and required where plan purity matters more than
    speed, e.g. explain-based tests).
    """
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    nodes = (
        e.select(F.col("_s").alias("node"))
        .unionByName(e.select(F.col("_d").alias("node")))
        .distinct()
    )
    n = nodes.count()  # bounded: one scalar to the driver
    if n == 0:
        return nodes.withColumn("rank", F.lit(0).cast("long"))
    deg = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_deg"))
    ew = e.join(deg, "_s")  # out-degree attached once, reused per iter
    base = ((10000 - damping_bp) * scale // 10000) // n
    ranks = nodes.withColumn("rank", F.lit(scale // n).cast("long"))
    for it in range(iters):
        r = F.broadcast(ranks) if broadcast_ranks else ranks
        contribs = (
            ew.join(r, ew["_s"] == r["node"])
            .select(
                F.col("_d"),
                F.expr(f"(rank * {damping_bp} div 10000) div _deg")
                .cast("long").alias("_c"))
            .groupBy("_d").agg(F.sum("_c").alias("_in"))
        )
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["_d"], "left")
            .select(
                "node",
                (F.lit(base) + F.coalesce(F.col("_in"), F.lit(0)))
                .cast("long").alias("rank"))
        )
        if checkpoint_every and (it + 1) % checkpoint_every == 0 \
                and it + 1 < iters:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def pagerank_sql(
    edges_sql: str,
    iters: int = 5,
    damping_bp: int = 8500,
    scale: int = 1_000_000,
    src: str = "src",
    dst: str = "dst",
) -> str:
    """DuckDB mirror of :func:`pagerank` — the iterations unroll into a
    CTE chain with the same integer arithmetic, so the replay is exact."""
    parts = [
        f"e AS (SELECT {src} AS s, {dst} AS d FROM ({edges_sql}))",
        "nodes AS (SELECT DISTINCT node FROM "
        "(SELECT s AS node FROM e UNION ALL SELECT d FROM e))",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        "deg AS (SELECT s, count(*) AS dg FROM e GROUP BY s)",
        f"r0 AS (SELECT node, CAST({scale} // (SELECT n FROM nn) AS BIGINT)"
        " AS rank FROM nodes)",
    ]
    base = (f"CAST(({10000 - damping_bp} * {scale} // 10000)"
            " // (SELECT n FROM nn) AS BIGINT)")
    for i in range(1, iters + 1):
        parts.append(f"""c{i} AS (
          SELECT e.d,
                 sum((r.rank * {damping_bp} // 10000) // deg.dg) AS cin
          FROM e JOIN r{i - 1} r ON e.s = r.node JOIN deg ON e.s = deg.s
          GROUP BY e.d)""")
        parts.append(f"""r{i} AS (
          SELECT nodes.node,
                 CAST({base} + COALESCE(c{i}.cin, 0) AS BIGINT) AS rank
          FROM nodes LEFT JOIN c{i} ON nodes.node = c{i}.d)""")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT node, rank FROM r{iters}")
