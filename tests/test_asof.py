"""As-of join (plans/asof.py): semantics, mode parity (union vs
broadcast), DuckDB ASOF JOIN oracle parity, tolerance, plan contracts
(union = one exchange + zero join nodes; broadcast = no sort-merge)."""

from __future__ import annotations

import datetime as dt
import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from enrich_spark.plans.asof import asof_join

T0 = dt.datetime(2026, 1, 1, 0, 0, 0)


def _m(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def _frames(spark):
    trades = spark.createDataFrame(
        [(1, "AAPL", _m(5)), (2, "AAPL", _m(10)), (3, "AAPL", _m(2)),
         (4, "MSFT", _m(7)), (5, "MSFT", _m(1)),     # before any quote
         (6, "NVDA", _m(9))],                        # key with no quotes
        "trade_id long, sym string, t timestamp")
    quotes = spark.createDataFrame(
        [("AAPL", _m(0), 100.0), ("AAPL", _m(5), 101.0),
         ("AAPL", _m(8), 102.0),
         ("MSFT", _m(3), 200.0), ("MSFT", _m(6), 201.0)],
        "sym string, qt timestamp, px double")
    return trades, quotes


EXPECT = {
    1: 101.0,   # inclusive: quote AT :05 matches trade AT :05
    2: 102.0,
    3: 100.0,
    4: 201.0,
    5: None,    # only future quotes
    6: None,    # no quotes at all
}


@pytest.mark.parametrize("mode", ["union", "broadcast"])
def test_asof_semantics_both_modes(spark, mode):
    trades, quotes = _frames(spark)
    out = asof_join(trades, quotes, on=["sym"], left_ts="t",
                    right_ts="qt", mode=mode)
    got = {r.trade_id: r.px for r in out.collect()}
    assert got == EXPECT
    # matched timestamp surfaces as _asof_ts
    ts = {r.trade_id: r._asof_ts for r in out.collect()}
    assert ts[1] == _m(5) and ts[5] is None and ts[6] is None


def test_asof_matches_duckdb_asof_join(spark):
    """Two independent implementations, one result: Spark union-window
    vs DuckDB's native ASOF LEFT JOIN."""
    trades, quotes = _frames(spark)
    out = asof_join(trades, quotes, on=["sym"], left_ts="t",
                    right_ts="qt")
    got = sorted((r.trade_id, r.sym, r.px) for r in out.collect())

    con = duckdb.connect()
    con.execute("CREATE TABLE trades (trade_id BIGINT, sym VARCHAR, "
                "t TIMESTAMP)")
    con.execute("CREATE TABLE quotes (sym VARCHAR, qt TIMESTAMP, "
                "px DOUBLE)")
    con.executemany("INSERT INTO trades VALUES (?, ?, ?)",
                    [(r.trade_id, r.sym, r.t) for r in trades.collect()])
    con.executemany("INSERT INTO quotes VALUES (?, ?, ?)",
                    [(r.sym, r.qt, r.px) for r in quotes.collect()])
    want = sorted(tuple(r) for r in con.execute("""
        SELECT t.trade_id, t.sym, q.px
        FROM trades t ASOF LEFT JOIN quotes q
          ON t.sym = q.sym AND t.t >= q.qt
    """).fetchall())
    assert got == want


def test_asof_tolerance(spark):
    trades, quotes = _frames(spark)
    out = asof_join(trades, quotes, on=["sym"], left_ts="t",
                    right_ts="qt", tolerance_s=120)  # 2 minutes
    got = {r.trade_id: r.px for r in out.collect()}
    # trade 2 at :10, latest quote :08 → within 2 min, kept
    # trade 3 at :02, latest quote :00 → exactly 2 min, kept
    # trade 4 at :07, latest quote :06 → kept; trade 1 same-instant kept
    assert got == {1: 101.0, 2: 102.0, 3: 100.0, 4: 201.0,
                   5: None, 6: None}
    tighter = asof_join(trades, quotes, on=["sym"], left_ts="t",
                        right_ts="qt", tolerance_s=60)
    got = {r.trade_id: r.px for r in tighter.collect()}
    assert got[2] is None and got[3] is None   # now stale
    assert got[1] == 101.0 and got[4] == 201.0


def test_asof_right_prefix_and_columns(spark):
    trades, quotes = _frames(spark)
    out = asof_join(trades, quotes, on=["sym"], left_ts="t",
                    right_ts="qt", right_prefix="q_")
    assert set(out.columns) == {"trade_id", "sym", "t", "q_px",
                                "_asof_ts"}


def test_asof_union_plan_contract(spark):
    """The scale path: NO join node, exactly one exchange (the keyed
    shuffle shared by the sort window)."""
    trades, quotes = _frames(spark)
    plan = (asof_join(trades, quotes, on=["sym"], left_ts="t",
                      right_ts="qt")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "EvalPython" not in plan


def test_asof_broadcast_plan_contract(spark):
    """Small-right path: the left side NEVER shuffles — the only
    exchanges are the right side's tiny groupBy and its broadcast;
    resolution is a map-side array filter over the broadcast rows."""
    trades, quotes = _frames(spark)
    plan = (asof_join(trades, quotes, on=["sym"], left_ts="t",
                      right_ts="qt", mode="broadcast")
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan
    # every hash exchange is on the RIGHT (pre-broadcast agg), none on
    # the left stream
    import re

    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "sym" in line  # the right groupBy key, not a _lid
