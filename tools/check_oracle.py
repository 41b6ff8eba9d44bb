"""Local replica of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB, compare row count, column
names, and an order-insensitive value hash. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return ""
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if v != v:
            return "nan"
        return f"{v:.6g}"
    return str(v)


def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and sys.argv[1].startswith("/") else "/root/testdata/sf0.001"
    only = [a for a in sys.argv[1:] if not a.startswith("/")]

    import __spark_entry__ as entrymod
    from enrich_spark.session import get_spark

    spark = get_spark(cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"  ok {name}: rows-only ({len(srows)} rows)")
            n_pass += 1
            continue
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            n_fail += 1
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(ocols)}")
        # dtype-kind parity: a pandas-level comparator (the driver) renders
        # DuckDB HUGEINT/DECIMAL as float64 ("-1.0") while Spark longs stay
        # int64 ("-1") — fetchall() hides this (int128 -> Python int), which
        # kept the replica green while the driver was red for 3 rounds on
        # dedup_exact. Flag any numeric-kind mismatch or int128/decimal.
        skinds = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}

        def kind(t):
            t = t.lower()
            if t in ("tinyint", "smallint", "int", "bigint", "integer",
                     "ubigint", "uinteger", "usmallint", "utinyint"):
                return "i"
            if t in ("float", "double", "real"):
                return "f"
            return t

        for d in res.description:
            cname, dt = d[0], str(d[1])
            if dt in ("HUGEINT", "UHUGEINT") or "DECIMAL" in dt:
                problems.append(f"duck col {cname} is {dt} (float64 in pandas)")
            st = skinds.get(cname)
            if st and kind(dt) in "if" and kind(st) in "if" and kind(dt) != kind(st):
                problems.append(f"dtype-kind {cname}: spark {st} vs duck {dt}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duck={len(orows)}")
        if not problems:
            sh = table_hash(srows, scols)
            oh = table_hash(orows, ocols)
            if sh != oh:
                problems.append(f"value-hash {sh} != {oh}")
                # show first differing rows for debug
                sset = {"\x01".join(norm_cell(r[i]) for i in sorted(range(len(scols)), key=lambda i: scols[i])) for r in srows}
                oset = {"\x01".join(norm_cell(r[i]) for i in sorted(range(len(ocols)), key=lambda i: ocols[i])) for r in orows}
                for d in list(sset - oset)[:3]:
                    print(f"    spark-only: {d[:220]}")
                for d in list(oset - sset)[:3]:
                    print(f"    duck-only:  {d[:220]}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"  ok {name}: {len(srows)} rows hash-match")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
