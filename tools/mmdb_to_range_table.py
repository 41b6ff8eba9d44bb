"""mmdb → range-table converter CLI.

Turns MaxMind .mmdb database file(s) into the parquet/CSV range table the
``ip_lookups`` broadcast join consumes (operators/geo.py). Run once at
deploy time (or from the asset-refresh hook when MaxMind ships a new DB):

    python tools/mmdb_to_range_table.py --city GeoIP2-City.mmdb \
        --isp GeoIP2-ISP.mmdb --out ranges.parquet

Multiple DB models are interval-merged (City + ISP + Domain +
Connection-Type — the four file axes of the reference's ipLookups config,
common/.../registry/IpLookupsEnrichment.scala:60-88). ASN databases use
--asn and emit (ip_start, ip_end, asn, asn_org) for the asn_lookups
operator instead.

No Spark required — the output is plain parquet via pyarrow.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from enrich_spark.functions.mmdb import (  # noqa: E402
    Reader, asn_columns, merge_range_rows, mmdb_to_rows,
)

GEO_COLS = [
    "geo_country", "geo_region", "geo_city", "geo_zipcode", "geo_latitude",
    "geo_longitude", "geo_region_name", "geo_timezone",
    "ip_isp", "ip_organization", "ip_domain", "ip_netspeed",
]


def convert(city=None, isp=None, domain=None, connection=None, asn=None):
    """Return (rows, columns) for the requested DB set."""
    if asn is not None:
        reader = Reader.open(asn)
        rows = [
            {"ip_start": s, "ip_end": e, **asn_columns(rec)}
            for s, e, rec in reader.iter_ranges(ipv4_only=True)
        ]
        return rows, ["ip_start", "ip_end", "asn", "asn_org"]
    row_lists = [
        mmdb_to_rows(Reader.open(p))
        for p in (city, isp, domain, connection) if p is not None
    ]
    if not row_lists:
        raise SystemExit("need at least one of --city/--isp/--domain/--connection/--asn")
    rows = merge_range_rows(row_lists) if len(row_lists) > 1 else row_lists[0]
    return rows, ["ip_start", "ip_end"] + GEO_COLS


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--city")
    ap.add_argument("--isp")
    ap.add_argument("--domain")
    ap.add_argument("--connection")
    ap.add_argument("--asn", help="ASN database (exclusive with the geo models)")
    ap.add_argument("--out", required=True, help=".parquet or .csv output path")
    args = ap.parse_args(argv)

    rows, cols = convert(args.city, args.isp, args.domain, args.connection, args.asn)
    if args.out.endswith(".csv"):
        import csv

        with open(args.out, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=cols)
            w.writeheader()
            for r in rows:
                w.writerow({c: r.get(c) for c in cols})
    else:
        import pyarrow as pa
        import pyarrow.parquet as pq

        table = pa.Table.from_pylist([{c: r.get(c) for c in cols} for r in rows])
        pq.write_table(table, args.out)
    print(f"wrote {len(rows)} ranges to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
