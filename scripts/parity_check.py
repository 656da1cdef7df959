#!/usr/bin/env python
"""Fast local mirror of the driver's correctness gate for a SUBSET of queries.

Runs each named queries() entry on a DRIVER-SHAPED Spark session (default
configs + ANSI **enabled**, like the per-round harness — NOT the engine's
tuned session) and its oracle_sql() on DuckDB over the same parquet tables,
then compares column names, row counts and canonicalized value multisets.

Usage: python scripts/parity_check.py [--sf DIR] [name ...]   (no names = all)
"""

from __future__ import annotations

import argparse
import datetime
import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _canon(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return str(v)


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    import __spark_entry__ as entrymod

    # driver-shaped session: stock configs, ANSI ON (the Spark 4 default)
    spark = (SparkSession.builder.appName("parity").master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.ansi.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{args.sf}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.names or sorted(queries)
    failed = []
    for name in names:
        try:
            sdf = queries[name](spark, args.sf)
            srows = [tuple(r) for r in sdf.collect()]
            scols = list(sdf.columns)
            if name not in oracles:
                print(f"{name}: ROWS-ONLY ({len(srows)} rows)")
                continue
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            ok = True
            if sorted(scols) != sorted(dcols):
                print(f"{name}: FAIL cols spark={sorted(scols)} duck={sorted(dcols)}")
                ok = False
            elif len(srows) != len(drows):
                print(f"{name}: FAIL rows spark={len(srows)} duck={len(drows)}")
                ok = False
            else:
                a = _canon_rows(scols, srows)
                b = _canon_rows(dcols, drows)
                if a != b:
                    mism = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
                    print(f"{name}: FAIL hash; first diffs:")
                    for i in mism:
                        print(f"   spark={a[i]}\n   duck ={b[i]}")
                    ok = False
            if ok:
                print(f"{name}: OK ({len(srows)} rows)")
            else:
                failed.append(name)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {type(e).__name__}: {str(e)[:300]}")
            failed.append(name)
    print(f"\n{len(names) - len(failed)}/{len(names)} green"
          + (f"; failed: {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
