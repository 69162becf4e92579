"""Local twin of the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() on DuckDB, compare row count, column names, and an
order-insensitive value multiset (columns sorted by name, rows sorted).

Usage: python tools/check_queries.py [--bare] [sf_dir] [query ...]

--bare builds a plain SparkSession (no checkpoint dir, default confs) the way
the driver's harness does, instead of the engine's get_spark factory — this is
the session contract the round-4 regression violated.
"""

from __future__ import annotations

import datetime
import math
import sys

import duckdb


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bool):
        return str(bool(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main() -> int:
    argv = sys.argv[1:]
    bare = "--bare" in argv
    if bare:
        argv.remove("--bare")
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    if bare:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("check_queries_bare")
            .master("local[8]")
            .getOrCreate()
        )
    else:
        from tabiya_livelihoods_classifier_spark.session import get_spark

        spark = get_spark(app_name="check_queries", master="local[8]",
                          shuffle_partitions=8)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        df = fn(spark, sf_dir)
        srows = df.collect()
        scols = df.columns
        if name not in oracles:
            print(f"{name:32s} rows={len(srows):7d}  (no oracle — rows-only)")
            continue
        orel = con.execute(oracles[name])
        ocols = [d[0] for d in orel.description]
        orows = orel.fetchall()
        ok_cols = sorted(scols) == sorted(ocols)
        ok_count = len(srows) == len(orows)
        ok_vals = False
        if ok_cols and ok_count:
            ok_vals = normalize(srows, scols) == normalize(orows, ocols)
        status = "OK" if (ok_cols and ok_count and ok_vals) else "FAIL"
        print(
            f"{name:32s} rows={len(srows):7d}/{len(orows):7d} "
            f"cols={'=' if ok_cols else 'DIFF'} vals={'=' if ok_vals else 'DIFF'}"
            f"  {status}"
        )
        if status == "FAIL":
            failures.append(name)
            if not ok_cols:
                print(f"   spark cols:  {sorted(scols)}")
                print(f"   oracle cols: {sorted(ocols)}")
            elif ok_count:
                a = normalize(srows, scols)
                b = normalize(orows, ocols)
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                for x, y in diffs:
                    print(f"   spark:  {x}\n   oracle: {y}")
    print("FAILURES:", failures or "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
