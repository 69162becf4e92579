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


def check_ingest(spark, con, sf_dir) -> list[str]:
    """S1-S4 round-trip oracle check: write real corpus tables (plus one
    deliberately gnarly synthetic frame) out as defensive-dialect CSV and
    NDJSON, re-read them with read_csv_defensive / read_json_any, read the
    SAME files with DuckDB's read_csv / read_json, and demand all three
    (spark-reread, duckdb-reread, original) agree as value multisets.

    Everything is string-cast BEFORE writing: the defensive readers are
    string-typed by contract (S1, reference dtype=str keep_default_na=False),
    and pre-casting keeps the comparison free of cross-engine literal
    formatting (timestamps, decimals). Quoted-empty-string vs NULL is
    engine-dependent CSV dialect (DuckDB allow_quoted_nulls) — that contract
    is pinned in tests/test_sources.py, so the synthetic frame uses NULLs,
    not empty strings."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from tabiya_livelihoods_classifier_spark.sources.readers import (
        read_csv_defensive,
        read_json_any,
    )

    failures: list[str] = []
    tmp = tempfile.mkdtemp(prefix="ingest-rt-")
    try:
        frames = {}
        for tbl in ("nation", "customer", "events", "documents"):
            src = spark.read.parquet(f"{sf_dir}/{tbl}.parquet")
            frames[tbl] = src.select(
                [F.col(c).cast("string").alias(c) for c in src.columns]
            )
        frames["gnarly"] = spark.createDataFrame(
            [
                ("1", 'he said "hi, there"', "a,b,c"),
                ("2", None, "line with 'single' quotes"),
                ("3", "unicode: éàß 中文 🚀", None),
                ("4", "trailing space ", " leading space"),
                ("5", "semi;colon\ttab", '""'),
            ],
            "id string, note string, extra string",
        )
        for tbl, s in frames.items():
            csv_dir = f"{tmp}/{tbl}_csv"
            json_dir = f"{tmp}/{tbl}_json"
            # escape='"' = RFC-4180 quote doubling, the dialect both
            # re-readers expect (see read_csv_defensive); whitespace
            # trimming is a WRITER default (ignore*WhiteSpace=true) that
            # silently mutates values — off, like the reference's to_csv
            s.coalesce(4).write.option("header", "true").option(
                "escape", '"'
            ).option("ignoreLeadingWhiteSpace", "false").option(
                "ignoreTrailingWhiteSpace", "false"
            ).mode("overwrite").csv(csv_dir)
            s.coalesce(4).write.mode("overwrite").json(json_dir)
            cols = s.columns
            want = normalize(s.collect(), cols)

            got = {}
            back_csv = read_csv_defensive(spark, csv_dir)
            got["spark_csv"] = (back_csv.collect(), back_csv.columns)
            # explicit all-string schema: a column that is null in every
            # row is dropped by the JSON writer, so inference can't see it
            schema = ", ".join(f"{c} string" for c in cols)
            good, bad = read_json_any(spark, json_dir, schema=schema)
            n_bad = bad.count()
            if n_bad:
                failures.append(f"ingest:{tbl}:json_corrupt({n_bad})")
            got["spark_json"] = (good.collect(), good.columns)
            rel = con.execute(
                f"SELECT * FROM read_csv('{csv_dir}/*.csv', header=true, "
                "all_varchar=true)"
            )
            got["duckdb_csv"] = (rel.fetchall(), [d[0] for d in rel.description])
            colspec = ", ".join(f"'{c}': 'VARCHAR'" for c in cols)
            rel = con.execute(
                f"SELECT * FROM read_json('{json_dir}/*.json', "
                f"format='newline_delimited', columns={{{colspec}}})"
            )
            got["duckdb_json"] = (rel.fetchall(), [d[0] for d in rel.description])

            bad_paths = []
            for path, (rows, rcols) in got.items():
                if sorted(rcols) != sorted(cols) or normalize(rows, rcols) != want:
                    bad_paths.append(path)
            status = "OK" if not bad_paths else f"FAIL ({','.join(bad_paths)})"
            print(f"{'ingest_rt_' + tbl:32s} rows={len(want):7d}x4 paths  {status}")
            failures.extend(f"ingest:{tbl}:{p}" for p in bad_paths)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return failures


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
    if not only:
        failures.extend(check_ingest(spark, con, sf_dir))
    print("FAILURES:", failures or "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
