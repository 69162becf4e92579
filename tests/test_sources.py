"""Tolerant scan layer (sources/readers.py) + sink ops (sources/sinks.py)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from tabiya_livelihoods_classifier_spark.sources.readers import (
    normalize_headers,
    read_csv_defensive,
    read_json_any,
    resolve_column,
    sniff_json_format,
)
from tabiya_livelihoods_classifier_spark.sources.sinks import (
    append_new_keys,
    compact_last_wins,
    split_audit,
)


def test_defensive_csv_string_typed_then_cast(spark, tmp_path):
    p = tmp_path / "jobs.csv"
    # NA must stay the STRING 'NA' (reference: keep_default_na=False), and
    # numeric-ish columns stay strings unless an explicit cast asks
    p.write_text("ID,PreFFered_Label,Salary\n1.0,chef,1000\nNA,NA,\n")
    df = read_csv_defensive(spark, str(p))
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "string", "string", "string"
    ]
    rows = {r["ID"]: r for r in df.collect()}
    assert rows["NA"]["PreFFered_Label"] == "NA"

    df2 = read_csv_defensive(spark, str(p), casts={"salary": "double"})
    assert dict(df2.dtypes)["Salary"] == "double"


def test_resolve_column_case_insensitive(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("PREFERREDLABEL,uuid\nx,y\n")
    df = read_csv_defensive(spark, str(p))
    # candidate order wins; misspelled reference variant resolves too
    assert resolve_column(df, "preferredlabel", "label") == "PREFERREDLABEL"
    assert resolve_column(df, "missing", "UUID") == "uuid"
    assert resolve_column(df, "nope") is None
    assert normalize_headers(df).columns == ["preferredlabel", "uuid"]


def test_sniff_and_read_json_array_vs_ndjson(spark, tmp_path):
    arr = tmp_path / "a.json"
    arr.write_text(json.dumps([{"k": 1}, {"k": 2}]))
    nd = tmp_path / "b.ndjson"
    nd.write_text('{"k": 1}\n\n{"k": 2}\n{bad json\n')

    assert sniff_json_format(str(arr)) == "array"
    assert sniff_json_format(str(nd)) == "ndjson"

    good, bad = read_json_any(spark, str(arr))
    assert sorted(r["k"] for r in good.collect()) == [1, 2]

    good, bad = read_json_any(spark, str(nd))
    assert sorted(r["k"] for r in good.collect()) == [1, 2]
    assert bad.count() == 1  # the bad line lands in the audit side


def test_compact_last_wins(spark):
    df = spark.createDataFrame(
        [("u1", "a", 1, 10), ("u1", "a", 2, 20), ("u1", "b", 3, 5)],
        "k string, t string, seq int, v int",
    )
    out = compact_last_wins(df, keys=["k", "t"], order=[F.col("seq")])
    got = {(r["k"], r["t"]): r["v"] for r in out.collect()}
    assert got == {("u1", "a"): 20, ("u1", "b"): 5}


def test_split_audit_and_append_new_keys(spark):
    df = spark.createDataFrame(
        [(1, "ok"), (2, ""), (3, "ok")], "id int, label string"
    )
    ok, audit = split_audit(df, F.col("label") != "")
    assert ok.count() == 2 and audit.count() == 1

    existing = spark.createDataFrame([(1,)], "id int")
    fresh = append_new_keys(df, existing, ["id"])
    assert sorted(r["id"] for r in fresh.collect()) == [2, 3]
    assert append_new_keys(df, None, ["id"]).count() == 3
