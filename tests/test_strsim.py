"""String-metric parity: our Jaro-Winkler vs DuckDB's built-in (the oracle
engine), and Spark built-in levenshtein vs DuckDB levenshtein."""

from __future__ import annotations

import random

import duckdb
import pytest

from tabiya_livelihoods_classifier_spark.functions.strsim import (
    jaccard_py,
    jaro_winkler,
)


def _rand_word(rng: random.Random) -> str:
    n = rng.randrange(0, 12)
    return "".join(rng.choice("abcdefg hij") for _ in range(n))


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_jaro_winkler_matches_duckdb(seed):
    rng = random.Random(seed)
    con = duckdb.connect()
    cases = [("", ""), ("a", ""), ("", "a"), ("martha", "marhta"),
             ("dixon", "dicksonx"), ("abc", "abc"), ("head chef", "head cehf")]
    cases += [(_rand_word(rng), _rand_word(rng)) for _ in range(300)]
    for a, b in cases:
        want = con.execute(
            "select jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        got = jaro_winkler(a, b)
        assert abs(got - want) < 1e-12, (a, b, got, want)


def test_levenshtein_spark_vs_duckdb(spark):
    con = duckdb.connect()
    rng = random.Random(7)
    rows = [(i, _rand_word(rng), _rand_word(rng)) for i in range(200)]
    df = spark.createDataFrame(rows, "i int, a string, b string")
    got = {
        r.i: r.d
        for r in df.selectExpr("i", "levenshtein(a, b) d").collect()
    }
    for i, a, b in rows:
        want = con.execute("select levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert got[i] == want, (a, b)


def test_jaccard_py():
    assert jaccard_py({"a", "b"}, {"b", "c"}) == 1 / 3
    assert jaccard_py(set(), set()) == 0.0
    assert jaccard_py({"a"}, {"a"}) == 1.0
