"""T-invariant (BASELINE.json input_hint): per-turn text equality between the
Spark canonicalizer and the single-process reference canonicalizer, under
stable (conv_id, turn_idx) ordering."""

from __future__ import annotations

from tabiya_livelihoods_classifier_spark.data.transcripts import TRANSCRIPT_SCHEMA
from tabiya_livelihoods_classifier_spark.plans.oracle import reference_canonicalize
from tabiya_livelihoods_classifier_spark.plans.pipeline import canonical_turns


def test_per_turn_text_equality(spark, xs_corpus):
    turns, _ = xs_corpus
    tdf = spark.createDataFrame(turns, schema=TRANSCRIPT_SCHEMA)
    got = (
        canonical_turns(tdf)
        .orderBy("conv_id", "turn_idx")
        .select("conv_id", "turn_idx", "text")
        .collect()
    )
    expected = turns.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert len(got) == len(expected)
    for row, (_, erow) in zip(got, expected.iterrows()):
        assert row.conv_id == erow.conv_id
        assert row.turn_idx == erow.turn_idx
        assert row.text == reference_canonicalize(erow.text), (
            row.conv_id,
            row.turn_idx,
        )


def test_canonicalize_edge_cases(spark):
    cases = [None, "", "a\nb", "a\r\nb", "  a   b  ", "<b>x</b>\n\ty"]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], "i int, text string")
    got = {r.turn_idx: r.text for r in canonical_turns(
        df.selectExpr("cast(i as string) conv_id", "i as turn_idx",
                      "'user' role", "'' tool", "text",
                      "timestamp('2025-01-01') ts")
    ).collect()}
    for i, c in enumerate(cases):
        assert got[i] == reference_canonicalize(c)


def test_tokens_invariant_under_canonicalize(spark):
    """er_pipeline tokenizes the RAW text (pipeline.conversation_records
    token_source): sound only because tokens() output is identical with and
    without canonicalize_text — every character canonicalization rewrites is
    in the [^a-z0-9]+ split class. Pin that equivalence on adversarial
    whitespace/markup mixes (property check, exhaustive over the fixtures)."""
    from pyspark.sql import functions as F

    from tabiya_livelihoods_classifier_spark.functions.text import (
        canonicalize_text,
        tokens,
    )

    cases = [
        None, "", " ", "\n", "\t\r\n", "a", "a\nb", "a\r\n\tb",
        "  A   b  ", "x\n\n\n y\t\tz", "tab\ttab", "1.5%  rate\n",
        "<b>x</b>\n\ty", "a-b_c d", "\ta\n", "Ł\nż", "a  b\tc\rd\ne",
    ]
    # cross-product pairs to cover run boundaries across concatenation
    cases += [f"{a} {b}" for a in cases[:8] if a for b in cases[:8] if b]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i int, text string"
    )
    got = df.select(
        "i",
        tokens(F.col("text")).alias("raw_toks"),
        tokens(canonicalize_text("text")).alias("canon_toks"),
    ).collect()
    assert len(got) == len(cases)
    for r in got:
        assert r.raw_toks == r.canon_toks, (r.i, cases[r.i])
