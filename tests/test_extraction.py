"""T-unit parity: extraction pure functions vs hand-derived reference
behavior (contracts cited in functions/extraction.py)."""

from __future__ import annotations

from tabiya_livelihoods_classifier_spark.functions.extraction import (
    extract_entities,
    extract_entities_df,
    extract_pipeline,
    fix_bio_tags,
    remove_duplicates_ordered,
    remove_special_tokens_and_tags,
    rule_tagger,
)


def test_fix_bio_tags_rules():
    # B, O, I -> the O adopts the following I tag (linker.py:470-471)
    assert fix_bio_tags(["B-Skill", "O", "I-Skill"]) == [
        "B-Skill", "I-Skill", "I-Skill"
    ]
    # O, I, O -> the I becomes O (linker.py:472-473)
    assert fix_bio_tags(["O", "I-Skill", "O"]) == ["O", "O", "O"]
    # trailing O, I -> trailing I cleared (intended linker.py:474-475 rule)
    assert fix_bio_tags(["B-Skill", "O", "O", "I-Skill"]) == [
        "B-Skill", "O", "O", "O"
    ]
    # no-ops stay intact
    assert fix_bio_tags(["B-Skill", "I-Skill", "O"]) == ["B-Skill", "I-Skill", "O"]
    assert fix_bio_tags(["O"]) == ["O"]
    assert fix_bio_tags([]) == []


def test_extract_entities_contract():
    toks = ["plan", "menus", "and", "head", "chef", "duties"]
    tags = ["B-Skill", "I-Skill", "O", "B-Occupation", "I-Occupation", "O"]
    assert extract_entities(toks, tags) == [
        {"type": "Skill", "tokens": ["plan", "menus"]},
        {"type": "Occupation", "tokens": ["head", "chef"]},
    ]
    # reference TODO quirk: consecutive same-type B- merges (linker.py:412)
    assert extract_entities(["a", "b"], ["B-Skill", "B-Skill"]) == [
        {"type": "Skill", "tokens": ["a", "b"]}
    ]
    # type switch without O splits
    assert extract_entities(["a", "b"], ["B-Skill", "B-Occupation"]) == [
        {"type": "Skill", "tokens": ["a"]},
        {"type": "Occupation", "tokens": ["b"]},
    ]
    # trailing open entity flushes
    assert extract_entities(["a"], ["I-Skill"]) == [
        {"type": "Skill", "tokens": ["a"]}
    ]


def test_remove_special_tokens_and_tags():
    toks, tags = remove_special_tokens_and_tags(
        ["[CLS]", "chef", "[SEP]"], ["O", "B-Occupation", "O"]
    )
    assert toks == ["chef"] and tags == ["B-Occupation"]


def test_remove_duplicates_ordered():
    assert remove_duplicates_ordered([3, 1, 3, 2, 1]) == [3, 1, 2]
    assert remove_duplicates_ordered([]) == []


def test_rule_tagger_bio_shape():
    lex = {"head": "Occupation", "chef": "Occupation", "plan": "Skill"}
    assert rule_tagger(["the", "head", "chef", "can", "plan"], lex) == [
        "O", "B-Occupation", "I-Occupation", "O", "B-Skill"
    ]
    # full chain
    ents = extract_pipeline(["the", "head", "chef", "can", "plan"], lex)
    assert ents == [
        {"type": "Occupation", "tokens": ["head", "chef"]},
        {"type": "Skill", "tokens": ["plan"]},
    ]


def test_extract_entities_df(spark):
    docs = spark.createDataFrame(
        [(1, "the head chef will plan menus"), (2, "nothing here")],
        "doc_id long, text string",
    )
    lex = {"head": "Occupation", "chef": "Occupation",
           "plan": "Skill", "menus": "Skill"}
    rows = extract_entities_df(docs, lex).collect()
    got = [(r.doc_id, r.ent_idx, r.ent_type, r.ent_text) for r in rows]
    assert sorted(got) == [
        (1, 0, "Occupation", "head chef"),
        (1, 1, "Skill", "plan menus"),
    ]


def test_sentences_parity_and_contract(spark):
    """P2 (linker.py:158 analog): Spark `sentences` == `sentences_py` on
    probes; terminators kept, terminator-less text is one sentence."""
    from pyspark.sql import functions as F

    from tabiya_livelihoods_classifier_spark.functions.text import (
        sentences,
        sentences_py,
    )

    probes = [
        "One. Two! Three?",
        "no terminator at all",
        "  spaced.   out!  ",
        "dots... ellipsis! tail",
        "",
        None,
        "line\nbreaks. and\ttabs!",
    ]
    df = spark.createDataFrame([(p,) for p in probes], "text string")
    got = [r.ss for r in df.select(sentences(F.col("text")).alias("ss")).collect()]
    want = [sentences_py(p) for p in probes]
    assert got == want
    assert want[0] == ["One.", "Two!", "Three?"]
    assert want[1] == ["no terminator at all"]
    assert want[3] == ["dots...", "ellipsis!", "tail"]


def test_extract_per_sentence_bounds_spans(spark):
    """per_sentence=True must not merge an entity across a sentence
    boundary; whole-doc mode does (same type, adjacent tokens)."""
    docs = spark.createDataFrame(
        [(1, "head chef. chef cooks")], "doc_id long, text string"
    )
    lex = {"head": "Occupation", "chef": "Occupation"}
    whole = [
        (r.ent_idx, r.ent_text)
        for r in extract_entities_df(docs, lex).collect()
    ]
    split = [
        (r.ent_idx, r.ent_text)
        for r in extract_entities_df(docs, lex, per_sentence=True).collect()
    ]
    assert whole == [(0, "head chef chef")]
    assert split == [(0, "head chef"), (1, "chef")]
