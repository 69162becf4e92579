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


# ---- M2: CRF Viterbi decode ----------------------------------------------


def _brute_force_best(em, tr, start, end):
    import itertools

    import numpy as np

    T, K = np.asarray(em).shape
    best, best_score = None, -np.inf
    for seq in itertools.product(range(K), repeat=T):
        s = start[seq[0]] + em[0][seq[0]] + end[seq[-1]]
        for t in range(1, T):
            s += tr[seq[t - 1]][seq[t]] + em[t][seq[t]]
        # strict > keeps the FIRST maximal sequence in lexicographic
        # product order == Viterbi's lower-index tie-break
        if s > best_score:
            best, best_score = list(seq), s
    return best, best_score


def test_crf_viterbi_matches_brute_force():
    import numpy as np

    from tabiya_livelihoods_classifier_spark.functions.extraction import (
        crf_viterbi_decode,
    )

    rng = np.random.default_rng(7)
    for trial in range(20):
        T, K = int(rng.integers(1, 6)), int(rng.integers(2, 5))
        em = rng.normal(size=(T, K)).round(3)
        tr = rng.normal(size=(K, K)).round(3)
        start = rng.normal(size=K).round(3)
        end = rng.normal(size=K).round(3)
        got = crf_viterbi_decode(em, tr, start, end)
        want, _ = _brute_force_best(em, tr, start, end)
        assert got == want, (trial, got, want)


def test_crf_viterbi_empty_and_single():
    import numpy as np

    from tabiya_livelihoods_classifier_spark.functions.extraction import (
        crf_viterbi_decode,
    )

    assert crf_viterbi_decode(np.zeros((0, 3)), np.zeros((3, 3))) == []
    assert crf_viterbi_decode([[0.0, 2.0, 1.0]], np.zeros((3, 3))) == [1]


def test_crf_bio_constraints_repair_greedy_output():
    """Emissions that greedily argmax to an ILLEGAL sequence (I- with no
    opener) decode to a legal one under the BIO transition matrix — the
    behavior that makes M2 a real decode rather than a per-token argmax."""
    import numpy as np

    from tabiya_livelihoods_classifier_spark.functions.extraction import (
        bio_transition_matrix,
        crf_viterbi_decode,
    )

    labels = ["O", "B-Skill", "I-Skill"]
    tr, start = bio_transition_matrix(labels)
    # greedy picks I-Skill at t=0 (illegal) and I-Skill at t=1
    em = np.array([[0.0, 0.4, 0.5], [0.0, 0.1, 0.9]])
    greedy = [int(np.argmax(e)) for e in em]
    assert [labels[i] for i in greedy] == ["I-Skill", "I-Skill"]
    path = [labels[i] for i in crf_viterbi_decode(em, tr, start)]
    # best LEGAL sequence: open with B-Skill, continue I-Skill
    assert path == ["B-Skill", "I-Skill"]


def test_crf_tagger_seam_in_mapinpandas(spark):
    """M2 end-to-end through the SAME extract_entities_df seam as the rule
    tagger: a deterministic emission function (lexicon-derived scores)
    + BIO-constrained Viterbi produces the entity rows."""
    import sys

    import numpy as np
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])

    from tabiya_livelihoods_classifier_spark.functions.extraction import (
        crf_tagger_factory,
        extract_entities_df,
    )

    labels = ["O", "B-Skill", "I-Skill"]
    lex = {"python": "Skill", "spark": "Skill"}

    def emissions(tokens):
        em = np.zeros((len(tokens), 3))
        prev_hit = False
        for t, tok in enumerate(tokens):
            if tok in lex:
                em[t, 2 if prev_hit else 1] = 5.0
                prev_hit = True
            else:
                em[t, 0] = 5.0
                prev_hit = False
        return em

    docs = spark.createDataFrame(
        [(1, "knows python spark well"), (2, "nothing here")],
        "doc_id long, text string",
    )
    rows = (
        extract_entities_df(
            docs, {}, tagger_factory=crf_tagger_factory(labels, emissions)
        )
        .orderBy("doc_id", "ent_idx")
        .collect()
    )
    assert [(r.doc_id, r.ent_type, r.ent_text) for r in rows] == [
        (1, "Skill", "python spark")
    ]
