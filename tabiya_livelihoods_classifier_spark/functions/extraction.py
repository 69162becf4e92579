"""Entity extraction surface (SURVEY §2.8 M1-M5, §2.5 T2).

The reference's extraction stack is a BERT token classifier followed by
pure-function post-processing. The post-processing contracts are
reimplemented here verbatim-in-semantics (NOT copied) and unit-tested
against hand-derived fixtures; the model forward pass (M1/M2) is replaced
by `rule_tagger`, a deterministic greedy dictionary tagger with the SAME
output contract (BIO tags over tokens), so the whole chain runs in this
sandbox with no downloads and is exactly reproducible. The CRF decode
itself (M2) IS implemented — `crf_viterbi_decode` is the reference's
`_viterbi_decode` (transformersCRF.py:226-306) as a numpy max-product DP,
with `bio_transition_matrix` hard constraints and `crf_tagger_factory`
wiring it into the same mapInPandas seam; only the EMISSION scores (the
transformer forward pass) remain the pluggable model seam on a real
cluster.

Reference contracts (file:line into /root/reference):
  M3 fix_bio_tags                 inference/linker.py:462-476
  M4 remove_special_tokens_and_tags  inference/linker.py:478-492
  M5 extract_entities (BIO->spans)   inference/linker.py:399-428
  T2 remove_duplicates_ordered       inference/linker.py:450-459

Known reference quirk, deliberately not reproduced: linker.py:474-475
applies the trailing "O, I- -> O" repair with the stale loop index `i`
(writing fixed_tags[i+1], i.e. the second-to-last slot, instead of the
last). We implement the rule as documented in its docstring — the LAST tag
is cleared — and note the divergence here for auditability.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# Default special tokens (transformer sentinels) for M4 — the reference
# derives these from the tokenizer (tokenizer.all_special_ids).
SPECIAL_TOKENS = {"[CLS]", "[SEP]", "[PAD]", "[MASK]", "[UNK]", "<s>", "</s>"}


def fix_bio_tags(tags: list[str]) -> list[str]:
    """M3: hand-crafted BIO repair rules (linker.py:462-476).

    * B-x, O, I-y   -> the O becomes the following I tag
    * O, I-x, O     -> the I becomes O
    * trailing O, I -> the trailing I becomes O (intended rule; see module
      docstring for the reference's off-by-one here)
    """
    fixed = list(tags)
    for i in range(len(tags) - 2):
        if tags[i].startswith("B-") and tags[i + 1] == "O" and tags[i + 2].startswith("I-"):
            fixed[i + 1] = tags[i + 2]
        if tags[i] == "O" and tags[i + 1].startswith("I-") and tags[i + 2] == "O":
            fixed[i + 1] = "O"
    # trailing rule evaluated on the REPAIRED sequence: a B,O,I tail was
    # already healed by rule 1 and must not be re-cleared (the reference
    # reads the raw tags here and, with its stale index, can undo rule 1 —
    # we order the rules coherently instead)
    if len(fixed) >= 2 and fixed[-2] == "O" and fixed[-1].startswith("I-"):
        fixed[-1] = "O"
    return fixed


def remove_special_tokens_and_tags(
    tokens: list[str], tags: list[str], special: set[str] = SPECIAL_TOKENS
) -> tuple[list[str], list[str]]:
    """M4: drop transformer sentinel tokens and their tags in lockstep
    (linker.py:478-492, generalized from token ids to surface strings)."""
    out_tok, out_tag = [], []
    for tok, tag in zip(tokens, tags):
        if tok not in special:
            out_tok.append(tok)
            out_tag.append(tag)
    return out_tok, out_tag


def extract_entities(tokens: list[str], tags: list[str]) -> list[dict]:
    """M5: BIO tag sequence -> entity spans (linker.py:399-428).

    Contract quirks preserved: consecutive tags of the SAME type merge into
    one entity even when the second is a fresh B- (the reference's
    acknowledged TODO), and empty-token entities are filtered at the end.
    """
    result: list[dict] = []
    current: dict | None = None
    for token, tag in zip(tokens, tags):
        tag_type, tag_label = tag.split("-", 1) if "-" in tag else ("O", tag)
        if tag_type != "O":
            if current and current["type"] == tag_label:
                current["tokens"].append(token)
            else:
                if current:
                    result.append(current)
                current = {"type": tag_label, "tokens": [token]}
        else:
            if current:
                result.append(current)
                current = None
    if current:
        result.append(current)
    return [e for e in result if len(e["tokens"]) != 0]


def remove_duplicates_ordered(xs: list) -> list:
    """T2: order-preserving dedupe (linker.py:450-459)."""
    seen: set = set()
    out = []
    for x in xs:
        if x not in seen:
            seen.add(x)
            out.append(x)
    return out


def rule_tagger(tokens: list[str], lexicon: dict[str, str]) -> list[str]:
    """M1/M2 stand-in: dictionary BIO tagger.

    `lexicon` maps token -> entity type. A token continues the previous
    entity (I-) when the previous token carried the same type, else starts
    one (B-). Deterministic, pure, and shaped exactly like the model path:
    list[token] -> list[BIO tag].
    """
    tags = []
    prev_type: str | None = None
    for tok in tokens:
        etype = lexicon.get(tok)
        if etype is None:
            tags.append("O")
            prev_type = None
        elif etype == prev_type:
            tags.append(f"I-{etype}")
        else:
            tags.append(f"B-{etype}")
            prev_type = etype
    return tags


def extract_pipeline(
    tokens: list[str], lexicon: dict[str, str], special: set[str] = SPECIAL_TOKENS
) -> list[dict]:
    """Full M1->M3->M4->M5 chain on one token list."""
    tags = rule_tagger(tokens, lexicon)
    tags = fix_bio_tags(tags) if tags else tags
    toks, tags = remove_special_tokens_and_tags(tokens, tags, special)
    return extract_entities(toks, tags)


ENTITY_ROWS_SCHEMA = (
    "doc_id long, ent_idx int, ent_type string, ent_text string"
)


def extract_entities_df(
    docs: DataFrame,
    lexicon: dict[str, str],
    text_col: str = "text",
    per_sentence: bool = False,
    tagger_factory=None,
    max_tokens: int | None = None,
) -> DataFrame:
    """mapInPandas extraction stage: (doc_id, text) -> one row per entity.

    The Arrow batch boundary is the ONLY Python crossing; tokenization,
    tagging, repair, and span assembly all happen inside it (the reference
    runs this per-document in a driver loop, 2_1_entity_extraction_loop.py:153).
    The lexicon is captured in the closure — at cluster scale it ships once
    per executor via task serialization (it is dim-table sized).

    `per_sentence=True` segments each document first (P2,
    functions.text.sentences — the linker.py:158 sent_tokenize analog) and
    tags sentence by sentence, exactly how the reference bounds transformer
    input: entities never span a sentence boundary; ent_idx keeps running
    document order.

    `tagger_factory` is the REAL-MODEL seam: a zero-arg callable returning
    a `tokens -> BIO tags` function, invoked ONCE per mapInPandas task
    (lazy per-partition init — where a production user constructs the
    transformer pipeline), never per document or per row. Default None
    keeps the deterministic dictionary tagger. `max_tokens` is the
    truncation guard (linker.py:233: the reference hard-truncates inputs
    past the encoder window): token lists are clipped BEFORE tagging, so an
    over-long unit degrades to its prefix instead of erroring.
    """
    import re

    from tabiya_livelihoods_classifier_spark.functions.text import sentences_py

    token_re = re.compile(r"[^a-z0-9]+")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-task model init (expensive for a real transformer) — amortized
        # over every batch and row this task processes
        if tagger_factory is not None:
            tag = tagger_factory()
        else:
            tag = lambda toks: rule_tagger(toks, lexicon)  # noqa: E731
        for pdf in batches:
            out = {"doc_id": [], "ent_idx": [], "ent_type": [], "ent_text": []}
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                units = sentences_py(text) if per_sentence else [text]
                ents = []
                for unit in units:
                    toks = [
                        t for t in token_re.split((unit or "").lower()) if t
                    ]
                    if max_tokens is not None:
                        toks = toks[:max_tokens]
                    tags = tag(toks)
                    tags = fix_bio_tags(tags) if tags else tags
                    toks, tags = remove_special_tokens_and_tags(toks, tags)
                    ents.extend(extract_entities(toks, tags))
                for i, ent in enumerate(ents):
                    out["doc_id"].append(doc_id)
                    out["ent_idx"].append(i)
                    out["ent_type"].append(ent["type"])
                    out["ent_text"].append(" ".join(ent["tokens"]))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "ent_idx": pd.Series(out["ent_idx"], dtype="int32"),
                    "ent_type": pd.Series(out["ent_type"], dtype="object"),
                    "ent_text": pd.Series(out["ent_text"], dtype="object"),
                }
            )

    return docs.mapInPandas(run, schema=ENTITY_ROWS_SCHEMA)


# --------------------------------------------------------------------------
# M2: linear-chain CRF Viterbi decode
# --------------------------------------------------------------------------


def crf_viterbi_decode(
    emissions,
    transitions,
    start_transitions=None,
    end_transitions=None,
) -> list[int]:
    """M2: max-product Viterbi over a linear-chain CRF — the real decode
    the reference runs after its BERT encoder (util/transformersCRF.py:
    226-306 `_viterbi_decode`), in numpy instead of torch so it needs no
    model wheels and slots into the mapInPandas tagger seam.

    score(y) = start[y_0] + sum_t emissions[t, y_t]
             + sum_t transitions[y_{t-1}, y_t] + end[y_T]

    Args are array-likes: emissions (T, K); transitions (K, K) with
    [from, to] orientation; start/end (K,) default to zeros. Returns the
    argmax tag-index sequence (length T; [] for T == 0). Ties break toward
    the LOWER tag index (np.argmax first-occurrence — same convention as
    the reference's torch.max). -inf transition entries express hard
    structural constraints (e.g. BIO: O can never precede I-x); a fully
    -inf column simply never wins.
    """
    import numpy as np

    em = np.asarray(emissions, dtype=np.float64)
    if em.size == 0:
        return []
    T, K = em.shape
    tr = np.asarray(transitions, dtype=np.float64)
    start = (
        np.zeros(K) if start_transitions is None
        else np.asarray(start_transitions, dtype=np.float64)
    )
    end = (
        np.zeros(K) if end_transitions is None
        else np.asarray(end_transitions, dtype=np.float64)
    )
    score = start + em[0]                       # (K,)
    history = np.empty((T - 1, K), dtype=np.int64) if T > 1 else None
    for t in range(1, T):
        # cand[i, j] = best score ending in i, then i -> j emitting t
        cand = score[:, None] + tr + em[t][None, :]
        history[t - 1] = np.argmax(cand, axis=0)
        score = np.max(cand, axis=0)
    last = int(np.argmax(score + end))
    path = [last]
    for t in range(T - 2, -1, -1):
        path.append(int(history[t][path[-1]]))
    return path[::-1]


def bio_transition_matrix(labels: list[str]):
    """(transitions, start) hard-constraint matrices for a BIO tag space:
    I-x may only follow B-x or I-x (and never starts a sequence); all
    legal moves score 0, illegal ones -inf. `labels` is the full tag
    vocabulary, e.g. ["O", "B-Skill", "I-Skill", ...]."""
    import numpy as np

    K = len(labels)
    tr = np.zeros((K, K))
    start = np.zeros(K)
    for j, to in enumerate(labels):
        if not to.startswith("I-"):
            continue
        etype = to[2:]
        start[j] = -np.inf
        for i, frm in enumerate(labels):
            if frm not in (f"B-{etype}", f"I-{etype}"):
                tr[i, j] = -np.inf
    return tr, start


def crf_tagger_factory(
    labels: list[str],
    emission_fn,
    transitions=None,
    start_transitions=None,
    end_transitions=None,
):
    """Real-CRF tagger seam for `extract_entities_df(tagger_factory=...)`:
    returns a zero-arg factory whose product maps tokens -> BIO tags via
    `crf_viterbi_decode`. `emission_fn(tokens) -> (T, K) array-like` is
    where a production user plugs the transformer forward pass
    (transformersCRF.py runs exactly this shape into `_viterbi_decode`);
    transitions default to the hard BIO-structural matrix, so the decoder
    REPAIRS sequences a greedy per-token argmax would emit invalid.
    """

    def factory():
        tr, start = (
            (transitions, start_transitions)
            if transitions is not None
            else bio_transition_matrix(labels)
        )
        if start_transitions is not None:
            start = start_transitions

        def tag(tokens: list[str]) -> list[str]:
            if not tokens:
                return []
            em = emission_fn(tokens)
            idx = crf_viterbi_decode(em, tr, start, end_transitions)
            return [labels[i] for i in idx]

        return tag

    return factory
