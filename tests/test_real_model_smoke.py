"""Optional real-model smoke: run the seams with ACTUAL checkpoints.

The deterministic stand-ins (hashing embedder, dictionary tagger) are the
sandbox defaults; `make_embed_udf` / `crf_tagger_factory` are the documented
production swap points (reference: inference/linker.py:203-204 encode,
util/transformersCRF.py forward->viterbi). This module proves the swap runs
end-to-end when real libraries + local weights exist, and skips cleanly
when they don't (this sandbox ships neither the wheels nor network access):

- ``SPARK_GRAFT_ST_MODEL``  -> local sentence-transformers checkpoint dir
- ``SPARK_GRAFT_HF_TOKEN_CLS`` -> local HF token-classification checkpoint

Nothing here asserts model QUALITY — only the integration contract: lazy
per-task init, Arrow batching, schema of the outputs, and that the CRF
decoder accepts a real forward pass's emission matrix.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def _local_dir_env(var: str) -> str:
    path = os.environ.get(var)
    if not path or not os.path.isdir(path):
        pytest.skip(f"{var} not set to a local checkpoint dir")
    return path


def test_embed_udf_with_real_sentence_transformer(spark):
    st = pytest.importorskip("sentence_transformers")
    path = _local_dir_env("SPARK_GRAFT_ST_MODEL")
    from tabiya_livelihoods_classifier_spark.functions.embed import (
        make_embed_udf,
    )

    udf = make_embed_udf(
        lambda: st.SentenceTransformer(path, device="cpu")
    )
    df = spark.createDataFrame(
        [("carpenter",), ("data analyst",), ("",)], "text string"
    ).withColumn("emb", udf("text"))
    rows = df.collect()
    dims = {len(r["emb"]) for r in rows}
    assert len(dims) == 1 and dims.pop() > 0  # fixed model dim, every row
    assert all(isinstance(v, float) for v in rows[0]["emb"])


def test_crf_tagger_with_real_token_classifier(spark):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    path = _local_dir_env("SPARK_GRAFT_HF_TOKEN_CLS")
    from tabiya_livelihoods_classifier_spark.functions.extraction import (
        crf_tagger_factory,
        extract_entities_df,
    )

    tok = transformers.AutoTokenizer.from_pretrained(path)
    model = transformers.AutoModelForTokenClassification.from_pretrained(path)
    model.eval()
    labels = [model.config.id2label[i] for i in range(model.config.num_labels)]

    def emission_fn(tokens):
        # word-level emissions: first-subtoken logits per word, the
        # standard BIO alignment (linker.py's tagger does the same)
        enc = tok(
            tokens,
            is_split_into_words=True,
            return_tensors="pt",
            truncation=True,
        )
        with torch.no_grad():
            logits = model(**enc).logits[0]
        word_ids = enc.word_ids(0)
        first = {}
        for pos, wid in enumerate(word_ids):
            if wid is not None and wid not in first:
                first[wid] = pos
        import numpy as np

        return np.stack(
            [logits[first[w]].numpy() for w in range(len(tokens))]
        ).astype(np.float64)

    factory = crf_tagger_factory(labels, emission_fn)
    df = spark.createDataFrame(
        [(1, "looking for an experienced carpenter in nairobi")],
        "doc_id long, text string",
    )
    out = extract_entities_df(df, {}, tagger_factory=factory).collect()
    # contract only: runs end-to-end, rows are well-formed entity spans
    for r in out:
        assert r["ent_type"] and r["ent_text"]
        assert r["ent_idx"] >= 0
