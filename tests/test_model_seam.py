"""Real-model integration seam: a stateful mock "transformer" (expensive
init, call-counting) is injected through the SAME signatures the
deterministic stand-ins use — `make_embed_udf` (linker.py:203-204
SentenceTransformer analog) and `extract_entities_df(tagger_factory=...)`
(the BERT tagger analog) — proving the swap path a production user takes:

  1. model init happens ONCE per task/partition, never per row or batch
     (lazy init inside the iterator pandas UDF / mapInPandas generator);
  2. encode() receives Arrow BATCHES (many rows per call);
  3. the truncation guard clips token streams before tagging
     (linker.py:233: inputs past the encoder window are hard-truncated).

The mocks log init/call events to a shared tmp dir (local mode: executors
see the driver's filesystem), which is the only sandbox-visible way to
observe per-worker state from outside the workers.
"""

from __future__ import annotations

import os
import sys
import uuid

import numpy as np
from pyspark.sql import functions as F

# Executors cannot import test modules by name — ship the mock classes by
# value inside the serialized closures instead of by module reference.
from pyspark import cloudpickle

cloudpickle.register_pickle_by_value(sys.modules[__name__])

from tabiya_livelihoods_classifier_spark.functions.embed import make_embed_udf
from tabiya_livelihoods_classifier_spark.functions.extraction import (
    extract_entities_df,
    rule_tagger,
)


def _mark(log_dir: str, kind: str, n: int = 0) -> None:
    path = os.path.join(
        log_dir, f"{kind}-{os.getpid()}-{uuid.uuid4().hex}"
    )
    with open(path, "w") as f:
        f.write(str(n))


def _events(log_dir: str, kind: str) -> list[int]:
    out = []
    for name in os.listdir(log_dir):
        if name.startswith(f"{kind}-"):
            with open(os.path.join(log_dir, name)) as f:
                out.append(int(f.read()))
    return out


class CountingEncoder:
    """Mock SentenceTransformer: expensive-init stand-in with the exact
    ``encode(list[str]) -> (n, dim) ndarray`` contract."""

    DIM = 4

    def __init__(self, log_dir: str) -> None:
        _mark(log_dir, "init")
        self.log_dir = log_dir

    def encode(self, texts: list[str]) -> np.ndarray:
        _mark(self.log_dir, "encode", len(texts))
        out = np.zeros((len(texts), self.DIM), dtype=np.float64)
        out[:, 0] = [float(len(t or "")) for t in texts]
        return out


def test_embed_seam_one_init_per_task_many_batches(spark, tmp_path):
    log_dir = str(tmp_path / "enc")
    os.mkdir(log_dir)
    udf = make_embed_udf(lambda: CountingEncoder(log_dir))
    n, parts = 2000, 4
    df = spark.range(n).repartition(parts).select(
        F.concat(F.lit("text-"), F.col("id")).alias("txt")
    )
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "100")
    try:
        rows = df.select(F.col("txt"), udf("txt").alias("v")).collect()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    assert len(rows) == n
    assert all(len(r.v) == CountingEncoder.DIM for r in rows)
    assert all(r.v[0] == float(len(r.txt)) for r in rows)

    inits = _events(log_dir, "init")
    encodes = _events(log_dir, "encode")
    # lazy per-task init: at most one per partition — NOT per batch/row
    assert 1 <= len(inits) <= parts, inits
    # batch behavior: ~500 rows/partition at 100/batch -> many encode calls,
    # each carrying a full Arrow batch, covering every row exactly once
    assert len(encodes) >= 2 * len(inits), (len(encodes), len(inits))
    assert max(encodes) <= 100
    assert sum(encodes) == n


class CountingTagger:
    """Mock transformer tagger: tokens -> BIO tags with init/call logging;
    delegates to the dictionary tagger so outputs stay deterministic."""

    def __init__(self, log_dir: str, lexicon: dict[str, str]) -> None:
        _mark(log_dir, "init")
        self.log_dir = log_dir
        self.lexicon = lexicon

    def __call__(self, tokens: list[str]) -> list[str]:
        _mark(self.log_dir, "tag", len(tokens))
        return rule_tagger(tokens, self.lexicon)


_LEX = {"join": "Operator", "scan": "Operator", "vector": "Structure"}


def test_tagger_seam_matches_default_path(spark, tmp_path):
    log_dir = str(tmp_path / "tag")
    os.mkdir(log_dir)
    n, parts = 300, 3
    docs = spark.range(n).repartition(parts).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("vector join scan row "), F.col("id")).alias("text"),
    )
    injected = extract_entities_df(
        docs, _LEX, tagger_factory=lambda: CountingTagger(log_dir, _LEX)
    )
    default = extract_entities_df(docs, _LEX)
    got = sorted(map(tuple, injected.collect()))
    want = sorted(map(tuple, default.collect()))
    # contract parity: the injected model path produces EXACTLY what the
    # stand-in produces (same post-processing chain around the model)
    assert got == want and len(got) == 2 * n  # "vector" + "join scan" spans

    inits = _events(log_dir, "init")
    tags = _events(log_dir, "tag")
    assert 1 <= len(inits) <= parts, inits
    assert len(tags) == n  # one forward pass per unit, counted per doc


def test_truncation_guard_clips_before_tagging(spark):
    docs = spark.createDataFrame(
        [(1, "vector join scan")], "doc_id long, text string"
    )
    full = extract_entities_df(docs, _LEX).collect()
    assert [(r.ent_type, r.ent_text) for r in full] == [
        ("Structure", "vector"), ("Operator", "join scan"),
    ]
    # encoder-window analog: only the first max_tokens tokens are tagged —
    # the over-long tail degrades to its prefix instead of erroring
    clipped = extract_entities_df(docs, _LEX, max_tokens=2).collect()
    assert [(r.ent_type, r.ent_text) for r in clipped] == [
        ("Structure", "vector"), ("Operator", "join"),
    ]
