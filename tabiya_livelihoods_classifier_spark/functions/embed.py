"""Deterministic feature-hashing sentence embedder + cosine-similarity exprs.

Replaces the reference's SentenceTransformer encode (inference/linker.py:
203-204, 386) with a seeded, download-free embedder (FIXTURES.md §4): each
token hashes (md5) to a dimension and a sign; the vector is L2-normalized.
The SAME numpy function backs the Spark pandas UDF and the single-process
oracle, so top-k cosine results are bit-stable across both.

The real-model path stays pluggable: anything exposing
``encode(batch: list[str]) -> np.ndarray`` can be swapped in behind
`embed_udf`'s signature (one Arrow batch in, one out).

Cosine between two array<float/double> columns is also provided as a pure
column expression (`cosine_expr`) built on zip_with/aggregate HOFs — that is
the JVM-side fast path used when both vectors are already columns (e.g. the
ANN queries over the `embeddings` table).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tabiya_livelihoods_classifier_spark.config import EMBED_DIM

_TOKEN_RE = r"[^a-z0-9]+"


def _token_slot(token: str, dim: int) -> tuple[int, float]:
    """(dimension index, sign) for a token — md5-derived, seed-free."""
    h = hashlib.md5(token.encode("utf-8")).digest()
    idx = int.from_bytes(h[:4], "big") % dim
    sign = 1.0 if h[4] & 1 else -1.0
    return idx, sign


def embed_text(text: str | None, dim: int = EMBED_DIM) -> np.ndarray:
    """Single-text embedding (float64, L2-normalized). Oracle + UDF share this."""
    import re

    vec = np.zeros(dim, dtype=np.float64)
    toks = [t for t in re.split(_TOKEN_RE, (text or "").lower()) if t]
    for tok in toks:
        idx, sign = _token_slot(tok, dim)
        vec[idx] += sign
    n = np.linalg.norm(vec)
    return vec / n if n > 0 else vec


def embed_batch(texts: pd.Series, dim: int = EMBED_DIM) -> np.ndarray:
    """(len(texts), dim) float64 matrix."""
    return np.stack([embed_text(t, dim) for t in texts])


@F.pandas_udf(T.ArrayType(T.DoubleType()))
def embed_udf(texts: pd.Series) -> pd.Series:
    """Arrow-batched embedding UDF: string -> array<double>[EMBED_DIM]."""
    mat = embed_batch(texts)
    return pd.Series(list(mat))


def make_embed_udf(model_factory):
    """Real-model seam: a pandas UDF around any ``encode(list[str]) ->
    (n, dim) ndarray`` model, with LAZY PER-TASK initialization.

    The iterator-of-Series form is the documented Spark pattern for
    expensive state: ``model_factory()`` runs once when the task's first
    Arrow batch arrives (a production user constructs the
    SentenceTransformer there — linker.py:203-204), then every batch reuses
    it. Swapping the deterministic hashing embedder for a real encoder is
    exactly `make_embed_udf(lambda: SentenceTransformer(...))` — no other
    pipeline change.
    """

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        model = model_factory()  # once per task, NOT per batch or row
        for texts in batches:
            mat = np.asarray(model.encode(list(texts)), dtype=np.float64)
            yield pd.Series(list(mat))

    return _udf


def cosine_expr(a: Column, b: Column) -> Column:
    """JVM-side cosine similarity of two array<numeric> columns.

    zip_with + aggregate keep this inside codegen; elements are cast to
    double so float32 inputs are widened before accumulation (deterministic
    left-to-right summation — matches a sequential-sum oracle).
    """
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(ad, bd, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(F.aggregate(ad, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(bd, F.lit(0.0), lambda acc, x: acc + x * x))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def cosine_batch(q: np.ndarray, mat: np.ndarray) -> np.ndarray:
    """Batched cosine of one query (dim,) against a matrix (n, dim).

    Vectorized twin of the reference's util.cos_sim (linker.py:307); inputs
    are assumed L2-normalized (embed_text guarantees it), so this is a matvec.
    """
    return mat @ q
