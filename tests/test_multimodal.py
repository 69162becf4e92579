"""Multimodal binary-column plumbing (functions/multimodal.py)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from tabiya_livelihoods_classifier_spark.functions.multimodal import (
    _fake_probe,
    decode_image_real,
    decode_media_meta,
    frame_sample,
)


def _media(spark):
    docs = spark.createDataFrame(
        [(1, "a tiny payload"), (2, "another blob of bytes"), (3, "")],
        "doc_id long, text string",
    )
    return docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))


def test_decode_media_meta_deterministic(spark):
    out = decode_media_meta(_media(spark)).collect()
    assert len(out) == 3
    by_id = {r["doc_id"]: r for r in out}
    # matches the pure-python probe bit-for-bit
    fmt, w, h, nf = _fake_probe(b"a tiny payload")
    assert (by_id[1]["format"], by_id[1]["width"], by_id[1]["height"]) == (
        fmt, w, h,
    )
    assert by_id[1]["n_bytes"] == len(b"a tiny payload")
    # schema contract
    assert dict(decode_media_meta(_media(spark)).dtypes) == {
        "doc_id": "bigint", "n_bytes": "int", "format": "string",
        "width": "int", "height": "int", "n_frames": "int",
    }


def test_probe_ranges():
    for payload in (b"", b"x", hashlib.md5(b"seed").digest() * 3):
        fmt, w, h, nf = _fake_probe(payload)
        assert fmt in ("png", "jpeg", "webp", "gif")
        assert 16 <= w < 16 + 4080 and 16 <= h < 16 + 2144
        assert nf == 1 if fmt != "gif" else 1 <= nf <= 30


def test_frame_sample_fanout(spark):
    frames = frame_sample(_media(spark), every_n=2).collect()
    metas = {r["doc_id"]: r for r in decode_media_meta(_media(spark)).collect()}
    for doc_id, meta in metas.items():
        expected = len(range(0, meta["n_frames"], 2))
        got = sum(1 for f in frames if f["doc_id"] == doc_id)
        assert got == expected


def test_real_decoder_is_gated(spark):
    with pytest.raises(NotImplementedError):
        decode_image_real(_media(spark))
