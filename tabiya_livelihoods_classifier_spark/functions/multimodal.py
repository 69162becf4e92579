"""Multimodal (binary) column plumbing.

Media payloads are opaque ``binary`` columns with a typed metadata struct —
the engine moves/partitions/batches them; decode runs inside Arrow-batched
``mapInPandas`` stages. The image/audio libraries are not available in this
sandbox, so the DECODE step is stubbed two ways:

* `decode_media_meta` — deterministic fake decoder (md5-derived dims), so
  the Spark-side plumbing (binary Arrow transfer, schema, batch shape,
  partitioning) is real and testable end-to-end with a cross-engine oracle.
* `decode_image_real` — the real path: imports PIL lazily and raises
  ``NotImplementedError`` here; the UDF SIGNATURE and batch contract are
  identical, so swapping the fake for the real decoder is a one-line change.

MEDIA_META_SCHEMA intentionally mirrors what an image/audio probe returns:
(n_bytes, format, width, height, n_frames).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "doc_id long, n_bytes int, format string, width int, height int, "
    "n_frames int"
)

_FORMATS = ["png", "jpeg", "webp", "gif"]


def _fake_probe(payload: bytes) -> tuple[str, int, int, int]:
    """Deterministic stand-in for an image probe: derive (format, width,
    height, n_frames) from the payload's md5. Pure function of bytes —
    bit-stable across engines and runs."""
    d = hashlib.md5(payload).hexdigest()
    fmt = _FORMATS[int(d[0], 16) % len(_FORMATS)]
    width = 16 + int(d[1:5], 16) % 4080
    height = 16 + int(d[5:9], 16) % 2144
    n_frames = 1 + int(d[9:11], 16) % 30 if fmt == "gif" else 1
    return fmt, width, height, n_frames


def decode_media_meta(media: DataFrame) -> DataFrame:
    """mapInPandas over (doc_id long, payload binary): Arrow-batched fake
    decode. The plumbing — binary columns crossing the JVM/Python boundary
    in Arrow record batches, per-partition iteration, typed output — is the
    production shape; only `_fake_probe` is a stand-in."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            probes = [_fake_probe(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "format": [p[0] for p in probes],
                    "width": [p[1] for p in probes],
                    "height": [p[2] for p in probes],
                    "n_frames": [p[3] for p in probes],
                }
            )

    return media.mapInPandas(decode, schema=MEDIA_META_SCHEMA)


def decode_image_real(media: DataFrame) -> DataFrame:  # pragma: no cover
    """Real decoder path — identical contract to `decode_media_meta`.

    Gated behind an import-try per the sandbox rules; on a cluster with
    Pillow installed, replace the raise with `PIL.Image.open(BytesIO(p))`.
    """
    try:
        import PIL  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires Pillow; use decode_media_meta (the "
            "deterministic fake) in environments without it"
        ) from exc
    raise NotImplementedError("real decode wired on clusters with PIL")


def frame_sample(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling plumbing: explode n_frames into (doc_id, frame_idx)
    rows, keeping every `every_n`-th frame. The decode of individual frames
    would run in a downstream mapInPandas; the fan-out is pure relational."""
    meta = decode_media_meta(media)
    return meta.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_idx"),
    ).filter(F.col("frame_idx") % every_n == 0)
