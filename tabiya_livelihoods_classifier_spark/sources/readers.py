"""Tolerant scan layer (SURVEY §2.1 S1-S6, §1.3 schema normalization).

The reference reads everything defensively — string-typed CSV, flexible
JSON that may be an array / NDJSON / wrapped object, case-insensitive
header detection. This module reproduces those tolerances at the ingest
boundary so the rest of the engine works with fixed, explicit schemas.

Reference precedents (file:line into /root/reference):
  S1 string-typed CSV           scripts/2_run_bert_classifier/2_2_clean_bert_results.py:118,317
  S2 JSON-array scan            scripts/3_llm_reranker/3_2a_clean_LLM_add_uuids_and_esco.py:88-150
  S3 NDJSON scan (tolerant)     3_2a_...py:63-75; 3_2b_clean_LLM_create_opp-db.py:145-158
  S4 format sniffer             3_2a_...py:153-190; 3_2b_...py:208-218
  S6 embedding table            inference/linker.py:430-447 (pickled tensors ->
                                parquet ArrayType(FloatType) table here)
  header normalization          2_2_...py:154-156; find_first_key 3_2a_...py:211-219
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_csv_defensive(
    spark: SparkSession, path: str, casts: dict[str, str] | None = None
) -> DataFrame:
    """S1: header CSV, every column string-typed (no NaN coercion — the
    reference's ``dtype=str, keep_default_na=False``), then explicit casts.

    ``casts`` maps canonical column name -> Spark type DDL. Column names are
    resolved case-insensitively (the reference uppercases taxonomy headers).
    """
    df = (
        spark.read.option("header", "true")
        .option("inferSchema", "false")  # strings only; casts are explicit
        .option("mode", "PERMISSIVE")
        # RFC-4180 quote doubling ("" inside a quoted field), the dialect
        # pandas/DuckDB emit and the reference's read_csv expects; Spark's
        # default escape is backslash, which mis-parses doubled quotes.
        .option("escape", '"')
        .csv(path)
    )
    if casts:
        for name, ddl in casts.items():
            col = resolve_column(df, name)
            if col is not None:
                df = df.withColumn(col, F.col(col).cast(ddl))
    return df


def resolve_column(df: DataFrame, *candidates: str) -> str | None:
    """find_first_key (3_2a_...py:211-219): first column whose lowercased
    name matches any lowercased candidate, in candidate order."""
    by_lower = {}
    for c in df.columns:
        by_lower.setdefault(c.lower(), c)
    for cand in candidates:
        hit = by_lower.get(cand.lower())
        if hit is not None:
            return hit
    return None


def normalize_headers(df: DataFrame, case: str = "lower") -> DataFrame:
    """Header normalization (2_2_...py:154-156 uppercases; we default lower)."""
    fn = str.lower if case == "lower" else str.upper
    return df.toDF(*[fn(c) for c in df.columns])


def sniff_json_format(path: str) -> str:
    """S4: 'array' if first non-whitespace byte is '[', 'object' if '{' and
    the whole file parses as one object wrapper, else 'ndjson'.

    Only the first KB is read — the sniff must not scan the file (the
    reference peeks the first char the same way, 3_2a_...py:160-166).
    """
    p = Path(path)
    target = p
    if p.is_dir():
        files = sorted(f for f in p.iterdir() if f.is_file())
        if not files:
            return "ndjson"
        target = files[0]
    head = target.read_bytes()[:1024].lstrip()
    if head.startswith(b"["):
        return "array"
    first_line = head.splitlines()[0] if head else b""
    if head.startswith(b"{") and not first_line.rstrip().endswith(b"}"):
        return "object"  # pretty-printed wrapper object
    return "ndjson"


def read_json_any(
    spark: SparkSession, path: str, schema: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """S2/S3/S4: read array-JSON or NDJSON by sniffing; tolerate bad lines.

    Returns (good_rows, corrupt_rows) — the corrupt side is the audit
    side-channel (reference logs and skips bad lines, 3_2a_...py:68-74).
    """
    fmt = sniff_json_format(path)
    reader = spark.read
    if schema:
        reader = reader.schema(schema + ", _corrupt_record string")
    else:
        reader = reader.option("columnNameOfCorruptRecord", "_corrupt_record")
    if fmt in ("array", "object"):
        reader = reader.option("multiLine", "true")
    df = reader.option("mode", "PERMISSIVE").json(path)
    if "_corrupt_record" not in df.columns:
        return df, df.limit(0).withColumn("_corrupt_record", F.lit(None).cast("string"))
    # Spark's JSON scan refuses filters that reference ONLY the internal
    # corrupt-record column; the documented workaround is to cache first.
    # Ingest-boundary tables are bounded, so this cache is cheap and is the
    # price of the audit side-channel.
    df = df.cache()
    good = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = df.filter(F.col("_corrupt_record").isNotNull()).select("_corrupt_record")
    return good, bad


def read_embedding_table(
    spark: SparkSession, path: str, dim: int | None = None
) -> DataFrame:
    """S6: parquet embedding table (vec_id, label, embedding array<float>).

    Replaces the reference's pickled torch tensors (linker.py:430-447) with
    a columnar table; `dim` asserts the embedding width via a cheap scan of
    one row (schema holds no array length).
    """
    df = spark.read.parquet(path)
    if dim is not None:
        row = df.select(F.size(F.col("embedding")).alias("d")).first()
        if row is not None and row["d"] != dim:
            raise ValueError(f"embedding dim {row['d']} != expected {dim}")
    return df
