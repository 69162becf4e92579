"""Scalar text transforms (SURVEY §2.2 P1-P19) as JVM-side column expressions.

Everything in this module stays inside WholeStageCodegen — no Python in the
hot path. The single exception is NFKC normalization (`nfkc_casefold_udf`),
which Spark lacks as a built-in; it is an Arrow-batched pandas UDF used only
where full Unicode parity with the reference's ``norm_label``
(3_2b_clean_LLM_create_opp-db.py:224-227) matters.

Reference semantics reimplemented here (file:line into /root/reference):
  P1  newline normalize          inference/linker.py:147-150
  P3  whitespace collapse        scripts/1_import_jobs/1_1_...py:219-246
  P5  uuid normalize             scripts/2_run_bert_classifier/2_2_...py:89-93
  P6  label normalize (NFKC)     scripts/3_llm_reranker/3_2b_...py:224-227
  P8  id canonicalize "1.0"->"1" scripts/3_llm_reranker/3_2b_...py:405-432
  P9  digit strip                scripts/1_import_jobs/1_1_...py:128-132
  P10 salary numeric strip       scripts/1_import_jobs/1_1_...py:151-154
  P13 active flag                scripts/3_llm_reranker/3_2b_...py:447-456
  P14 EQF label parse            inference/evaluator.py:258-264
  P19 row hash                   scripts/3_llm_reranker/3_2b_...py:875-878
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tabiya_livelihoods_classifier_spark.config import ACTIVE_WINDOW_DAYS

# --------------------------------------------------------------------------
# P1/P3/P4: canonicalization. The per-turn text invariant (BASELINE.json
# input_hint) is defined by `canonicalize_text` == plans/oracle.py
# `reference_canonicalize` byte-for-byte.
# --------------------------------------------------------------------------


def canonicalize_text(col: Column | str) -> Column:
    """null -> '' ; newlines/CR/tabs -> space ; collapse runs of spaces ; trim.

    Mirrors linker.py:147-150 (``text.replace('\\n',' ')``, None guard) plus
    the whitespace collapse of 1_1_...py:228-236. Pure codegen expressions.
    """
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    # ONE regex pass: a maximal [\n\r\t ] run maps to a single space either
    # way (newline->space then space-collapse, or directly), but the fused
    # form scans + allocates the corpus-sized string column once, not twice.
    c = F.regexp_replace(c, r"[\n\r\t ]+", " ")
    return F.trim(c)


def norm_label(col: Column | str) -> Column:
    """Codegen-side label normalization: canonicalize + lower.

    ``lower`` approximates casefold for the ASCII fixtures (SURVEY §2.2 P6);
    use `nfkc_casefold_udf` when full Unicode parity is required.
    """
    return F.lower(canonicalize_text(col))


@F.pandas_udf(T.StringType())
def nfkc_casefold_udf(s: pd.Series) -> pd.Series:
    """NFKC + casefold (reference norm_label 3_2b...py:224-227), Arrow-batched."""
    return s.fillna("").map(lambda x: unicodedata.normalize("NFKC", x).casefold())


def nfkc_casefold_py(text: str | None) -> str:
    """Single-process twin of `nfkc_casefold_udf` for the oracle/tests."""
    return unicodedata.normalize("NFKC", text or "").casefold()


# --------------------------------------------------------------------------
# Tokenization / shingling — shared by blocking, Jaccard, and text stats.
# --------------------------------------------------------------------------

TOKEN_SPLIT_RE = r"[^a-z0-9]+"


def tokens(col: Column | str, *, lowercase: bool = True) -> Column:
    """array<string> of alnum tokens (lowercased), empty strings removed.

    Deliberately does NOT run `canonicalize_text` first: every character
    canonicalization touches (newline/CR/tab/space runs) is in the
    [^a-z0-9]+ split class anyway, so the token output is identical with
    or without it — and skipping it removes two corpus-wide regex passes
    from the hottest branch of the ER records stage (the token explode)."""
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    if lowercase:
        c = F.lower(c)
    return F.filter(F.split(c, TOKEN_SPLIT_RE), lambda t: t != "")


SENTENCE_RE = r"[^.!?]+[.!?]*"


def sentences(col: Column | str) -> Column:
    """P2: deterministic sentence tokenizer -> array<string>.

    Contract analog of the reference's ``sent_tokenize`` call
    (inference/linker.py:158): the text is segmented at sentence-terminator
    runs ('.', '!', '?'), each sentence keeps its terminator, surrounding
    whitespace is trimmed, and empty segments are dropped. A regex extractor
    (not nltk) so the SAME semantics run as one codegen expression in Spark
    and as `regexp_extract_all` in the DuckDB oracle — terminator-less text
    comes back as a single sentence, matching sent_tokenize.
    """
    c = canonicalize_text(col)
    segs = F.regexp_extract_all(c, F.lit(SENTENCE_RE), 0)
    # NOTE: must be a 1-arg lambda — F.trim itself has an optional second
    # parameter, so transform() would bind it as (element, index) and the
    # index would become the trim-character set (a silent no-op).
    trimmed = F.transform(segs, lambda s: F.trim(s))
    return F.filter(trimmed, lambda s: s != "")


def sentences_py(text: str | None) -> list[str]:
    """Single-process twin of `sentences` for the oracle/tests."""
    import re as _re

    t = _re.sub(r"[\n\r\t]", " ", text or "")
    t = _re.sub(r" {2,}", " ", t).strip()
    segs = _re.findall(SENTENCE_RE, t)
    return [s.strip() for s in segs if s.strip()]


def shingles(tok_col: Column, width: int) -> Column:
    """Word w-shingles as space-joined strings; whole-doc fallback if shorter.

    Built by zipping `width` shifted slices of the token array — each zip_with
    pass is a single O(n) array walk in codegen'd Catalyst expressions.
    CRITICAL plan property: `tok_col` is referenced a CONSTANT number of
    times. A transform-over-index formulation (element_at(tok_col, i) per
    index) references it once PER ELEMENT — after Catalyst's CollapseProject
    inlines an upstream tokenize expression, that re-runs the regexp split
    O(tokens) times per row (measured ~4x slowdown at sf0.1; the zip_with
    form also beats an aggregate-HOF sliding window ~2.4x because aggregate
    is interpreted with per-step struct/array-copy allocation).
    """
    n_sh = F.size(tok_col) - (width - 1)
    joined = F.slice(tok_col, 1, n_sh)
    for off in range(1, width):
        joined = F.zip_with(
            joined,
            F.slice(tok_col, off + 1, n_sh),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return F.when(F.size(tok_col) >= width, F.array_distinct(joined)).otherwise(
        F.array(F.array_join(tok_col, " "))
    )


# --------------------------------------------------------------------------
# Misc scalar transforms (P5, P8-P10, P13-P14, P19)
# --------------------------------------------------------------------------


def norm_uuid(col: Column | str) -> Column:
    """P5: strip + lowercase (2_2...py:89-93)."""
    return F.lower(F.trim(F.col(col) if isinstance(col, str) else col))


def canon_id(col: Column | str) -> Column:
    """P8: "123.0" -> "123", null -> "" (3_2b...py:405-432)."""
    c = F.trim((F.col(col) if isinstance(col, str) else col).cast("string"))
    stripped = F.regexp_replace(c, r"\.0+$", "")
    return F.coalesce(stripped, F.lit(""))


def digits_only(col: Column | str) -> Column:
    """P9: keep digits, cast long (1_1...py:128-132)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"\D", "").cast("long")


def numeric_strip(col: Column | str) -> Column:
    """P10: keep [0-9.], cast double (1_1...py:151-154)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"[^0-9.]", "").cast("double")


def active_flag(
    ts_col: Column | str, now_col: Column, window_days: int = ACTIVE_WINDOW_DAYS
) -> Column:
    """P13: active iff ts within `window_days` of `now_col` (3_2b...py:447-456).

    `now_col` is an explicit column (e.g. max(ts) over the corpus) rather than
    current_timestamp() so runs are deterministic and oracle-comparable.
    """
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return F.when(c.isNull(), F.lit(True)).otherwise(
        F.datediff(now_col, c) <= window_days
    )


def eqf_level(col: Column | str) -> Column:
    """P14: last char of label -> double, fallback 0.0 (evaluator.py:258-264)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(F.substring(c, -1, 1).cast("double"), F.lit(0.0))


def row_hash(*cols: Column | str) -> Column:
    """P19: stable row hash over id columns — sha256 of '|'-joined values.

    (Reference uses sha1, 3_2b...py:875-878; sha256 chosen because both Spark
    and DuckDB expose it for oracle parity.)
    """
    parts = [
        F.coalesce((F.col(c) if isinstance(c, str) else c).cast("string"), F.lit(""))
        for c in cols
    ]
    return F.sha2(F.concat_ws("|", *parts), 256)
