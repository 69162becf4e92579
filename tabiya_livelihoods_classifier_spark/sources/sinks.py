"""Sink-side operators (SURVEY §2.1 S8-S13).

Atomic stage commits + lineage live in ``storage.StageStore``; this module
adds the row-level sink semantics the reference implements by hand:

  S12 compaction (NDJSON -> last-wins by key)   3_1_LLM_pick_skills_full_details.py:185-215
  S13 unmapped-audit side output                3_2b_clean_LLM_create_opp-db.py:306-323
  S8  append-resume (skip already-written keys) 2_1_entity_extraction_loop.py:89-132
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def compact_last_wins(
    df: DataFrame, keys: list[str], order: list[Column]
) -> DataFrame:
    """S12: one row per key, the LAST occurrence wins.

    ``order`` columns define recency ascending (e.g. [col('ts'),
    col('line_no')]); ties must be broken explicitly or the compaction is
    nondeterministic (SURVEY §7.4 determinism risk).
    """
    w = Window.partitionBy(*keys).orderBy(*[c.desc() for c in order])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def split_audit(
    df: DataFrame, ok_predicate: Column
) -> tuple[DataFrame, DataFrame]:
    """S13: route rows failing a mapping/validity predicate to an audit
    side-output instead of dropping them silently."""
    return df.filter(ok_predicate), df.filter(~ok_predicate)


def append_new_keys(
    incoming: DataFrame, existing: DataFrame | None, keys: list[str]
) -> DataFrame:
    """S8/J11: anti-join resume — keep only rows whose key is not already in
    the committed output. Exactly-once by idempotent key, not by fsync."""
    if existing is None:
        return incoming
    done = existing.select(*keys).dropDuplicates()
    return incoming.join(done, keys, "left_anti")
