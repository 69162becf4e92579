"""Incremental / restartable ingestion (SURVEY §2.9).

The reference has no streaming; what it has is restartable incremental
batch — skip-processed resume (2_1_entity_extraction_loop.py:89-132) and a
rerun-until-complete driver (3_1_LLM_pick_skills_full_details.py:684-721).
Structured Streaming's file source + ``Trigger.AvailableNow`` is the exact
Spark-native upgrade: the checkpoint tracks processed FILES, each run
drains only what arrived since the last run, then stops. Exactly-once
comes from the checkpoint + the file-sink manifest, not from fsync loops
(3_1_...py:120-129).

At 100 TB the same topology runs continuously (drop the trigger) with a
watermark on `ts`; nothing else changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tabiya_livelihoods_classifier_spark.data.transcripts import (
    TRANSCRIPT_SCHEMA,
)
from tabiya_livelihoods_classifier_spark.plans.pipeline import canonical_turns


def read_turn_stream(
    spark: SparkSession, src_dir: str, schema: str = TRANSCRIPT_SCHEMA
) -> DataFrame:
    """File-source stream of transcript turns (one parquet file per arrival).

    ``maxFilesPerTrigger`` stays unset: AvailableNow batches everything
    pending into rate-limited micro-batches on its own.
    """
    return spark.readStream.schema(schema).parquet(src_dir)


def ingest_available_now(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
) -> int:
    """Drain all pending source files through canonicalization into a
    parquet sink; return the number of micro-batches executed.

    Re-running after new files arrive processes ONLY the new files; re-running
    with nothing pending processes nothing (exactly-once resume — the
    streaming twin of plans/resumable.run_resumable).
    """
    canon = canonical_turns(read_turn_stream(spark, src_dir))
    query = (
        canon.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    progress = query.recentProgress
    return sum(1 for p in progress if p["numInputRows"] > 0)
