"""Structured Streaming layer: AvailableNow incremental resume, session
windows (stream == batch), and the custom stateful operator."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from tabiya_livelihoods_classifier_spark.data.transcripts import (
    TRANSCRIPT_SCHEMA,
    generate_transcripts,
)
from tabiya_livelihoods_classifier_spark.streaming.incremental import (
    ingest_available_now,
    read_turn_stream,
)
from tabiya_livelihoods_classifier_spark.streaming.sessionize import (
    running_turn_totals,
    session_stats,
)


def _write_turn_file(spark, turns: pd.DataFrame, dest: str) -> None:
    spark.createDataFrame(turns, schema=TRANSCRIPT_SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(dest)


def test_available_now_exactly_once_resume(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    turns, _ = generate_transcripts("xs", seed=42)
    half = len(turns) // 2

    _write_turn_file(spark, turns.iloc[:half], src)
    ingest_available_now(spark, src, out, ckpt)
    n1 = spark.read.parquet(out).count()
    assert n1 == half

    # nothing new -> nothing processed (no duplicates on rerun)
    ingest_available_now(spark, src, out, ckpt)
    assert spark.read.parquet(out).count() == half

    # new file arrives -> ONLY it is drained
    _write_turn_file(spark, turns.iloc[half:], src)
    ingest_available_now(spark, src, out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() == len(turns)
    # canonicalization applied in-stream: no raw newlines survive
    assert got.filter(F.col("text").contains("\n")).count() == 0


def test_session_stats_stream_equals_batch(spark, tmp_path):
    src = str(tmp_path / "events_src")
    events = spark.createDataFrame(
        [
            (1, "2025-01-01 00:00:00"),
            (2, "2025-01-01 00:10:00"),   # same session (10 min gap)
            (3, "2025-01-01 00:40:00"),   # exactly 30 min after #2 => MERGES
            (4, "2025-01-01 02:00:00"),   # new session
        ],
        "event_id long, ts_s string",
    ).select(
        F.lit(7).alias("user_id"), "event_id", F.to_timestamp("ts_s").alias("ts")
    )
    events.coalesce(1).write.parquet(src)

    batch = session_stats(spark.read.parquet(src))
    got = {
        (r["first_event_id"]): r["n_events"] for r in batch.collect()
    }
    assert got == {1: 3, 4: 1}

    stream = session_stats(
        spark.readStream.schema("user_id int, event_id long, ts timestamp")
        .parquet(src),
        watermark="1 hour",
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    srows = spark.sql("select * from sess_stream").collect()
    assert {(r["first_event_id"]): r["n_events"] for r in srows} == got


def test_running_turn_totals_state_across_batches(spark, tmp_path):
    src = str(tmp_path / "turns_src")
    out = str(tmp_path / "totals_out")
    ckpt = str(tmp_path / "ckpt")
    turns, _ = generate_transcripts("xs", seed=7)
    conv = turns[turns.conv_id == turns.conv_id.iloc[0]]
    first, second = conv.iloc[:2], conv.iloc[2:]

    def drain():
        # memory sink can't recover from a checkpoint; foreachBatch + parquet
        # is the fault-tolerant sink shape used in production
        q = (
            running_turn_totals(read_turn_stream(spark, src))
            .writeStream.foreachBatch(
                lambda df, _id: df.write.mode("append").parquet(out)
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    _write_turn_file(spark, first, src)
    drain()
    r1 = spark.read.parquet(out).collect()
    assert max(r["n_turns"] for r in r1) == len(first)

    # second drain resumes the SAME state from the checkpoint
    _write_turn_file(spark, second, src)
    drain()
    r2 = spark.read.parquet(out).collect()
    assert max(r["n_turns"] for r in r2) == len(conv)
    assert max(r["max_turn_idx"] for r in r2) == int(conv.turn_idx.max())
