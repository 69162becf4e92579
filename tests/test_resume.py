"""T-resume: kill after stage-k commit, rerun, identical final clusters and
exactly-once lineage (north rule: resumable from checkpoint with
per-partition lineage + metrics)."""

from __future__ import annotations

import pytest

from tabiya_livelihoods_classifier_spark.config import ERConfig
from tabiya_livelihoods_classifier_spark.data.transcripts import TRANSCRIPT_SCHEMA
from tabiya_livelihoods_classifier_spark.plans.pipeline import er_pipeline
from tabiya_livelihoods_classifier_spark.plans.resumable import (
    StageFailure,
    run_resumable,
)
from tabiya_livelihoods_classifier_spark.storage import StageStore


def test_kill_rerun_resumes_and_matches(spark, xs_corpus, tmp_path):
    turns_pd, _gold = xs_corpus
    turns = spark.createDataFrame(turns_pd, schema=TRANSCRIPT_SCHEMA)
    store = StageStore(spark, tmp_path / "store")
    cfg = ERConfig()

    # run 1: dies right after the 'pairs' commit
    with pytest.raises(StageFailure):
        run_resumable(
            spark, turns, store, cfg, input_id="xs", fail_after="pairs"
        )
    for st in ("canon", "records", "signatures", "membership", "pairs"):
        assert (store.root / st / "MANIFEST.json").exists(), st
    for st in ("scored", "edges", "clusters"):
        assert not (store.root / st).exists(), st

    # run 2: resumes — recomputes ONLY the un-committed stages
    out = run_resumable(spark, turns, store, cfg, input_id="xs")
    assert out["_computed"] == ["scored", "edges", "clusters"]

    resumed = {r.rid: r.component for r in out["clusters"].collect()}
    fresh = {
        r.rid: r.component
        for r in er_pipeline(spark, turns, cfg)["clusters"].collect()
    }
    assert resumed == fresh

    # exactly-once lineage: per-partition rows sum to the manifest row count
    for st in ("canon", "records", "signatures", "membership", "pairs",
               "scored", "edges", "clusters"):
        mf = store.manifest(st)
        lin = store.lineage(st).collect()
        assert sum(r.rows for r in lin) == mf["rows"], st
        assert len({r.partition_file for r in lin}) == len(lin), st
        assert all(r.params_hash == mf["params_hash"] for r in lin), st

    # metrics table has one row per stage
    stages = [m["stage"] for m in store.metrics()]
    assert sorted(stages) == sorted(
        ["canon", "records", "signatures", "membership", "pairs", "scored",
         "edges", "clusters"]
    )


def test_config_change_invalidates_downstream(spark, xs_corpus, tmp_path):
    turns_pd, _gold = xs_corpus
    turns = spark.createDataFrame(turns_pd, schema=TRANSCRIPT_SCHEMA)
    store = StageStore(spark, tmp_path / "store2")
    run_resumable(spark, turns, store, ERConfig(), input_id="xs")

    # a different threshold must dirty EVERY stage's hash chain (the chain
    # includes the full config), so nothing stale is ever served
    out = run_resumable(
        spark, turns, store, ERConfig(match_threshold=0.9), input_id="xs"
    )
    assert out["_computed"] == list(
        ("canon", "records", "signatures", "membership", "pairs", "scored",
         "edges", "clusters")
    )


def test_submit_entrypoint(spark, tmp_path, xs_corpus):
    """plans/submit.py end-to-end: write input, run main(), resume is a
    no-op second time (stages_computed empty)."""
    import io
    import json
    from contextlib import redirect_stdout

    from tabiya_livelihoods_classifier_spark.data.transcripts import (
        TRANSCRIPT_SCHEMA,
    )
    from tabiya_livelihoods_classifier_spark.plans import submit

    turns_pd, _ = xs_corpus
    src = str(tmp_path / "turns")
    spark.createDataFrame(turns_pd, schema=TRANSCRIPT_SCHEMA).write.parquet(src)
    args = [
        "--input", src,
        "--output", str(tmp_path / "out"),
        "--store", str(tmp_path / "stages"),
        "--input-id", "t1",
        "--checkpoint-dir", str(tmp_path / "ckpt"),
    ]
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert submit.main(args) == 0
    r1 = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert r1["clusters_rows"] == 60
    assert "clusters" in r1["stages_computed"]

    buf = io.StringIO()
    with redirect_stdout(buf):
        assert submit.main(args) == 0
    r2 = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert r2["clusters_rows"] == 60
    assert r2["stages_computed"] == []  # full resume, nothing recomputed
