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


def test_torn_stage_write_never_served(spark, xs_corpus, tmp_path):
    """Crash injection (Iceberg-snapshot discipline over the parquet
    fallback): a writer that died BETWEEN data publish and manifest write
    (torn manifest .tmp), or mid-write (stale _tmp dir, partial data) must
    leave the stage uncommitted; resume recomputes it and never reads the
    torn bytes, and the final clusters match a clean run bit-for-bit."""
    import json
    import shutil

    turns_pd, _gold = xs_corpus
    turns = spark.createDataFrame(turns_pd, schema=TRANSCRIPT_SCHEMA)
    store = StageStore(spark, tmp_path / "torn")
    cfg = ERConfig()
    run_resumable(spark, turns, store, cfg, input_id="xs")
    clean = {
        r.rid: r.component for r in store.read("clusters").collect()
    }

    # tear 'scored': kill its manifest (crash before the manifest rename),
    # leave a half-written manifest .tmp, drop one data file and add a
    # garbage part (torn parquet dir), plus a stale writer tmp dir
    sdir = store.root / "scored"
    mf = sdir / "MANIFEST.json"
    (sdir / "MANIFEST.tmp").write_text('{"params_hash": "TRUNCAT')
    phash_before = json.loads(mf.read_text())["params_hash"]
    mf.unlink()
    parts = sorted((sdir / "data").glob("*.parquet"))
    if parts:
        parts[0].unlink()
    (sdir / "data" / "part-junk.parquet").write_bytes(b"\x00not-parquet")
    stale_tmp = store.root / "_tmp_scored_99999"
    stale_tmp.mkdir()
    (stale_tmp / "part-00000.parquet").write_bytes(b"\x00half")

    assert not store.is_committed("scored", phash_before)

    out = run_resumable(spark, turns, store, cfg, input_id="xs")
    # only the torn stage recomputes: downstream manifests chain params
    # hashes (not content), and their committed inputs predate the tear
    assert out["_computed"] == ["scored"]
    # the re-commit atomically replaced the torn dir: junk gone, readable
    datafiles = [p.name for p in (store.root / "scored" / "data").iterdir()]
    assert "part-junk.parquet" not in datafiles
    assert store.is_committed("scored", phash_before)
    resumed = {r.rid: r.component for r in store.read("clusters").collect()}
    assert resumed == clean
    # stale writer tmp from the crashed attempt is inert (never read)
    assert stale_tmp.exists()


def test_partial_data_without_manifest_is_uncommitted(spark, tmp_path):
    """A data dir alone (crash after the data rename, before ANY manifest)
    is not a commit: is_committed is False for every hash and a fresh
    commit over it succeeds."""
    store = StageStore(spark, tmp_path / "torn2")
    sdir = store.root / "stage_x"
    (sdir / "data").mkdir(parents=True)
    (sdir / "data" / "part-00000.parquet").write_bytes(b"\x00torn")
    assert not store.is_committed("stage_x", "anyhash")

    df = spark.range(5).toDF("v")
    committed = store.commit("stage_x", df, "h1")
    assert committed.count() == 5
    assert store.is_committed("stage_x", "h1")
    assert sorted(r.v for r in store.read("stage_x").collect()) == [0, 1, 2, 3, 4]


def test_checkpoint_gc_reclaims_superseded_iterations(spark):
    """Checkpoint hygiene proof (VERDICT r5 #4): the iterative CC loop
    reliably checkpoints EVERY iteration's labels; with
    spark.cleaner.referenceTracking.cleanCheckpoints=true (session.py) each
    superseded iteration's files must be deleted once its RDD is
    unreachable — otherwise a long battery accumulates corpus-sized files
    in the (tmpfs, in the bench harness) checkpoint dir for the whole
    session lifetime. The distributed hash-min loop is forced via the
    driver-stitch gate, a 400-node chain drives >= 3 pointer-doubled
    iterations, and after dropping references the rdd-* checkpoint dirs
    must return to (near) the pre-run count — bounded, not monotonic."""
    import gc
    import time
    from pathlib import Path

    from tabiya_livelihoods_classifier_spark.operators import clustering

    ckpt = spark.sparkContext.getCheckpointDir()
    assert ckpt is not None
    root = Path(ckpt.removeprefix("file:"))

    def rdd_dirs():
        return {p for p in root.rglob("rdd-*") if p.is_dir()}

    def run_cc_once():
        edges = spark.createDataFrame(
            [(f"n{i:04d}", f"n{i + 1:04d}") for i in range(400)],
            "id_a string, id_b string",
        )
        out = clustering.connected_components(edges)
        comps = {r.component for r in out.collect()}
        assert comps == {"n0000"}  # one chain, min-id representative

    baseline = rdd_dirs()
    # "the loop really checkpointed" is proven by a spy on the checkpoint
    # call itself, NOT by counting surviving rdd-* dirs after the runs:
    # when the suite runs with a memory-pressured JVM, natural GC lets the
    # ContextCleaner reclaim superseded iteration checkpoints WHILE the
    # loop is still running — the exact behavior under test — so a
    # surviving-dir count is racy against the feature working correctly.
    try:  # Spark 4: the runtime class overrides checkpoint, patch IT
        from pyspark.sql.classic.dataframe import DataFrame as _DF
    except ImportError:  # pragma: no cover - Spark 3 fallback
        from pyspark.sql import DataFrame as _DF

    checkpoint_calls = []
    orig_checkpoint = _DF.checkpoint

    def spy_checkpoint(self, eager=True):
        checkpoint_calls.append(eager)
        return orig_checkpoint(self, eager=eager)

    old_probe = clustering._PROBE_ROWS
    old_gate = clustering.DRIVER_STITCH_MAX_BYTES
    clustering._PROBE_ROWS = 0
    clustering.DRIVER_STITCH_MAX_BYTES = 0  # forces the distributed loop
    _DF.checkpoint = spy_checkpoint
    try:
        for _ in range(2):  # twice: growth must not compound across runs
            run_cc_once()
    finally:
        _DF.checkpoint = orig_checkpoint
        clustering._PROBE_ROWS = old_probe
        clustering.DRIVER_STITCH_MAX_BYTES = old_gate

    after_run = rdd_dirs()
    # >= 3 barrier checkpoints + >= 1 loop iteration per run: the test
    # exercised real accumulation pressure before asserting reclaim
    assert len(checkpoint_calls) >= 8, checkpoint_calls

    # drop every reference, then force both collectors until the async
    # ContextCleaner has deleted the superseded checkpoint dirs (generous
    # deadline: py4j finalizers + the JVM reference queue + the cleaner
    # thread are all asynchronous, and a loaded host can stretch each hop)
    deadline = time.time() + 150
    residual = None
    while time.time() < deadline:
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        spark.sparkContext._jvm.System.runFinalization()
        residual = rdd_dirs() - baseline
        # one dir per run may linger (the final composed labels, released
        # only on deeper GC cycles); the superseded ITERATION checkpoints
        # (>= 4 per run) are what must be reclaimed
        if len(residual) <= 2:
            break
        time.sleep(0.5)
    assert residual is not None and len(residual) <= 2, (
        f"{len(residual)} superseded checkpoint dirs not reclaimed "
        f"(baseline {len(baseline)}, after run {len(after_run)})"
    )

def test_footer_and_distributed_lineage_agree(spark, tmp_path, monkeypatch):
    """StageStore.commit computes per-partition lineage from parquet
    footers when the output file count is within FOOTER_LINEAGE_MAX_FILES,
    and from a distributed input_file_name aggregate above it. Both paths
    must publish the SAME snapshot (file set, per-file rows, totals) — the
    fallback is a scale valve, not a different contract."""
    from tabiya_livelihoods_classifier_spark import storage

    df = (
        spark.range(1000)
        .selectExpr("id", "id % 7 AS k", "md5(cast(id as string)) AS payload")
        .repartition(5, "k")
    )

    footer_store = StageStore(spark, tmp_path / "footer")
    footer_store.commit("s", df, "ph1")

    monkeypatch.setattr(storage, "FOOTER_LINEAGE_MAX_FILES", 0)
    dist_store = StageStore(spark, tmp_path / "dist")
    dist_store.commit("s", df, "ph1")

    def snapshot(store):
        lin = sorted(
            # part index only: the writer UUID in the basename differs
            # between the two (independent) commits
            (r.partition_file.rsplit("/", 1)[-1].split("-")[1],
             r.rows, r.stage, r.params_hash)
            for r in store.lineage("s").collect()
        )
        mf = store.manifest("s")
        return lin, mf["rows"], mf["n_files"]

    f_lin, f_rows, f_files = snapshot(footer_store)
    d_lin, d_rows, d_files = snapshot(dist_store)
    assert f_rows == d_rows == 1000
    assert f_files == d_files == len(f_lin)
    assert f_lin == d_lin
    # committed data identical and re-readable through both stores
    assert footer_store.read("s").count() == dist_store.read("s").count() == 1000
