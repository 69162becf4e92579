"""Incremental ER update (streaming/incremental_er.py): the frozen-
vocabulary + block-local-rescore fast path must EQUAL the full batch
recompute, generation after generation, and must refuse (not silently
diverge) when the delta moves the corpus vocabulary."""

from __future__ import annotations

import datetime as dt

import pytest

from tabiya_livelihoods_classifier_spark.data.transcripts import (
    TRANSCRIPT_SCHEMA,
    generate_transcripts,
)
from tabiya_livelihoods_classifier_spark.plans.pipeline import er_pipeline
from tabiya_livelihoods_classifier_spark.streaming.incremental_er import (
    ERStateStore,
    StopSetDriftError,
    commit_er_state,
    compact,
    incremental_er_update,
)


def _spark_turns(spark, turns_pdf):
    return spark.createDataFrame(turns_pdf, schema=TRANSCRIPT_SCHEMA)


def _clusters_dict(df):
    return {r.rid: r.component for r in df.collect()}


def _split_xs(spark, seed=42):
    """Deterministic 80/20 split of the xs corpus by conversation BLOCK.

    The generator assigns entities round-robin (conv i -> entity i % 12),
    so splitting on a residue of the conv INDEX removes whole entities
    from the base slice and genuinely drifts the corpus vocabulary (the
    drift gate refuses, correctly). Splitting on blocks of 12 removes one
    conversation of EVERY entity — document frequencies stay proportional
    and the frozen-vocabulary fast path applies, which is also the
    steady-state shape of a production delta."""
    turns, gold = generate_transcripts("xs", seed)
    idx = turns["conv_id"].str.extract(r"(\d+)$")[0].astype(int)
    block = idx // 12
    base = turns[block % 5 != 0]
    delta = turns[block % 5 == 0]
    return (
        _spark_turns(spark, turns),
        _spark_turns(spark, base),
        _spark_turns(spark, delta),
    )


def _conv(cid, phrase, n_turns=4):
    ts = dt.datetime(2024, 1, 1)
    return [
        (cid, i, "user", f"looking for {phrase} role", "", ts)
        for i in range(n_turns)
    ]


def test_incremental_equals_full_recompute(spark, tmp_path):
    all_t, base_t, delta_t = _split_xs(spark)
    full = _clusters_dict(er_pipeline(spark, all_t)["clusters"])

    store = ERStateStore(spark, tmp_path / "state")
    commit_er_state(spark, store, base_t)
    base_clusters = _clusters_dict(store.clusters())
    # sanity: generation 0 equals the batch pipeline on the base slice
    assert base_clusters == _clusters_dict(er_pipeline(spark, base_t)["clusters"])

    report = incremental_er_update(spark, store, delta_t)
    assert report["stop_stable"] is True
    assert report["generation"] == 1
    inc = _clusters_dict(store.clusters())
    assert inc == full

    # work-bound: the rescore set and affected components are not the
    # whole corpus re-run in disguise
    n_sigs = store.signatures().count()
    assert 0 < report["n_rescore_sigs"] <= n_sigs
    assert report["n_affected_components"] <= len(set(base_clusters.values()))
    assert report["n_delta_records"] == delta_t.select("conv_id").distinct().count()


def test_two_generations_equal_full(spark, tmp_path):
    turns, _ = generate_transcripts("xs", seed=42)
    block = turns["conv_id"].str.extract(r"(\d+)$")[0].astype(int) // 12
    # entity-uniform blocks (see _split_xs), schedule chosen so the stop
    # sets are stable at BOTH generations (a boundary token like
    # 'engineer' sits within noise of the 30% record-DF threshold on this
    # tiny corpus; other schedules legitimately trip the drift gate)
    part0 = turns[block.isin([1, 2, 3])]
    part1 = turns[block == 4]
    part2 = turns[block == 0]

    store = ERStateStore(spark, tmp_path / "state")
    commit_er_state(spark, store, _spark_turns(spark, part0))
    incremental_er_update(spark, store, _spark_turns(spark, part1))
    r2 = incremental_er_update(spark, store, _spark_turns(spark, part2))
    assert r2["generation"] == 2

    full = _clusters_dict(
        er_pipeline(spark, _spark_turns(spark, turns))["clusters"]
    )
    assert _clusters_dict(store.clusters()) == full
    # append-only records fold sees every conversation exactly once
    assert store.records().count() == turns["conv_id"].nunique()
    assert store.records().select("rid").distinct().count() == turns[
        "conv_id"
    ].nunique()
    # durability: a FRESH store handle (new process in real life) resolves
    # the same generation pointer and folds to the same clusters
    reopened = ERStateStore(spark, tmp_path / "state")
    assert reopened.generation() == 2
    assert _clusters_dict(reopened.clusters()) == full


def test_new_member_updates_component_representative(spark, tmp_path):
    """A delta record with a smaller rid joining an existing cluster must
    move the min-rid representative for EVERY member — exactly as the full
    recompute would."""
    entities = [
        "senior rust engineer", "marine wildlife photographer",
        "clinical data scientist", "heritage stone mason",
        "pediatric speech therapist", "quantum optics researcher",
        "urban transit planner", "artisan cheese maker",
        "forensic fire investigator", "alpine rescue paramedic",
        "industrial loom mechanic", "coastal erosion surveyor",
    ]
    base_rows = []
    for i, e in enumerate(entities):
        base_rows += _conv(f"b{i:02d}", e)
    base_rows += _conv("a2", entities[0]) + _conv("a3", entities[0])
    delta_rows = _conv("a1", entities[0]) + _conv("d9", "volcanic soil agronomist")

    store = ERStateStore(spark, tmp_path / "state")
    commit_er_state(
        spark, store, spark.createDataFrame(base_rows, TRANSCRIPT_SCHEMA)
    )
    base = _clusters_dict(store.clusters())
    assert base["a2"] == base["a3"] == min("a2", "b00", base["a2"])

    incremental_er_update(
        spark, store, spark.createDataFrame(delta_rows, TRANSCRIPT_SCHEMA)
    )
    inc = _clusters_dict(store.clusters())
    full = _clusters_dict(
        er_pipeline(
            spark,
            spark.createDataFrame(base_rows + delta_rows, TRANSCRIPT_SCHEMA),
        )["clusters"]
    )
    assert inc == full
    assert inc["a1"] == inc["a2"] == inc["a3"] == "a1"
    assert inc["d9"] == "d9"  # new entity -> new singleton cluster


def test_stop_set_drift_refuses(spark, tmp_path):
    base_rows = []
    for i in range(13):
        base_rows += _conv(f"b{i:02d}", f"entity alpha{i} beta{i}")
    # a 5-conversation delta that floods 'zebra' into >20% of the combined
    # turns: the frozen vocabulary can no longer reproduce full recompute
    delta_rows = []
    for i in range(5):
        delta_rows += _conv(f"d{i:02d}", f"zebra gamma{i} delta{i}")

    store = ERStateStore(spark, tmp_path / "state")
    commit_er_state(
        spark, store, spark.createDataFrame(base_rows, TRANSCRIPT_SCHEMA)
    )
    with pytest.raises(StopSetDriftError) as ei:
        incremental_er_update(
            spark, store, spark.createDataFrame(delta_rows, TRANSCRIPT_SCHEMA)
        )
    assert "zebra" in ei.value.drifted
    # refused update publishes nothing: state still at generation 0
    assert store.generation() == 0

    # the documented recovery: compaction on the combined corpus
    combined = spark.createDataFrame(base_rows + delta_rows, TRANSCRIPT_SCHEMA)
    compact(spark, store, combined)
    assert store.generation() == 0
    assert _clusters_dict(store.clusters()) == _clusters_dict(
        er_pipeline(spark, combined)["clusters"]
    )


def test_rid_collision_refuses(spark, tmp_path):
    _, base_t, _ = _split_xs(spark)
    store = ERStateStore(spark, tmp_path / "state")
    commit_er_state(spark, store, base_t)
    with pytest.raises(ValueError, match="already exist"):
        incremental_er_update(spark, store, base_t.limit(4))
    assert store.generation() == 0


def test_streaming_available_now_folds_new_files_only(spark, tmp_path):
    """er_update_available_now: each run drains ONLY the files that
    arrived since the last run (file-source checkpoint), folds them as one
    generation, and an empty rerun publishes nothing."""
    from tabiya_livelihoods_classifier_spark.streaming.incremental_er import (
        er_update_available_now,
    )

    turns, _ = generate_transcripts("xs", seed=42)
    block = turns["conv_id"].str.extract(r"(\d+)$")[0].astype(int) // 12
    part0 = turns[block.isin([1, 2, 3])]
    part1 = turns[block == 4]
    part2 = turns[block == 0]

    store = ERStateStore(spark, tmp_path / "state")
    commit_er_state(spark, store, _spark_turns(spark, part0))

    src = tmp_path / "arrivals"
    ckpt = str(tmp_path / "stream_ckpt")
    src.mkdir()
    _spark_turns(spark, part1).coalesce(1).write.mode("append").parquet(
        str(src)
    )
    r1 = er_update_available_now(spark, store, str(src), ckpt)
    assert [r["generation"] for r in r1] == [1]

    # nothing new -> nothing processed, no generation published
    assert er_update_available_now(spark, store, str(src), ckpt) == []
    assert store.generation() == 1

    _spark_turns(spark, part2).coalesce(1).write.mode("append").parquet(
        str(src)
    )
    r2 = er_update_available_now(spark, store, str(src), ckpt)
    assert [r["generation"] for r in r2] == [2]

    full = _clusters_dict(
        er_pipeline(spark, _spark_turns(spark, turns))["clusters"]
    )
    assert _clusters_dict(store.clusters()) == full


def test_empty_delta_is_a_noop_generation(spark, tmp_path):
    _, base_t, _ = _split_xs(spark)
    store = ERStateStore(spark, tmp_path / "state")
    commit_er_state(spark, store, base_t)
    before = _clusters_dict(store.clusters())

    report = incremental_er_update(spark, store, base_t.limit(0))
    assert report["generation"] == 1
    assert report["n_delta_records"] == 0
    assert _clusters_dict(store.clusters()) == before


def test_crash_mid_update_leaves_state_readable_and_retryable(
    spark, tmp_path, monkeypatch
):
    """The generation pointer is published LAST: a crash after some of the
    new generation's stages are committed must leave the old generation
    fully readable, and a plain retry must succeed and match the batch
    pipeline (half-written stages are simply overwritten)."""
    from tabiya_livelihoods_classifier_spark.streaming import (
        incremental_er as IE,
    )

    all_t, base_t, delta_t = _split_xs(spark)
    store = ERStateStore(spark, tmp_path / "state")
    commit_er_state(spark, store, base_t)
    base_clusters = _clusters_dict(store.clusters())

    real_commit = IE.ERStateStore.commit_part

    def crashing(self, gen, part, df, ph):
        if part == "edges":  # mid-update, after several stages landed
            raise RuntimeError("injected crash")
        return real_commit(self, gen, part, df, ph)

    monkeypatch.setattr(IE.ERStateStore, "commit_part", crashing)
    with pytest.raises(RuntimeError, match="injected crash"):
        incremental_er_update(spark, store, delta_t)
    monkeypatch.setattr(IE.ERStateStore, "commit_part", real_commit)

    # old generation intact and fully readable
    assert store.generation() == 0
    assert _clusters_dict(store.clusters()) == base_clusters

    # plain retry succeeds and equals the batch recompute
    report = incremental_er_update(spark, store, delta_t)
    assert report["generation"] == 1
    assert _clusters_dict(store.clusters()) == _clusters_dict(
        er_pipeline(spark, all_t)["clusters"]
    )


def test_state_stages_carry_lineage(spark, tmp_path):
    """Every generation's stages go through StageStore.commit, so the
    state inherits the per-partition lineage + metrics contract."""
    _, base_t, delta_t = _split_xs(spark)
    store = ERStateStore(spark, tmp_path / "state")
    commit_er_state(spark, store, base_t)
    incremental_er_update(spark, store, delta_t)
    lin = store.store.lineage().where("stage like 'er_g1_%'")
    stages = {r.stage for r in lin.select("stage").distinct().collect()}
    assert {"er_g1_clusters", "er_g1_edges", "er_g1_signatures"} <= stages
    rows = store.store.lineage("er_g1_clusters").groupBy().sum("rows").collect()
    assert rows[0][0] == store.read_part(1, "clusters").count()


def test_compaction_under_live_pointer_is_crash_safe(
    spark, tmp_path, monkeypatch
):
    """compact() builds the fresh base under the NEXT epoch's stage names,
    so a crash mid-compaction leaves the live chain untouched (pointer,
    stages, clusters, records fold); a retry succeeds; and a later
    incremental update keeps working under the new epoch."""
    from tabiya_livelihoods_classifier_spark.streaming import (
        incremental_er as IE,
    )

    all_t, base_t, delta_t = _split_xs(spark)
    store = ERStateStore(spark, tmp_path / "state")
    commit_er_state(spark, store, base_t)
    live = _clusters_dict(store.clusters())

    real_commit = IE.ERStateStore.commit_part

    def crashing(self, gen, part, df, ph, epoch=None):
        if part == "clusters":  # late: most of the new base already landed
            raise RuntimeError("injected compaction crash")
        return real_commit(self, gen, part, df, ph, epoch)

    monkeypatch.setattr(IE.ERStateStore, "commit_part", crashing)
    with pytest.raises(RuntimeError, match="injected compaction crash"):
        compact(spark, store, base_t)
    monkeypatch.setattr(IE.ERStateStore, "commit_part", real_commit)

    # live chain untouched: pointer, clusters, and the append-only records
    # fold (an in-place rebuild would have doubled records / mixed stages)
    assert store.generation() == 0 and store.epoch() == 0
    assert _clusters_dict(store.clusters()) == live
    assert store.records().count() == base_t.select(
        "conv_id"
    ).distinct().count()

    # retry: epoch bumps, chain squashed, clusters equal the batch pipeline
    meta = compact(spark, store, base_t)
    assert meta["epoch"] == 1 and meta["generation"] == 0
    assert _clusters_dict(store.clusters()) == live

    # incremental update after compaction runs under the new epoch
    report = incremental_er_update(spark, store, delta_t)
    assert report["generation"] == 1
    assert store.epoch() == 1
    assert _clusters_dict(store.clusters()) == _clusters_dict(
        er_pipeline(spark, all_t)["clusters"]
    )


def test_update_with_mismatched_config_refuses(spark, tmp_path):
    """An incremental fold under a DIFFERENT ERConfig than the committed
    state silently mixes frozen decisions with new thresholds — it must
    refuse and demand a compaction."""
    from tabiya_livelihoods_classifier_spark.config import ERConfig

    _, base_t, delta_t = _split_xs(spark)
    store = ERStateStore(spark, tmp_path / "state")
    commit_er_state(spark, store, base_t)
    with pytest.raises(ValueError, match="params_hash"):
        incremental_er_update(
            spark, store, delta_t, cfg=ERConfig(match_threshold=0.9)
        )


def test_commit_refuses_config_where_capping_can_bite(spark, tmp_path):
    """cfg.max_block_size <= purge_block_size makes salt assignment depend
    on run-time block size (base+delta pairs can then differ from the
    combined recompute) — commit_er_state refuses such configs outright."""
    from tabiya_livelihoods_classifier_spark.config import ERConfig

    _, base_t, _ = _split_xs(spark)
    store = ERStateStore(spark, tmp_path / "state")
    with pytest.raises(ValueError, match="max_block_size"):
        commit_er_state(
            spark, store, base_t,
            cfg=ERConfig(max_block_size=100, purge_block_size=500),
        )
