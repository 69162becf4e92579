"""Physical-plan assertions: the battery queries must compile to the
join/scan shapes that survive a 100x scale-up (no full-corpus broadcast,
column pruning at the parquet scan)."""

from __future__ import annotations

import contextlib
import io

from tabiya_livelihoods_classifier_spark.plans.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q20_small_corpus_exact_scorer_is_arrow_block_matmul(spark):
    """Under KNN_NUMPY_MAX_ROWS the exact scorer is the Arrow block-matmul
    mapInPandas over candidate batches — one scan of the corpus, no join
    node at all (the query matrix rides a Spark broadcast variable).
    Asserted on the stage PRODUCER plan (_knn_topk): the q20 entry itself
    returns the committed kNN stage (a parquet scan) once _knn_topk_staged
    has materialized it."""
    from tabiya_livelihoods_classifier_spark.plans.queries import _knn_topk

    p = _plan(_knn_topk(spark, SF, 5))
    assert "MapInPandas" in p, p
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p


def test_knn_relational_fallback_is_shuffle_cartesian(spark):
    """Above the numpy gate the relational fallback runs, and it must not
    broadcast the candidate corpus: the scale-safe strategy is a
    shuffle-replicated cartesian."""
    from tabiya_livelihoods_classifier_spark.plans.queries import (
        _knn_topk_relational,
    )

    p = _plan(_knn_topk_relational(spark, SF, 5))
    assert "CartesianProduct" in p, p
    assert "BroadcastNestedLoopJoin" not in p, p


def test_knn_numpy_matches_relational(spark):
    """The two exact-kNN physical strategies are one contract: identical
    rows (ranks, labels, and bitwise-identical rounded sims) at sf0.001."""
    from tabiya_livelihoods_classifier_spark.plans.queries import (
        _knn_topk_numpy,
        _knn_topk_relational,
    )

    a = sorted(map(tuple, _knn_topk_numpy(spark, SF, 5).collect()))
    b = sorted(map(tuple, _knn_topk_relational(spark, SF, 5).collect()))
    assert a == b


def test_q20_large_corpus_routes_through_ivf(spark):
    """Above the gate q20 takes the IVF centroid-bucket path: candidates via
    equi-join on bucket — no cartesian over the corpus. (sf0.1's 2000
    embeddings exceed ANN_EXACT_MAX_ROWS=1000.) The only crossJoin is the
    per-vector centroid assignment against the broadcast centroid table."""
    p = _plan(QUERIES["q20_ann_topk"](spark, "/root/testdata/sf0.1"))
    assert "CartesianProduct" not in p, p


def test_q21_nrel_has_no_nested_loop_join(spark):
    """n_rel comes from the label histogram (broadcast hash join), never a
    (queries x corpus) nested-loop theta-join."""
    p = _plan(QUERIES["q21_knn_ir_metrics"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in p, p


def test_q34_neardup_has_no_allpairs_join(spark):
    """Sign-band LSH near-dup: candidates via equi-join on band keys only —
    no cartesian, no broadcast nested loop anywhere in the plan."""
    p = _plan(QUERIES["q34_embedding_neardup"](spark, SF))
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p


def test_q12_exact_jaccard_has_no_allpairs_join(spark):
    """Candidates come from in-array pair generation per shingle group — no
    corpus-level cartesian or nested-loop join. The only permitted
    BroadcastNestedLoopJoin is the 1-row broadcast hot-shingle fold-in
    (Cross BuildRight of a global aggregate — the scalar-subquery pattern),
    which is O(|corpus|) work regardless of scale."""
    p = _plan(QUERIES["q12_jaccard_pairs"](spark, SF))
    assert "CartesianProduct" not in p, p
    for ln in p.splitlines():
        # tree lines carry the join type; detail-section headers do not
        if "BroadcastNestedLoopJoin" in ln and "Build" in ln:
            assert "Cross BuildRight" in ln, ln


def test_q01_scan_prunes_columns(spark):
    """Column pruning reaches the lineitem scan: the 16-column table is read
    with only the handful of columns q01 touches."""
    p = _plan(QUERIES["q01_pricing_summary"](spark, SF))
    read_schemas = [ln for ln in p.splitlines() if "ReadSchema" in ln]
    assert read_schemas, p
    assert all("l_comment" not in ln for ln in read_schemas), read_schemas
    assert any("l_returnflag" in ln for ln in read_schemas), read_schemas


def test_q38_numpy_matches_relational(spark):
    """The two entity-linking physical strategies are one contract:
    identical rows (types, tax ids, and bitwise-identical rounded sims)
    at sf0.001 — the same parity bar as the exact-kNN pair."""
    from tabiya_livelihoods_classifier_spark.plans.queries import (
        _entity_linking_numpy,
        _entity_linking_relational,
    )

    a = sorted(map(tuple, _entity_linking_numpy(spark, SF).collect()))
    b = sorted(map(tuple, _entity_linking_relational(spark, SF).collect()))
    assert a == b


def test_q38_numpy_plan_has_no_join(spark):
    """Under the gate the linking scorer is mapInPandas over the taxonomy
    side with the entity matrices on a broadcast variable — no join node,
    no corpus broadcast relation."""
    from tabiya_livelihoods_classifier_spark.plans.queries import (
        _entity_linking_numpy,
    )

    p = _plan(_entity_linking_numpy(spark, SF))
    assert "MapInPandas" in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
