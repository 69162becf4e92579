"""Connected components: driver-stitch gate, distributed fallback with
pointer doubling, and the non-convergence guard."""

from __future__ import annotations

import pytest

from tabiya_livelihoods_classifier_spark.operators import clustering


def _chain_edges(spark, n):
    rows = [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(n - 1)]
    return spark.createDataFrame(rows, "id_a string, id_b string")


def test_driver_stitch_path_chain(spark):
    out = {
        r.rid: r.component
        for r in clustering.connected_components(_chain_edges(spark, 12)).collect()
    }
    assert set(out.values()) == {"n000"}
    assert len(out) == 12


def test_distributed_fallback_engages_and_matches(spark, monkeypatch):
    # byte budget 0 forces the hash-min loop; pointer doubling converges a
    # 40-node chain well inside max_iter
    monkeypatch.setattr(clustering, "DRIVER_STITCH_MAX_BYTES", 0)
    out = {
        r.rid: r.component
        for r in clustering.connected_components(_chain_edges(spark, 40)).collect()
    }
    assert set(out.values()) == {"n000"}
    assert len(out) == 40


def test_nonconvergence_raises(spark, monkeypatch):
    monkeypatch.setattr(clustering, "DRIVER_STITCH_MAX_BYTES", 0)
    with pytest.raises(RuntimeError, match="did not converge"):
        clustering.connected_components(_chain_edges(spark, 60), max_iter=1)


def test_isolated_nodes_are_singletons(spark):
    edges = spark.createDataFrame(
        [("a", "b")], "id_a string, id_b string"
    )
    nodes = spark.createDataFrame([("a",), ("b",), ("z",)], "rid string")
    out = {
        r.rid: r.component
        for r in clustering.connected_components(edges, nodes=nodes).collect()
    }
    assert out == {"a": "a", "b": "a", "z": "z"}


def test_output_plan_is_lineage_truncated(spark):
    """Guard the reliable-checkpoint contract: the returned frame's
    optimized plan must scan checkpointed RDDs, not replay the caller's
    upstream lineage. persist() is NOT equivalent — it keeps the full
    logical plan, and Catalyst re-optimizing a deep ER plan on every
    downstream action measured 156 s (vs ~1.5 s truncated) for the
    clusters stage at bench4/local[8]."""
    from pyspark.sql import functions as F

    # deep-lineage edge input: a chain of self-joins standing in for the
    # ER pipeline's records->signatures->blocking->scoring stack
    deep = spark.createDataFrame(
        [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(9)],
        "id_a string, id_b string",
    )
    for tag in ("x", "y", "z"):
        other = deep.select(
            F.col("id_a").alias(f"{tag}_a"), F.col("id_b").alias(f"{tag}_b")
        )
        deep = (
            deep.join(other, deep.id_a == other[f"{tag}_a"], "left")
            .select("id_a", "id_b")
            .dropDuplicates(["id_a", "id_b"])
        )
    out = clustering.connected_components(deep)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # composition = checkpointed l1 join broadcast rep: LogicalRDD scans
    # (checkpoint barriers) and at most the one composition join survive
    assert "LogicalRDD" in plan
    assert plan.count("Join") <= 1, plan
    out_map = {r.rid: r.component for r in out.collect()}
    assert set(out_map.values()) == {"n000"} and len(out_map) == 10
