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
