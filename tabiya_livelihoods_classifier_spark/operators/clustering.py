"""Connected components (transitive closure) via checkpointed hash-min joins.

Semantic ancestor in the reference: the memoized DAG-chain DFS
(3_2b_clean_LLM_create_opp-db.py:473-532) — transitive reachability with a
memo table. At cluster scale the idiomatic Spark form is iterative hash-min
label propagation (SURVEY §4 item 3):

    comp(v) <- min( comp(v), min over neighbors u of comp(u) )

until fixpoint. Each iteration is one shuffle (groupBy node); lineage is cut
with localCheckpoint every iteration so plans stay O(1) deep. Convergence is
detected by counting changed labels (an AQE-sized aggregate). Iterations are
bounded by graph diameter; a max-iteration guard protects against
pathological inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    max_iter: int = 50,
) -> DataFrame:
    """(rid, component) — component = min node id reachable from rid.

    `edges` columns: id_a, id_b (string or numeric ids; min() must be a
    total order). `nodes` optionally supplies isolated vertices (column
    rid); they come out as singleton components.
    """
    sym = edges.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).union(edges.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
    sym = sym.dropDuplicates(["src", "dst"]).localCheckpoint(eager=True)

    verts = sym.select(F.col("src").alias("rid")).distinct()
    if nodes is not None:
        verts = verts.union(nodes.select("rid")).distinct()
    labels = verts.select("rid", F.col("rid").alias("component")).localCheckpoint(
        eager=True
    )

    for _ in range(max_iter):
        # min label among each node's neighbors
        nbr_min = (
            sym.join(labels, sym.dst == labels.rid)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(nbr_min, labels.rid == nbr_min.src, "left")
            .select(
                "rid",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "rid")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
