"""Iterative graph operators: transitive ancestor closure (SURVEY J8).

Semantic ancestor: the reference's memoized DAG-chain DFS with cycle cut
(3_2b_clean_LLM_create_opp-db.py:473-532). The Spark form is an iterative
self-join to fixpoint: paths ∪ (paths ⨝ edges), deduped each round, each
round's closure RELIABLY checkpointed (lineage truncation is structurally
required — the closure feeds both union branches, so the plan would double
per round; reliable checkpoint survives executor loss, unlike
localCheckpoint — cf. operators/clustering). Cycles terminate because the
reachable-pair set is finite (the dedupe plays the reference's visited-set
role). Iterations = longest simple path, shuffles bounded accordingly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def weighted_ancestors(
    edges: DataFrame, max_depth: int = 3
) -> DataFrame:
    """M9 graph-distance kernel support (matching_config.json:5-12):
    (node, ancestor, dist) with dist = MINIMUM summed edge weight over
    child->parent paths of at most `max_depth` edges.

    `edges` columns: child, parent, weight. Depth is bounded (reference
    distance_cutoff = 3), so this is `max_depth - 1` self-joins with no
    iteration-to-fixpoint and no checkpointing — lineage stays shallow and
    every join is a plain equi-join Catalyst can reorder. Kernel scoring
    (exp(-lambda * d)) is left to the caller so the closure stays reusable.
    """
    base = edges.select(
        F.col("child").alias("node"),
        F.col("parent").alias("ancestor"),
        F.col("weight").cast("double").alias("dist"),
    )
    paths = base
    frontier = base
    for _ in range(max_depth - 1):
        frontier = (
            frontier.alias("f")
            .join(edges.alias("e"), F.col("f.ancestor") == F.col("e.child"))
            .select(
                F.col("f.node").alias("node"),
                F.col("e.parent").alias("ancestor"),
                (F.col("f.dist") + F.col("e.weight")).alias("dist"),
            )
        )
        paths = paths.union(frontier)
    return paths.groupBy("node", "ancestor").agg(F.min("dist").alias("dist"))


def kernel_scores(
    ancestors: DataFrame, lam: float = 0.7
) -> DataFrame:
    """exp(-lambda * dist) kernel over a weighted closure
    (matching_config.json: kernel exp(-lambda*d), lambda=0.7)."""
    return ancestors.withColumn("score", F.exp(-lam * F.col("dist")))


def transitive_ancestors(edges: DataFrame, max_iter: int = 30) -> DataFrame:
    """(node, ancestor) for every ancestor reachable via child->parent edges.

    `edges` columns: child, parent.
    """
    # self-sufficient reliable-checkpoint dir on whatever session the
    # caller passed (cf. operators/clustering.connected_components)
    from tabiya_livelihoods_classifier_spark.session import ensure_checkpoint_dir

    ensure_checkpoint_dir(edges.sparkSession)
    closure = edges.select(
        F.col("child").alias("node"), F.col("parent").alias("ancestor")
    ).dropDuplicates()
    closure = closure.checkpoint(eager=True)
    n = closure.count()
    for _ in range(max_iter):
        # pointer doubling: compose the closure WITH ITSELF (not with the
        # base edges), so reachable path length squares per round —
        # fixpoint in O(log longest-path) checkpointed rounds instead of
        # O(longest-path). Each round's self-join is bounded by the
        # deduped closure size, which is the final output size.
        step = (
            closure.alias("c1")
            .join(
                closure.alias("c2"),
                F.col("c1.ancestor") == F.col("c2.node"),
            )
            .select(
                F.col("c1.node").alias("node"),
                F.col("c2.ancestor").alias("ancestor"),
            )
        )
        # reliable checkpoint: `closure` appears three times in the new
        # plan (union branch + both join branches), so without lineage
        # truncation the plan would triple per round; the reliable variant
        # survives executor loss, unlike localCheckpoint.
        new_closure = closure.union(step).dropDuplicates().checkpoint(
            eager=True
        )
        new_n = new_closure.count()
        closure = new_closure
        if new_n == n:
            break
        n = new_n
    return closure
