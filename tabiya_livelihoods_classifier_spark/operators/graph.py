"""Iterative graph operators: transitive ancestor closure (SURVEY J8).

Semantic ancestor: the reference's memoized DAG-chain DFS with cycle cut
(3_2b_clean_LLM_create_opp-db.py:473-532). The Spark form is an iterative
self-join to fixpoint: paths ∪ (paths ⨝ edges), deduped each round, with
localCheckpoint truncating lineage. Cycles terminate naturally because the
reachable-pair set is finite (the dedupe plays the reference's visited-set
role). Iterations = longest simple path, shuffles bounded accordingly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_ancestors(edges: DataFrame, max_iter: int = 30) -> DataFrame:
    """(node, ancestor) for every ancestor reachable via child->parent edges.

    `edges` columns: child, parent.
    """
    closure = edges.select(
        F.col("child").alias("node"), F.col("parent").alias("ancestor")
    ).dropDuplicates()
    closure = closure.localCheckpoint(eager=True)
    n = closure.count()
    for _ in range(max_iter):
        step = (
            closure.alias("c")
            .join(
                edges.alias("e"), F.col("c.ancestor") == F.col("e.child")
            )
            .select(F.col("c.node").alias("node"), F.col("e.parent").alias("ancestor"))
        )
        new_closure = closure.union(step).dropDuplicates().localCheckpoint(
            eager=True
        )
        new_n = new_closure.count()
        closure = new_closure
        if new_n == n:
            break
        n = new_n
    return closure
