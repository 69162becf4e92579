"""Pairwise scoring: fused Jaccard / Jaro-Winkler / embedding-cosine pass.

Reference semantics being generalized: cosine top-k gate (linker.py:306-311,
evaluator.py:190 thresholds) and token-set Jaccard (evaluator.py:412-424).

Execution shape: candidate pairs (id_a, id_b) are joined twice against the
record-feature table (tokens, name_key, embedding). Jaccard and cosine are
pure JVM column expressions; only Jaro-Winkler crosses into Python, as ONE
Arrow-batched pandas UDF over the pair batch (never per-row). The fused
score is a weighted sum, thresholded into match edges.

At 100 TB the feature table is the big side: both joins are plain equi-joins
on the record id (sort-merge/shuffle-hash under AQE); no shuffle beyond the
two id joins is introduced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tabiya_livelihoods_classifier_spark.config import ERConfig
from tabiya_livelihoods_classifier_spark.functions.embed import cosine_expr
from tabiya_livelihoods_classifier_spark.functions.strsim import (
    jaccard_expr,
    jaro_winkler_udf,
)


def score_pairs(
    pairs: DataFrame,
    features: DataFrame,
    cfg: ERConfig = ERConfig(),
) -> DataFrame:
    """Attach sim_jaccard / sim_jw / sim_cosine / score to each pair.

    `features` must have columns: rid, name_key (short canonical string),
    tokens (array<string>), embedding (array<double>).
    """
    # Phase 1 — NARROW: attach only the token arrays and apply the JVM-side
    # Jaccard gate. The candidate set is ~3x the surviving set, and dragging
    # 64-dim embeddings through the join for pairs that die at the gate is
    # the single biggest shuffle in the pipeline. Embeddings + name keys
    # join in phase 2 for survivors only.
    ta = features.select(F.col("rid").alias("id_a"), F.col("tokens").alias("tokens_a"))
    tb = features.select(F.col("rid").alias("id_b"), F.col("tokens").alias("tokens_b"))
    gated = (
        pairs.join(ta, "id_a")
        .join(tb, "id_b")
        .withColumn("sim_jaccard", jaccard_expr(F.col("tokens_a"), F.col("tokens_b")))
        .filter(F.col("sim_jaccard") >= cfg.min_jaccard)
        .select("id_a", "id_b", "sim_jaccard")
    )
    # Phase 2 — WIDE, survivors only: Jaro-Winkler (one Arrow batch pass)
    # and quantorder-stable cosine.
    fa = features.select(
        F.col("rid").alias("id_a"),
        F.col("name_key").alias("name_a"),
        F.col("embedding").alias("emb_a"),
    )
    fb = features.select(
        F.col("rid").alias("id_b"),
        F.col("name_key").alias("name_b"),
        F.col("embedding").alias("emb_b"),
    )
    scored = (
        gated.join(fa, "id_a")
        .join(fb, "id_b")
        .withColumn("sim_jw", jaro_winkler_udf(F.col("name_a"), F.col("name_b")))
        .withColumn("sim_cosine", cosine_expr(F.col("emb_a"), F.col("emb_b")))
    )
    score = (
        cfg.w_jaccard * F.col("sim_jaccard")
        + cfg.w_jw * F.col("sim_jw")
        + cfg.w_cosine * F.col("sim_cosine")
    )
    return scored.select(
        "id_a", "id_b", "sim_jaccard", "sim_jw", "sim_cosine", score.alias("score")
    )


def match_edges(scored: DataFrame, cfg: ERConfig = ERConfig()) -> DataFrame:
    """Edges above the match threshold (evaluator.py:190-style gate)."""
    return scored.filter(F.col("score") >= cfg.match_threshold).select("id_a", "id_b")
