"""End-to-end ER pipeline over transcript tables (SURVEY §7.1).

    turns (conv_id, turn_idx, role, text, tool, ts)
      -> [1] canonicalize        (per-turn text invariant; stable turn order)
      -> [2] conversation records (sorted-concat text, stop-filtered tokens,
                                   name_key, hashing embedding)
      -> [3] blocking             (MinHash bands ∪ composite key; size cap)
      -> [4] pairwise scoring     (Jaccard ⊕ Jaro-Winkler ⊕ cosine; threshold)
      -> [5] clustering           (checkpointed hash-min connected components)

Scale notes (the plan you'd want at 100 TB):
  * Stage 2's only shuffle is the groupBy(conv_id); everything downstream
    reuses that record table. Token document-frequency stop-filtering is an
    aggregate whose result is bounded (tokens with df>30% number at most
    ~3/0.3 per record on average), collected once and folded back in as an
    array literal — the classic "broadcast tiny aggregate" pattern.
  * Stage 3 shuffles once on block_key; oversized blocks are salted
    (operators/blocking.cap_block_size) so no partition exceeds
    max_block_size choose 2 candidate pairs.
  * Stage 4 is two equi-joins on record id (AQE picks broadcast vs
    sort-merge by actual size) + one Arrow UDF pass.
  * Stage 5 shuffles per CC iteration, bounded by cluster diameter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tabiya_livelihoods_classifier_spark.config import ERConfig
from tabiya_livelihoods_classifier_spark.functions.embed import embed_udf
from tabiya_livelihoods_classifier_spark.functions.text import (
    canonicalize_text,
    tokens,
)
from tabiya_livelihoods_classifier_spark.operators.blocking import (
    candidate_pairs,
    cap_block_size,
    composite_key,
    explode_blocks,
    minhash_band_keys,
    purge_oversized,
)
from tabiya_livelihoods_classifier_spark.operators.clustering import (
    connected_components,
)
from tabiya_livelihoods_classifier_spark.operators.scoring import (
    match_edges,
    score_pairs,
)

STOP_TOKEN_DF = 0.3  # tokens in >30% of conversations are template noise
# Corpus boilerplate = tokens in >20% of ALL turns. Calibration matters:
# template function words land at >=40% of turns, while the most frequent
# ENTITY words stay under ~10% — at a 0.10 cutoff the hottest entity words
# were being stripped from every signature (measured: cross-entity record
# pairs with IDENTICAL residual signatures scoring 1.0).
TURN_STOP_DF = 0.20


def canonical_turns(turns: DataFrame) -> DataFrame:
    """Stage 1: per-turn canonical text under stable (conv_id, turn_idx) order.

    The per-turn text invariant (BASELINE.json input_hint) is checked against
    plans/oracle.reference_canonicalize on this output.
    """
    return turns.select(
        "conv_id",
        "turn_idx",
        "role",
        F.coalesce("tool", F.lit("")).alias("tool"),
        canonicalize_text("text").alias("text"),
        "ts",
    )


# A token enters the record signature only when it occurs in a strict
# majority of the conversation's turns: entity-mention tokens repeat every
# turn (one injected typo still leaves them over 0.5 even in a 4-turn
# conversation), while context tokens (cities, in 1/3 of turn templates)
# rarely clear it. A 0.75 cutoff was tried and is WORSE: with 4 turns it
# demands a perfect 4/4, so a single typo deleted discriminative tokens
# from ~15% of short records.
MAJORITY_TURN_FRACTION = 0.5


def conversation_records(canon: DataFrame, cfg: ERConfig = ERConfig()) -> DataFrame:
    """Stage 2: one feature row per conversation.

    Signature tokens are selected by THREE frequency filters (all pure
    aggregations, no Python):

      * corpus-level turn DF: tokens occurring in > 10% of ALL turns are
        boilerplate (prompt/template vocabulary) and dropped up front —
        bounded aggregate folded back as an array literal.
      * within-conversation strict majority: a token counts only if it occurs
        in > 50% of the conversation's turns. Entity-identifying tokens
        repeat every turn; per-turn template words and one-off typos do not.
        (Analog of the reference's span extraction M5: isolate the entity
        mention from surrounding prose.)
      * cross-conversation document frequency: surviving tokens in > 30% of
        conversations are dropped (residual boilerplate safety net).

    Output: rid (=conv_id), record_text, role_sig, tokens (sorted, distinct),
    name_key (sorted tokens joined), embedding.
    """
    per_conv = canon.groupBy("conv_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("turn_idx", "text"))),
                lambda s: s["text"],
            ),
            " ",
        ).alias("record_text"),
        F.array_join(
            F.array_sort(F.collect_set(F.when(F.col("tool") != "", F.col("tool")))),
            ",",
        ).alias("role_sig"),
        F.countDistinct("turn_idx").alias("n_turns"),
    )
    turn_tokens = canon.select(
        "conv_id",
        "turn_idx",
        F.explode(F.array_distinct(tokens(F.col("text")))).alias("token"),
    )
    # corpus boilerplate by turn document-frequency, FULLY DECLARATIVE: the
    # total-turn count is a broadcast 1-row aggregate and the stop set is a
    # broadcast anti-join side — no driver collect()s, so the whole records
    # stage is one DAG with no scheduler barriers between sub-aggregations.
    # (turn_tokens is already distinct per (conv, turn, token) — it explodes
    # array_distinct per turn — so count(*) IS the turn document frequency.)
    n_turns_total = canon.groupBy().agg(
        F.count_distinct("conv_id", "turn_idx").alias("n_turns_total")
    )
    turn_stop_df = (
        turn_tokens.groupBy("token")
        .agg(F.count("*").alias("tdf"))
        .crossJoin(F.broadcast(n_turns_total))
        .filter(F.col("tdf") > TURN_STOP_DF * F.col("n_turns_total"))
        .select("token")
    )
    turn_tokens = turn_tokens.join(
        F.broadcast(turn_stop_df), "token", "left_anti"
    )
    majority = (
        # count(*) == countDistinct(turn_idx) here (rows unique per conv/
        # turn/token); countDistinct would plan an Expand + two aggregates
        turn_tokens.groupBy("conv_id", "token")
        .agg(F.count("*").alias("n_tok_turns"))
        .join(per_conv.select("conv_id", "n_turns"), "conv_id")
        .filter(F.col("n_tok_turns") > MAJORITY_TURN_FRACTION * F.col("n_turns"))
        .groupBy("conv_id")
        .agg(F.array_sort(F.collect_set("token")).alias("tokens_all"))
    )
    recs = per_conv.join(majority, "conv_id", "left").select(
        F.col("conv_id").alias("rid"),
        "record_text",
        "role_sig",
        F.coalesce(F.col("tokens_all"), F.array().cast("array<string>")).alias(
            "tokens_all"
        ),
    )
    # cross-conversation stop tokens: same broadcast-aggregate pattern
    n_docs = recs.groupBy().agg(F.count("*").alias("n_docs"))
    common_df = (
        recs.select(F.explode("tokens_all").alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .filter(F.col("df") > STOP_TOKEN_DF * F.col("n_docs"))
        .select(F.col("token").alias("stop_token"))
    )
    # fold the (bounded, tiny) stop set back in as a scalar-subquery-style
    # cross join of a 1-row aggregate (global agg always yields exactly one
    # row, empty stop set -> empty array)
    stop_one_row = common_df.groupBy().agg(
        F.collect_list("stop_token").alias("stop_arr")
    )
    recs = (
        recs.crossJoin(F.broadcast(stop_one_row))
        .withColumn(
            "tokens",
            F.array_sort(
                F.array_except(
                    F.col("tokens_all"),
                    F.coalesce(F.col("stop_arr"), F.array().cast("array<string>")),
                )
            ),
        )
        .drop("stop_arr")
        .withColumn("name_key", F.array_join(F.col("tokens"), " "))
    )
    recs = recs.withColumn("embedding", embed_udf(F.col("name_key")))
    return recs.select(
        "rid", "record_text", "role_sig", "tokens", "name_key", "embedding"
    )


def block_membership(records: DataFrame, cfg: ERConfig = ERConfig()) -> DataFrame:
    """Stage 3: LSH band keys (MinHash over signature tokens) ∪ composite
    structural key; oversized blocks purged, residual hot keys salted."""
    keys = F.concat(
        minhash_band_keys(F.col("tokens"), cfg.num_hashes, cfg.band_rows),
        F.array(composite_key(F.col("role_sig"), F.col("tokens"))),
    )
    membership = explode_blocks(records, "rid", keys)
    # purge first (collision blocks carry no signal), salt what remains —
    # with purge <= cap the salt pass is an inert guard for custom configs
    membership = purge_oversized(membership, cfg.purge_block_size)
    return cap_block_size(membership, cfg.max_block_size)


def er_pipeline(
    spark: SparkSession,
    turns: DataFrame,
    cfg: ERConfig = ERConfig(),
) -> dict[str, DataFrame]:
    """Run stages 1-5; return every intermediate (for tests/lineage) + clusters.

    clusters: (rid, component) where component is the min conv_id of the
    connected component — deterministic cluster representative.
    """
    canon = canonical_turns(turns)
    records = conversation_records(canon, cfg)
    # records are reused by blocking AND scoring: cache once
    records = records.persist()
    membership = block_membership(records, cfg)
    pairs = candidate_pairs(membership, cfg.min_common_blocks)
    scored = score_pairs(pairs, records, cfg)
    edges = match_edges(scored, cfg)
    clusters = connected_components(edges, nodes=records.select("rid"))
    return {
        "canon": canon,
        "records": records,
        "membership": membership,
        "pairs": pairs,
        "scored": scored,
        "edges": edges,
        "clusters": clusters,
    }
