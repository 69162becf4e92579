"""End-to-end ER pipeline over transcript tables (SURVEY §7.1).

    turns (conv_id, turn_idx, role, text, tool, ts)
      -> [1] canonicalize        (per-turn text invariant; stable turn order)
      -> [2] conversation records (sorted-concat text, stop-filtered tokens,
                                   name_key)
      -> [2b] signature collapse  (exact dedup BEFORE fuzzy ER: records
                                   sharing a name_key are provably same-
                                   cluster, so fuzzy stages run per DISTINCT
                                   signature — ~clique-size x smaller input)
      -> [3] blocking             (MinHash bands ∪ composite key; size cap)
      -> [4] pairwise scoring     (Jaccard ⊕ Jaro-Winkler ⊕ cosine; threshold)
      -> [5] clustering           (contraction + hash-min CC on signatures,
                                   composed back to records via name_key)
      -> [6] taxonomy linking     (cluster reps -> per-type cosine top-k with
                                   entity bounds; linker.py:268-330 analog)
      -> [7] hierarchy rollup     (ancestor closure with exp(-λ·d) kernel)

Scale notes (the plan you'd want at 100 TB):
  * Stage 2 makes exactly TWO passes over the turn corpus — the per-conv
    metadata aggregate and the token explode+aggregate — each materialized
    once behind a reliable-checkpoint barrier (see conversation_records'
    `materialize` hook: their multiple consumers' differently-pruned
    subtrees defeat exchange reuse, so without the barrier the corpus-wide
    passes re-execute per consumer). Token document-frequency
    stop-filtering is an aggregate whose result is bounded (tokens with
    df>30% number at most ~3/0.3 per record on average), folded back in as
    a broadcast 1-row array — the classic "broadcast tiny aggregate"
    pattern.
  * Stage 2b is THE scale lever on duplicate-heavy corpora: ER cost is
    quadratic in cluster size, so collapsing c exact copies shrinks pair
    generation + scoring + CC input by ~c². Cluster-level output is exactly
    preserved: same-signature records score 1.0 on all three sims (always
    >= threshold), band keys depend only on tokens (identical), and the
    composite keys of a signature are the UNION over member role_sigs, so a
    pair of records is blocked iff its signature pair is blocked.
  * Stage 3 shuffles once on block_key; oversized blocks are purged then
    salted (operators/blocking) so no partition exceeds
    max_block_size choose 2 candidate pairs.
  * Stage 4 is two equi-joins on signature id (AQE picks broadcast vs
    sort-merge by actual size) + one Arrow UDF pass.
  * Stage 5 shuffles per CC iteration, bounded by cluster diameter.
  * Stages 6-7 join cluster representatives against the taxonomy — a
    broadcast-sized dim table (ESCO is ~10^4 rows) — so linking is one
    broadcast join + window top-k, no extra wide shuffle.
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
    purge_oversized_by_mass,
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


def conversation_records(
    canon: DataFrame,
    cfg: ERConfig = ERConfig(),
    embed: bool = True,
    with_text: bool = True,
    materialize=None,
    token_source: DataFrame | None = None,
) -> DataFrame:
    """Stage 2: one feature row per conversation.

    `with_text=False` drops the record_text sorted-concat from the
    per-conversation aggregate entirely (the ER path never reads it).
    `token_source` optionally supplies the (conv_id, text) frame the token
    explode reads instead of `canon` — er_pipeline passes the RAW turns:
    tokens() is invariant under canonicalize_text (every character class it
    rewrites — \\n \\r \\t and space runs — is inside the [^a-z0-9]+ split
    class; pinned by test_canonicalize), so tokenizing upstream of the
    canonicalization projection deletes the corpus-wide canonicalize regex
    pass + string allocation from the pipeline's hottest branch.
    `materialize` is an optional DataFrame -> DataFrame hook applied to the
    three multi-consumer intermediates (per_conv, tok_counts, recs). They
    are each consumed by 2-3 downstream branches whose column pruning makes
    the exchange subtrees non-identical, so Spark's exchange reuse does NOT
    deduplicate them — without materialization the corpus-wide token
    explode+aggregate executes twice and the per-conversation aggregate
    three times in one action (measured at bench16/local[8]: 92 s -> ~50 s
    with a persist hook). Callers combining `materialize` with
    `with_text=True` would materialize the corpus-sized text concat — pass
    the hook only with `with_text=False`.

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
    mat = materialize if materialize is not None else (lambda df: df)
    aggs = [
        F.array_join(
            F.array_sort(F.collect_set(F.when(F.col("tool") != "", F.col("tool")))),
            ",",
        ).alias("role_sig"),
        # size(collect_set) == count(distinct), but count(distinct) plans a
        # SECOND corpus-wide exchange keyed (conv_id, turn_idx) whose
        # partial aggregate reduces ~nothing ((conv, turn) is near-unique);
        # the set dedupes inside the map-side buffer instead, so the only
        # exchange carries one already-collapsed row per conversation.
        # Bounded: a set holds at most the conversation's turn count.
        F.size(F.collect_set("turn_idx")).alias("n_turns"),
    ]
    if with_text:
        aggs.insert(
            0,
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("turn_idx", "text"))),
                    lambda s: s["text"],
                ),
                " ",
            ).alias("record_text"),
        )
    per_conv = mat(canon.groupBy("conv_id").agg(*aggs))
    # no turn_idx in the exploded row: tok_counts only groups by
    # (conv_id, token), and each turn contributes one row per distinct token
    # either way — narrower rows through the corpus-wide explode+aggregate,
    # the most bandwidth-bound path in the pipeline.
    turn_tokens = (token_source if token_source is not None else canon).select(
        "conv_id",
        F.explode(F.array_distinct(tokens(F.col("text")))).alias("token"),
    )
    # ONE wide aggregation over the exploded token stream: (conv, token) ->
    # turn count. Everything downstream derives from this ~25x smaller
    # table: the corpus turn-DF of a token is sum(n_tok_turns) (rows are
    # distinct per (conv, turn, token)), so the stop-token aggregate reads
    # tok_counts, NOT the 84M-row explode again, and the stop filter is a
    # token-level anti-join on tok_counts (dropping a stop token after
    # counting equals dropping it before — the count is per (conv, token)).
    # Measured at bench16: removes a second full pass + an 84M-row
    # anti-join from the records stage.
    tok_counts = mat(
        turn_tokens.groupBy("conv_id", "token").agg(
            F.count("*").alias("n_tok_turns")
        )
    )
    # corpus boilerplate by turn document-frequency, FULLY DECLARATIVE: the
    # total-turn count is a broadcast 1-row aggregate and the stop set is a
    # broadcast anti-join side — no driver collect()s, so the whole records
    # stage is one DAG with no scheduler barriers between sub-aggregations.
    # The count sums per_conv's per-conversation distinct-turn counts — the
    # SAME value as a corpus-wide count_distinct(conv_id, turn_idx), minus
    # one full extra scan+distinct-shuffle of the turns table (measured at
    # bench64: a 32M-row pass). per_conv is consumed here, by the majority
    # join, and by the records join — exchange reuse does NOT cover the
    # three differently-pruned subtrees, hence the mat() hook above.
    n_turns_total = per_conv.groupBy().agg(
        F.sum("n_turns").alias("n_turns_total")
    )
    turn_stop_df = (
        tok_counts.groupBy("token")
        .agg(F.sum("n_tok_turns").alias("tdf"))
        .crossJoin(F.broadcast(n_turns_total))
        .filter(F.col("tdf") > TURN_STOP_DF * F.col("n_turns_total"))
        .select("token")
    )
    majority = (
        tok_counts.join(F.broadcast(turn_stop_df), "token", "left_anti")
        # NO join hint: the (conv_id, n_turns) projection is small enough
        # that AQE broadcast-joins it at bench scales (measured ~7% faster
        # at local[8] than a forced shuffle_hash), and at corpus scales
        # where it outgrows the broadcast ceiling AQE falls back to the
        # shuffled strategies on actual sizes.
        .join(per_conv.select("conv_id", "n_turns"), "conv_id")
        .filter(F.col("n_tok_turns") > MAJORITY_TURN_FRACTION * F.col("n_turns"))
        .groupBy("conv_id")
        .agg(F.array_sort(F.collect_set("token")).alias("tokens_all"))
    )
    # NO shuffle_hash here: a left-outer SHJ must build the RIGHT side, and
    # majority carries the collect_set token arrays — a corpus-sized hash
    # relation (measured slower than letting the planner sort-merge it).
    recs = mat(
        per_conv.join(majority, "conv_id", "left").select(
            F.col("conv_id").alias("rid"),
            *(["record_text"] if with_text else []),
            "role_sig",
            F.coalesce(
                F.col("tokens_all"), F.array().cast("array<string>")
            ).alias("tokens_all"),
        )
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
    text_cols = ["record_text"] if with_text else []
    if not embed:
        # the ER pipeline embeds per SIGNATURE (embedding is a pure function
        # of name_key), so per-record embedding would be wasted Arrow work
        return recs.select("rid", *text_cols, "role_sig", "tokens", "name_key")
    recs = recs.withColumn("embedding", embed_udf(F.col("name_key")))
    return recs.select(
        "rid", *text_cols, "role_sig", "tokens", "name_key", "embedding"
    )


def signature_records(records: DataFrame) -> DataFrame:
    """Stage 2b: collapse records to distinct signatures (exact dedup).

    Records with identical name_key have identical tokens (name_key is the
    sorted-distinct token join) and identical embeddings (a pure function of
    name_key), so every pairwise sim between them is 1.0 and the fused score
    is exactly 1.0 >= any sane threshold: they provably land in one cluster.
    Fuzzy blocking/scoring/clustering therefore runs once per signature.

    Output: sid (min member rid — deterministic representative), name_key,
    tokens, role_sigs (sorted array of (role_sig, rs_n) structs — blocking
    emits one composite key per distinct member role_sig, preserving
    record-level blocking recall, and rs_n carries the member count so
    block purging can weigh blocks by RECORD mass), n_members, embedding.
    """
    # tokens is a pure function of name_key (name_key = array_join(tokens,
    # ' ') and tokens are space-free by the [^a-z0-9]+ split): when the
    # caller hands a SLIM records frame (er_pipeline drops the token array
    # from the corpus-sized persist — ~40% fewer cached/decoded bytes per
    # record), re-derive it here on the collapsed signature rows instead.
    have_tokens = "tokens" in records.columns
    by_rs = records.groupBy("name_key", "role_sig").agg(
        F.count("*").alias("rs_n"), F.min("rid").alias("rs_min_rid"),
        *([F.first("tokens").alias("tokens")] if have_tokens else []),
    )
    sig = by_rs.groupBy("name_key").agg(
        F.min("rs_min_rid").alias("sid"),
        *([F.first("tokens").alias("tokens")] if have_tokens else []),
        F.array_sort(
            F.collect_list(F.struct("role_sig", "rs_n"))
        ).alias("role_sigs"),
        F.sum("rs_n").alias("n_members"),
    )
    if not have_tokens:
        sig = sig.withColumn(
            "tokens",
            F.when(
                F.col("name_key") == "", F.array().cast("array<string>")
            ).otherwise(F.split("name_key", " ")),
        )
    return sig.select(
        "sid",
        "name_key",
        "tokens",
        "role_sigs",
        "n_members",
        embed_udf(F.col("name_key")).alias("embedding"),
    )


def block_membership(records: DataFrame, cfg: ERConfig = ERConfig()) -> DataFrame:
    """Stage 3 (record-level API): LSH band keys (MinHash over signature
    tokens) ∪ composite structural key; oversized blocks purged, residual
    hot keys salted."""
    keys = F.concat(
        minhash_band_keys(F.col("tokens"), cfg.num_hashes, cfg.band_rows),
        F.array(composite_key(F.col("role_sig"), F.col("tokens"))),
    )
    membership = explode_blocks(records, "rid", keys)
    # purge first (collision blocks carry no signal), salt what remains —
    # with purge <= cap the salt pass is an inert guard for custom configs
    membership = purge_oversized(membership, cfg.purge_block_size)
    return cap_block_size(membership, cfg.max_block_size)


def signature_block_membership(
    sig: DataFrame, cfg: ERConfig = ERConfig()
) -> DataFrame:
    """Stage 3 over signatures: band keys from tokens (identical to the
    record-level keys), plus ONE composite key per member role_sig — the
    union over members — so any record pair that would have blocked on its
    composite key still blocks at signature level.

    Purging weighs each block by RESIDUAL record mass — records outside the
    block's dominant signature (operators/blocking.purge_oversized_by_mass,
    measured rationale there). This is the precision guard: collision
    blocks (degenerate signatures, coarse composite keys) spread mass over
    many entities' signatures and are purged; a heavily-duplicated single
    entity's blocks concentrate mass in one signature and survive no matter
    how large the entity is. (Measured: signature-COUNT purging chain-
    merged 1700 entities into 761 clusters at bench16; TOTAL-mass purging
    fragmented them into 6247 at bench32; residual-mass yields 1774
    clusters at bench32 with sampled pairwise precision 1.0 and
    F1 0.99995.)"""
    bands = sig.select(
        F.explode(
            minhash_band_keys(F.col("tokens"), cfg.num_hashes, cfg.band_rows)
        ).alias("block_key"),
        F.col("sid").alias("rid"),
        F.col("n_members").alias("mass"),
    )
    comps = sig.select(
        F.explode(F.col("role_sigs")).alias("rs"), "sid", "tokens"
    ).select(
        composite_key(F.col("rs.role_sig"), F.col("tokens")).alias("block_key"),
        F.col("sid").alias("rid"),
        F.col("rs.rs_n").alias("mass"),
    )
    membership = bands.unionByName(comps)
    membership = purge_oversized_by_mass(
        membership, cfg.purge_block_size, "mass"
    )
    return cap_block_size(membership.select("block_key", "rid"), cfg.max_block_size)


def _materialize_stage(df: DataFrame) -> DataFrame:
    """Compute-once + lineage-truncating barrier for a multi-consumer
    intermediate: persist so the reliable checkpoint's write job reads the
    cache instead of recomputing the plan, checkpoint to truncate the
    logical plan (downstream planning and cache lookups then walk a
    LogicalRDD leaf, not the full upstream tree), then drop the cache —
    consumers read the checkpoint files."""
    from tabiya_livelihoods_classifier_spark.session import ensure_checkpoint_dir

    ensure_checkpoint_dir(df.sparkSession)
    df = df.persist()
    out = df.checkpoint(eager=True)
    df.unpersist()
    return out


def er_pipeline(
    spark: SparkSession,
    turns: DataFrame,
    cfg: ERConfig = ERConfig(),
    timings: dict | None = None,
) -> dict[str, DataFrame]:
    """Run stages 1-5; return every intermediate (for tests/lineage) + clusters.

    clusters: (rid, component) where component is the min conv_id of the
    connected component — deterministic cluster representative. (Each
    signature's sid is its min member rid, so min-over-sids == min-over-rids
    and the representative is identical with or without the collapse.)

    membership/pairs/scored/edges are at SIGNATURE granularity (ids are
    sids); clusters is back at record granularity.
    """
    # optional stage timing (bench decomposition): the three eager
    # checkpoints make conversation_records() a synchronous corpus-scale
    # stage, and connected_components() runs its own eager barrier + probe,
    # so wall-clock around these calls attributes records vs tail honestly.
    import time as _time

    _t0 = _time.perf_counter()
    canon = canonical_turns(turns)
    # SLIM projection before persist: the ER stages only consume
    # (rid, role_sig, tokens, name_key). Persisting the full record row
    # would force materialization of record_text — the sorted-concat of
    # every turn's text, an ObjectHashAggregate collecting ~the whole
    # corpus — which NOTHING downstream of stage 2 reads; dropping it
    # before the persist lets Catalyst prune the text-collection aggregate
    # out of the plan entirely (a corpus-sized shuffle that existed only to
    # be cached and ignored).
    records = conversation_records(
        canon,
        cfg,
        embed=False,
        # the ER stages never read record_text: with_text=False removes the
        # corpus-sized sorted-concat from the per-conversation aggregate
        with_text=False,
        # persist the three multi-consumer intermediates (per_conv,
        # tok_counts, recs): their consumers' differently-pruned subtrees
        # defeat exchange reuse, so without this the corpus-wide token
        # explode+aggregate runs twice and the per-conv aggregate three
        # times (measured at bench16/local[8]: records stage 92 s -> ~50 s)
        materialize=_materialize_stage,
        # tokenize the raw turns, not the canonicalized projection: token
        # output is provably identical (see conversation_records docstring)
        # and the with_text=False ER plan then never evaluates the
        # canonicalize regex at all.
        token_source=turns,
    )
    # SLIM the corpus-sized persist to (rid, role_sig, name_key): tokens is
    # re-derivable from name_key at SIGNATURE granularity (2-3 orders of
    # magnitude fewer rows), so caching the token array per record buys
    # nothing downstream and costs ~40% of the cache/decode bytes.
    records = records.select("rid", "role_sig", "name_key")
    if timings is not None:
        timings["records_s"] = round(_time.perf_counter() - _t0, 3)
        _t0 = _time.perf_counter()
    # records feed the signature collapse AND the final rid->component map
    records = records.persist()
    sig = signature_records(records).persist()
    membership = signature_block_membership(sig, cfg)
    pairs = candidate_pairs(membership, cfg.min_common_blocks)
    feats = sig.select(
        F.col("sid").alias("rid"), "name_key", "tokens", "embedding"
    )
    scored = score_pairs(pairs, feats, cfg)
    edges = match_edges(scored, cfg)
    sig_clusters = connected_components(
        edges, nodes=sig.select(F.col("sid").alias("rid"))
    )
    if timings is not None:
        timings["tail_s"] = round(_time.perf_counter() - _t0, 3)
    clusters = (
        records.select("rid", "name_key")
        .join(sig.select("name_key", "sid"), "name_key")
        .join(
            sig_clusters.select(
                F.col("rid").alias("sid"), "component"
            ),
            "sid",
        )
        .select("rid", "component")
    )
    return {
        "canon": canon,
        "records": records,
        "signatures": sig,
        "membership": membership,
        "pairs": pairs,
        "scored": scored,
        "edges": edges,
        "clusters": clusters,
    }
