"""Blocking: MinHash-LSH band keys + composite keys + block-size control.

Replaces the reference's entity-type routing (inference/linker.py:285-304,
its only 'blocking') with scale-real candidate generation:

* `minhash_band_keys` — deterministic MinHash over word shingles computed as
  pure column expressions: permutation i of shingle s is md5(f"{i}:" || s)
  and the signature element is the LEXICOGRAPHIC MIN of those hex digests.
  This is engine-portable (identical in DuckDB for oracle SQL), JVM-codegen
  (no Python), and needs no pyspark.ml vector assembly. Band key = band
  index + concat of its signature rows; two records share a band key iff
  their signatures agree on that band (standard LSH banding).
* `composite_keys` — cheap structural keys (role/tool fingerprint + leading
  token) unioned with LSH keys, mirroring the reference's per-type routing.
* `cap_block_size` — SparkER-style oversized-block control (PAPERS.md,
  SparkER EDBT 2019): blocks above `max_block_size` are salted into
  sub-blocks via pmod(xxhash64(record_id), n_salt). This bounds the
  quadratic pair blowup per block; recall is preserved by the other bands.
  AQE skew-join handles residual imbalance (session.py).
* `candidate_pairs` — block-local self-join with id_a < id_b and pair-level
  dedupe. The ONLY wide shuffles in blocking are (1) hash partition by
  block_key and (2) pair dedupe; both scale linearly in candidate count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tabiya_livelihoods_classifier_spark.config import (
    MAX_BLOCK_SIZE,
    MINHASH_BAND_ROWS,
    MINHASH_NUM_HASHES,
)


def minhash_signature(shingle_col: Column, num_hashes: int = MINHASH_NUM_HASHES) -> list[Column]:
    """One min-md5 column per hash permutation (lexicographic min of hex).

    NOTE: the permutation seed must be captured OUTSIDE the transform lambda —
    a two-parameter lambda would be interpreted by Spark as (element, index).
    """

    def perm(i: int) -> Column:
        prefix = F.lit(f"{i}:")
        return F.array_min(
            F.transform(shingle_col, lambda s: F.md5(F.concat(prefix, s)))
        )

    return [perm(i) for i in range(num_hashes)]


def minhash_band_keys(
    shingle_col: Column,
    num_hashes: int = MINHASH_NUM_HASHES,
    band_rows: int = MINHASH_BAND_ROWS,
) -> Column:
    """array<string> of LSH band keys ('b{band}|h0|h1|h2')."""
    sig = minhash_signature(shingle_col, num_hashes)
    bands = []
    for b in range(0, num_hashes, band_rows):
        parts = sig[b : b + band_rows]
        bands.append(F.concat_ws("|", F.lit(f"b{b // band_rows}"), *parts))
    return F.array(*bands)


def composite_key(role_sig_col: Column, tokens_col: Column) -> Column:
    """Structural composite key: role/tool fingerprint # leading token.

    Analog of the reference's entity-type routing (linker.py:285-304): a
    coarse, cheap partition of the space that complements LSH recall.
    """
    lead = F.coalesce(F.try_element_at(tokens_col, F.lit(1)), F.lit("_"))
    return F.concat_ws("#", F.lit("ck"), role_sig_col, lead)


def explode_blocks(
    records: DataFrame, id_col: str, key_arr_col: Column
) -> DataFrame:
    """(block_key, id) membership table."""
    return records.select(
        F.explode(key_arr_col).alias("block_key"), F.col(id_col).alias("rid")
    )


def purge_oversized(
    membership: DataFrame,
    purge_above: int,
) -> DataFrame:
    """SparkER-style block PURGING: drop blocks larger than `purge_above`
    outright (PAPERS.md, SparkER EDBT 2019 §block purging).

    A block that large is (almost) never entity-discriminative — it exists
    because a band key collapsed many entities — and its quadratic pair
    cost buys ~no recall: measured on the bench corpus (50k convs, 2000
    entities), purge_above=500 keeps 99.9% of gold same-entity pairs while
    cutting candidates 4x (81M -> 20M). Recall for a purged pair is carried
    by the other bands. Use `cap_block_size` (salting) instead when every
    pair must be preserved within a bounded block.
    """
    sizes = membership.groupBy("block_key").agg(F.count("*").alias("n"))
    # Anti-join against the PURGED keys, not semi-join against the kept
    # ones: kept blocks are O(all distinct blocks) ~ records x bands (the
    # big side), while purged keys number at most |membership|/purge_above
    # — a few percent of the record count. No broadcast hint: AQE
    # broadcasts when the purged set is actually small and falls back to a
    # shuffle join when it is not, so no fixed-size driver/executor bomb.
    purged = sizes.filter(F.col("n") > purge_above).select("block_key")
    return membership.join(purged, "block_key", "left_anti")


def purge_oversized_by_mass(
    membership: DataFrame,
    purge_above: int,
    mass_col: str = "mass",
) -> DataFrame:
    """Block purging by RESIDUAL record mass: a block is dropped when the
    records OUTSIDE its dominant signature (sum(mass) - max(mass)) exceed
    `purge_above`.

    Rationale, measured on the bench corpora: non-discriminative collision
    blocks (shared-word band collisions, coarse composite keys) spread
    their mass across many signatures of many entities — residual in the
    thousands — and their pairs are what chain-merge sibling entities. A
    legitimate single-entity block concentrates its mass in ONE dominant
    signature (residual ~ a handful of noise variants) no matter how many
    exact duplicates that entity has, so total-mass purging starts killing
    recall as soon as per-entity duplication approaches the threshold
    (bench32, ~940 records/entity: total-mass purge fragmented 1700
    entities into 6247 clusters; residual-mass keeps those blocks while
    still purging every junk block - median residuals 1415+ vs 4)."""
    sizes = membership.groupBy("block_key").agg(
        (F.sum(mass_col) - F.max(mass_col)).alias("residual")
    )
    purged = sizes.filter(F.col("residual") > purge_above).select("block_key")
    return membership.join(purged, "block_key", "left_anti")


def cap_block_size(
    membership: DataFrame,
    max_block_size: int = MAX_BLOCK_SIZE,
) -> DataFrame:
    """Salt oversized blocks: key -> key#salt with ceil(size/max) salts.

    Two-pass: aggregate block sizes (tiny result, broadcast back), then
    rewrite keys. Records in an oversized block land in exactly one
    sub-block; cross-salt pairs are sacrificed for boundedness (recall
    carried by the remaining bands) — explicit skew handling per the north
    rule, on top of AQE.
    """
    sizes = membership.groupBy("block_key").agg(F.count("*").alias("n"))
    big = sizes.filter(F.col("n") > max_block_size).select(
        "block_key", F.ceil(F.col("n") / max_block_size).cast("int").alias("n_salt")
    )
    out = membership.join(F.broadcast(big), "block_key", "left")
    # salt on (block_key, rid), NOT rid alone: an rid-only salt puts a record
    # in the SAME sub-block of every oversized band, so a pair sacrificed in
    # one band is sacrificed in all of them; per-block salts split each band
    # differently and the other bands carry the recall.
    salted = F.when(
        F.col("n_salt").isNotNull(),
        F.concat_ws(
            "#",
            F.col("block_key"),
            F.pmod(
                F.xxhash64(F.col("block_key"), F.col("rid")), F.col("n_salt")
            ).cast("string"),
        ),
    ).otherwise(F.col("block_key"))
    return out.select(salted.alias("block_key"), "rid")


def candidate_pairs(membership: DataFrame, min_common: int = 1) -> DataFrame:
    """Distinct (id_a < id_b) pairs co-occurring in >= `min_common` DISTINCT
    blocks (blocks with identical member sets count once).

    Two-phase: (1) collapse duplicate blocks — every LSH band of records
    with identical signatures emits the SAME member set, so the quadratic
    join would re-derive each clique's pairs once per band (measured 190M
    join rows -> ~30M at bench4 after collapsing); the pair set is the
    union over DISTINCT blocks, so this is a pure optimization. (2)
    block-local self-join on the deduped membership, then a pair-level
    COUNT aggregate — same shuffle as a dropDuplicates but the
    distinct-common-block count comes out free for meta-blocking
    (min_common >= 2 keeps pairs supported by multiple distinct blocks).
    Never a cross join: Catalyst plans a hash join on the block hash.
    """
    blocks = membership.groupBy("block_key").agg(
        F.array_sort(F.collect_list("rid")).alias("members")
    )
    uniq = (
        blocks.select(
            F.sha2(F.concat_ws("\x1f", "members"), 256).alias("bk"), "members"
        )
        .dropDuplicates(["bk"])
        .select("bk", F.explode("members").alias("rid"))
    )
    a = uniq.alias("a")
    # fact x fact self-join: shuffled-hash, never broadcast — the membership
    # table is O(corpus); Spark's size estimate post-explode is unreliable.
    b = uniq.hint("shuffle_hash").alias("b")
    pairs = (
        a.join(b, "bk")
        .filter(F.col("a.rid") < F.col("b.rid"))
        .groupBy(F.col("a.rid").alias("id_a"), F.col("b.rid").alias("id_b"))
        .agg(F.count("*").alias("n_common"))
    )
    if min_common > 1:
        pairs = pairs.filter(F.col("n_common") >= min_common)
    return pairs.select("id_a", "id_b")
