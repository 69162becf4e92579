"""Engine configuration constants.

Every numeric mirrors a value pinned in the reference (file:line cited) or in
BASELINE.json; nothing here is tunable per-query unless a function exposes it.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# Per-entity-type cosine-similarity gates — reference inference/evaluator.py:190.
ENTITY_BOUNDS: dict[str, float] = {
    "Occupation": 0.0,
    "Skill": 0.7,
    "Qualification": 0.8,
}

# Retrieval depth — reference inference/linker.py:47 (default k=32).
DEFAULT_TOP_K = 32

# Deterministic hashing embedder dimensionality (FIXTURES.md §4).
EMBED_DIM = 64

# MinHash blocking: 16 hash permutations in 8 bands of 2 rows each.
# (Bands of 2 keep per-pair collision probability high at Jaccard ~0.6,
# which is where same-entity records with differing context tokens land.)
MINHASH_NUM_HASHES = 16
MINHASH_BAND_ROWS = 2

# Word-shingle width for the near-dup/document operators (the ER pipeline
# min-hashes record tokens directly, i.e. width 1).
SHINGLE_WIDTH = 3

# Candidate-pair explosion guard: blocks larger than this are salted/split
# (SparkER-style re-blocking; see PAPERS.md SparkER EDBT 2019).
MAX_BLOCK_SIZE = 2000

# Block PURGING (SparkER): band-key blocks larger than this are dropped
# outright before pair generation — a block this size is a band-key
# collision across entities, not a match signal. Measured on the bench
# corpus: keeps 99.9% of gold pairs, cuts candidates 81M -> 20M.
PURGE_BLOCK_SIZE = 500

# Cheap-first scoring cascade: pairs whose token-set Jaccard (pure JVM
# expression) is below the derived gate never reach the Python-side
# Jaro-Winkler UDF. The gate is NOT a free parameter: it is derived in
# ERConfig.__post_init__ as (match_threshold - w_jw - w_cosine) / w_jaccard
# — the largest value that is provably lossless (a pair below it cannot
# reach match_threshold even with perfect JW and cosine), for ANY
# weight/threshold combination. Defaults give 0.40. Measured on the bench
# corpus: sibling-entity candidates top out at 0.40 (2 shared of 5 union
# tokens), same-entity pairs bottom out at ~0.67 — the gate still drops
# ~80% of candidates before the Python-side pass.

# Pairwise-match decision threshold used by the clustering stage
# (analog of the reference's Skill gate evaluator.py:190). Calibrated on
# MEASURED score distributions of the bench corpus (50k convs): hardest
# same-entity pairs (one signature token lost to turn noise) score >= ~0.74;
# hardest cross-entity pairs (sibling entities sharing 2 of 3 words, one
# record noise-damaged) score <= ~0.66. Transitive clustering punishes false
# positives catastrophically (one false edge chain-merges two clusters), so
# the threshold sits at the top of that gap, not the middle.
MATCH_THRESHOLD = 0.70

# Staleness window — reference 3_2b_clean_LLM_create_opp-db.py:455 (120 days).
ACTIVE_WINDOW_DAYS = 120

# IR metric cut-offs — reference inference/evaluator.py:34-38.
IR_KS = (1, 4, 16, 32)


@dataclass(frozen=True)
class ERConfig:
    """Knobs for the end-to-end ER pipeline (plans/pipeline.py)."""

    num_hashes: int = MINHASH_NUM_HASHES
    band_rows: int = MINHASH_BAND_ROWS
    shingle_width: int = SHINGLE_WIDTH
    max_block_size: int = MAX_BLOCK_SIZE
    purge_block_size: int = PURGE_BLOCK_SIZE
    min_common_blocks: int = 1
    # None -> derived lossless gate (see MIN_JACCARD note above); a float
    # overrides it explicitly (caller takes recall responsibility).
    min_jaccard: float | None = None
    match_threshold: float = MATCH_THRESHOLD
    embed_dim: int = EMBED_DIM
    top_k: int = DEFAULT_TOP_K
    entity_bounds: dict[str, float] = field(default_factory=lambda: dict(ENTITY_BOUNDS))
    # weights of the fused pairwise score (jaccard / jaro-winkler / cosine).
    # JW gets the smallest weight: its prefix boost inflates scores of
    # different entities sharing a leading token.
    w_jaccard: float = 0.5
    w_jw: float = 0.15
    w_cosine: float = 0.35

    def __post_init__(self) -> None:
        if self.min_jaccard is None:
            # lossless cascade gate: below this Jaccard, even perfect JW and
            # cosine (=1.0) cannot lift the fused score to match_threshold.
            gate = (self.match_threshold - self.w_jw - self.w_cosine) / max(
                self.w_jaccard, 1e-12
            )
            object.__setattr__(self, "min_jaccard", max(0.0, gate))
