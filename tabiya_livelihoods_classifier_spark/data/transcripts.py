"""Deterministic synthetic transcript corpus (FIXTURES.md §1).

Pure function of (seed, scale): a transcript table with EXACTLY the
BASELINE.json input_hint shape
    (conv_id:string, turn_idx:int, role:string, text:string,
     tool:string, ts:timestamp)
plus a gold table (conv_id, entity_id) — each conversation is a noisy
realization of one gold entity, so gold clusters are conv_ids sharing
entity_id. Noise is controlled (case flips, adjacent-char typos within
Jaro-Winkler reach, injected newlines, duplicated whitespace, HTML-ish
fragments) to exercise canonicalization P1-P6 without making blocking
ambiguous.

No external data, no downloads; `random.Random(seed)` only.
"""

from __future__ import annotations

import datetime as dt
import itertools
import random
from dataclasses import dataclass

import pandas as pd

ROLES = ["user", "assistant", "tool", "system"]
TOOLS = ["search", "linker", "rank", ""]

_ADJ = [
    "senior", "junior", "industrial", "certified", "freelance", "municipal",
    "clinical", "digital", "regional", "maritime", "agricultural", "forensic",
]
_NOUN = [
    "software", "pastry", "logistics", "data", "marketing", "welding",
    "nursing", "aviation", "fisheries", "textile", "energy", "heritage",
]
_ROLE = [
    "engineer", "chef", "coordinator", "analyst", "technician", "planner",
    "inspector", "educator", "surveyor", "operator", "designer", "advisor",
]

# Two of six templates mention the conversation's city: it then appears in
# ~1/3 of a conversation's turns, so the strict-majority token filter
# (pipeline.MAJORITY_TURN_FRACTION) usually drops it from the record
# signature — context noise, not an entity feature. Template-specific words
# appear in ~1/6 of turns and are always dropped.
_TEMPLATES = [
    "i am looking for a {p} position in the {c} area",
    "we urgently need an experienced {p} for our {c} office",
    "candidate profile matches {p} with strong references provided",
    "searching openings for {p} roles available immediately",
    "the {p} vacancy remains open this quarter",
    "shortlisted applicants for {p} must pass the final screening",
]

_CITIES = [
    "johannesburg", "cape town", "durban", "pretoria", "gqeberha",
    "bloemfontein", "polokwane", "kimberley",
]

_BASE_TS = dt.datetime(2025, 1, 1, 0, 0, 0)


@dataclass(frozen=True)
class Scale:
    convs: int
    entities: int
    turns_lo: int = 4
    turns_hi: int = 10


SCALES = {
    "xs": Scale(convs=60, entities=12),
    "s": Scale(convs=1000, entities=100),
    # entities <= 144 + (1728 - 144): every bench entity keeps a unique ref
    # token, so gold clusters stay separable at scale
    "bench": Scale(convs=50_000, entities=1700),
    # scaling-evidence corpora: more conversations, same entity count. With
    # the signature collapse the fuzzy stages are tiny, so the scaling
    # regime is set by the LINEAR stages (scan/canonicalize/tokenize/record
    # aggregation) — the corpus must be big enough that their parallel work
    # dominates fixed orchestration overhead (Gustafson: grow the problem,
    # not the percentages). bench16 (5.6M turns) is the evidence corpus.
    "bench4": Scale(convs=200_000, entities=1700),
    # Scaling-evidence corpora run 8-12 turns per conversation (vs 4-10 on
    # the gate corpora): with ~500-950 exact-duplicate records per entity,
    # 4-turn conversations make the majority-vote signature lossy often
    # enough (~0.5% of records drop a phrase word) that doubly-degraded
    # record pairs percolate sibling entities into one giant component —
    # a LABEL-NOISE artifact of the generator, not a pipeline property
    # (scores of those pairs sit inside the same-entity score band, so no
    # threshold separates them). 8+ turns of evidence per conversation
    # keeps signature recovery reliable at any duplication factor, the way
    # real agent transcripts carry the entity mention many times.
    "bench16": Scale(convs=800_000, entities=1700, turns_lo=8, turns_hi=12),
    "bench32": Scale(convs=1_600_000, entities=1700, turns_lo=8, turns_hi=12),
    "bench64": Scale(convs=3_200_000, entities=1700, turns_lo=8, turns_hi=12),
}


def entity_phrases(n: int, rng: random.Random) -> list[str]:
    """n distinct gold entity phrases like 'senior pastry chef'.

    For n <= 144 a mutually-orthogonal construction guarantees any two
    phrases share AT MOST ONE of (adj, noun, role): a = i%12, noun index
    cycles with the quotient, role = (a + noun) % 12. Keeps hard negatives
    hard but separable. Beyond 144 (bench scale, where F1 is not gated)
    remaining product combos are appended.
    """
    m = len(_ADJ)
    phrases = []
    for i in range(min(n, m * m)):
        a = i % m
        q = i // m
        nn = (a + q) % m
        r = (a + nn) % m
        phrases.append(f"{_ADJ[a]} {_NOUN[nn]} {_ROLE[r]}")
    if n > m * m:
        combos = [
            " ".join(c)
            for c in itertools.product(_ADJ, _NOUN, _ROLE)
        ]
        rng.shuffle(combos)
        seen = set(phrases)
        # beyond the orthogonal 144, product combos share 2 of 3 words with
        # siblings — a unique reference token keeps every entity pairwise
        # separable (Jaccard vs any sibling <= ~0.43 even when both records
        # retain the same city token, vs >= ~0.67 within an entity), the way
        # a real entity mention carries a consistent name/identifier.
        for c in combos:
            if len(phrases) >= n:
                break
            if c not in seen:
                seen.add(c)
                phrases.append(f"{c} ref{len(phrases):05d}")
        k = 0
        while len(phrases) < n:  # n > 1728: combos recycle, ref stays unique
            phrases.append(f"{combos[k % len(combos)]} ref{len(phrases):05d}")
            k += 1
    return phrases


def _typo(word: str, rng: random.Random) -> str:
    """Swap two adjacent chars — stays within Jaro-Winkler reach."""
    if len(word) < 4:
        return word
    i = rng.randrange(1, len(word) - 2)
    return word[:i] + word[i + 1] + word[i] + word[i + 2 :]


def _noisify(text: str, rng: random.Random) -> str:
    words = text.split(" ")
    r = rng.random()
    if r < 0.25:  # one adjacent-char typo in a long word
        cand = [i for i, w in enumerate(words) if len(w) >= 5]
        if cand:
            i = rng.choice(cand)
            words[i] = _typo(words[i], rng)
    elif r < 0.45:  # case flip a word
        i = rng.randrange(len(words))
        words[i] = words[i].upper()
    out = " ".join(words)
    r = rng.random()
    if r < 0.2:  # inject newline at a space
        spaces = [i for i, ch in enumerate(out) if ch == " "]
        if spaces:
            i = rng.choice(spaces)
            out = out[:i] + "\n" + out[i + 1 :]
    elif r < 0.35:  # duplicate whitespace
        spaces = [i for i, ch in enumerate(out) if ch == " "]
        if spaces:
            i = rng.choice(spaces)
            out = out[:i] + "  " + out[i + 1 :]
    elif r < 0.45:  # HTML-ish fragment
        out = "<b>" + out + "</b>"
    return out


def _emit_conv(rows, gold, ci, eid, phrases, sc, rng) -> None:
    """One conversation's turns + gold row. rng draw ORDER is part of the
    corpus definition — both generators route through here."""
    conv_id = f"conv-{ci:06d}"
    phrase = phrases[eid]
    gold.append((conv_id, eid, phrase))
    n_turns = rng.randrange(sc.turns_lo, sc.turns_hi + 1)
    # templates CYCLE (random phase) instead of i.i.d. draws: with an
    # i.i.d. draw ~9% of 4-turn conversations repeat one template in a
    # majority of turns, pushing that template's words into the record
    # signature and diluting it below the match prefilter (measured 16
    # false-negative pairs on the xs corpus).
    t_off = rng.randrange(len(_TEMPLATES))
    for ti in range(n_turns):
        role = ROLES[ti % len(ROLES)]
        tool = rng.choice(TOOLS) if role == "tool" else ""
        template = _TEMPLATES[(t_off + ti) % len(_TEMPLATES)]
        # context tokens (city) vary PER TURN — like tool output or
        # incidental context in real agent transcripts — so only the
        # entity mention repeats across a conversation's turns. A fixed
        # per-conversation city was tried and is an ER trap: ~10% of
        # records then carry their city into the signature, and under
        # TRANSITIVE clustering the rare same-city pair between sibling
        # entities chain-merges clusters (measured: the 50k-conv bench
        # corpus collapsed into one giant component).
        city = rng.choice(_CITIES)
        text = _noisify(template.format(p=phrase, c=city), rng)
        ts = _BASE_TS + dt.timedelta(seconds=ci * 3600 + ti * 60)
        rows.append((conv_id, ti, role, text, tool, ts))


def generate_transcript_shard(
    scale: str, shard: int, n_shards: int, seed: int = 42
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Shard `shard` of `n_shards` of a PARALLEL-generated corpus.

    Deterministic function of (scale, shard, n_shards, seed): each shard
    seeds its own rng with "{seed}:{shard}", and entity assignment is plain
    round-robin ci % entities (no global shuffle), so shards are
    independent. NOT row-identical to `generate_transcripts` at the same
    scale — it is a sibling corpus with the same statistics, used for the
    big scaling-evidence corpora whose single-threaded generation would
    take an hour. Same schema, same gold contract.
    """
    sc = SCALES[scale]
    phrases = entity_phrases(sc.entities, random.Random(seed))
    lo = shard * sc.convs // n_shards
    hi = (shard + 1) * sc.convs // n_shards
    rng = random.Random(f"{seed}:{shard}")
    rows: list = []
    gold: list = []
    for ci in range(lo, hi):
        _emit_conv(rows, gold, ci, ci % sc.entities, phrases, sc, rng)
    turns = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    turns["turn_idx"] = turns["turn_idx"].astype("int32")
    gold_df = pd.DataFrame(gold, columns=["conv_id", "entity_id", "entity_phrase"])
    return turns, gold_df


def generate_transcripts(
    scale: str = "xs", seed: int = 42
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Return (turns_df, gold_df).

    turns_df columns: conv_id, turn_idx (int32), role, text, tool, ts.
    gold_df columns: conv_id, entity_id, entity_phrase.
    """
    sc = SCALES[scale]
    rng = random.Random(seed)
    phrases = entity_phrases(sc.entities, rng)

    # balanced entity assignment (shuffled round-robin): every entity gets
    # convs/entities conversations, so no entity's tokens can cross the
    # corpus boilerplate turn-DF threshold (pipeline.TURN_STOP_DF).
    assignment = [ci % sc.entities for ci in range(sc.convs)]
    rng.shuffle(assignment)

    rows = []
    gold = []
    for ci in range(sc.convs):
        _emit_conv(rows, gold, ci, assignment[ci], phrases, sc, rng)

    turns = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    turns["turn_idx"] = turns["turn_idx"].astype("int32")
    gold_df = pd.DataFrame(gold, columns=["conv_id", "entity_id", "entity_phrase"])
    return turns, gold_df


TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp"
)


def transcripts_spark(spark, scale: str = "xs", seed: int = 42):
    """(turns DataFrame, gold DataFrame) materialized into Spark."""
    turns, gold = generate_transcripts(scale, seed)
    tdf = spark.createDataFrame(turns, schema=TRANSCRIPT_SCHEMA)
    gdf = spark.createDataFrame(gold)
    return tdf, gdf
