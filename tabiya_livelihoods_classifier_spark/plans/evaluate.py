"""Pairwise-F1 evaluation harness (BASELINE.json metric).

Direct descendant of the reference's IR evaluation contract
(inference/evaluator.py:68-168): labeled pairs at a shared blocking key,
predicted-match = same cluster, F1 over (precision, recall).
"""

from __future__ import annotations

import itertools
import random
from dataclasses import dataclass

import pandas as pd


@dataclass(frozen=True)
class PairwiseF1:
    precision: float
    recall: float
    f1: float
    tp: int
    fp: int
    fn: int


def pairwise_f1(
    clusters: dict[str, str], labeled_pairs: pd.DataFrame
) -> PairwiseF1:
    """labeled_pairs columns: conv_id_a, conv_id_b, is_match (bool)."""
    tp = fp = fn = 0
    for row in labeled_pairs.itertuples(index=False):
        pred = clusters.get(row.conv_id_a) == clusters.get(row.conv_id_b)
        if pred and row.is_match:
            tp += 1
        elif pred and not row.is_match:
            fp += 1
        elif (not pred) and row.is_match:
            fn += 1
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = (
        2 * precision * recall / (precision + recall) if precision + recall else 0.0
    )
    return PairwiseF1(precision, recall, f1, tp, fp, fn)


def labeled_pairs_sampled(
    gold: pd.DataFrame,
    seed: int = 42,
    pos_per_entity: int = 500,
    neg_per_conv: int = 1,
) -> pd.DataFrame:
    """Sampled labeled pairs for BIG corpora: `labeled_pairs_from_gold`
    enumerates every within-entity pair (quadratic in entity size — 752M
    pairs at bench32); this draws up to `pos_per_entity` random positive
    pairs per entity plus the usual random negatives. Estimates the same
    pairwise precision/recall to within sampling error."""
    rng = random.Random(seed)
    by_entity: dict[int, list[str]] = {}
    phrase_of: dict[str, str] = {}
    for row in gold.itertuples(index=False):
        by_entity.setdefault(row.entity_id, []).append(row.conv_id)
        phrase_of[row.conv_id] = row.entity_phrase
    rows = []
    for eid, convs in by_entity.items():
        convs = sorted(convs)
        n = len(convs)
        total = n * (n - 1) // 2
        if total <= pos_per_entity:
            pairs = itertools.combinations(convs, 2)
        else:
            seen = set()
            while len(seen) < pos_per_entity:
                i, j = rng.randrange(n), rng.randrange(n)
                if i != j:
                    seen.add((min(i, j), max(i, j)))
            pairs = ((convs[i], convs[j]) for i, j in seen)
        for a, b in pairs:
            rows.append((a, b, f"blk-{eid}", True))
    all_convs = sorted(phrase_of)
    for conv in all_convs:
        for _ in range(neg_per_conv):
            # redraw (bounded) on self / same-entity hits so every
            # conversation contributes its full negative quota — a skipped
            # draw would bias the pool on small or few-entity corpora
            for _attempt in range(8):
                other = all_convs[rng.randrange(len(all_convs))]
                if other != conv and phrase_of[other] != phrase_of[conv]:
                    a, b = (conv, other) if conv < other else (other, conv)
                    rows.append((a, b, "blk-neg", False))
                    break
    return pd.DataFrame(
        rows, columns=["conv_id_a", "conv_id_b", "block_key", "is_match"]
    ).drop_duplicates(subset=["conv_id_a", "conv_id_b"])


def labeled_pairs_from_gold(
    gold: pd.DataFrame, seed: int = 42, neg_per_conv: int = 3
) -> pd.DataFrame:
    """FIXTURES.md §3.1: matched pairs within gold clusters + hard negatives,
    each tagged with a block_key; one hot key covers >=50% of pairs (skew).
    """
    rng = random.Random(seed)
    by_entity: dict[int, list[str]] = {}
    phrase_of: dict[str, str] = {}
    for row in gold.itertuples(index=False):
        by_entity.setdefault(row.entity_id, []).append(row.conv_id)
        phrase_of[row.conv_id] = row.entity_phrase
    rows = []
    hot_key = "hot-block"
    for eid, convs in by_entity.items():
        convs = sorted(convs)
        for a, b in itertools.combinations(convs, 2):
            key = hot_key if rng.random() < 0.55 else f"blk-{eid}"
            rows.append((a, b, key, True))
    all_convs = sorted(phrase_of)
    for conv in all_convs:
        for _ in range(neg_per_conv):
            other = all_convs[rng.randrange(len(all_convs))]
            if other == conv or phrase_of[other] == phrase_of[conv]:
                continue
            a, b = (conv, other) if conv < other else (other, conv)
            key = hot_key if rng.random() < 0.55 else "blk-neg"
            rows.append((a, b, key, False))
    df = pd.DataFrame(
        rows, columns=["conv_id_a", "conv_id_b", "block_key", "is_match"]
    ).drop_duplicates(subset=["conv_id_a", "conv_id_b"])
    return df
