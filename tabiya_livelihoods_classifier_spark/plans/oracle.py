"""Single-process oracle: numpy/pure-python twin of the ER pipeline.

Used ONLY to produce golden outputs for tests (SURVEY §7.2 item 3). Every
step replicates the Spark semantics exactly — same canonicalization, token
rules, md5 MinHash, Jaccard/Jaro-Winkler/cosine arithmetic in the same
IEEE-754 operation order — so Spark clusters must match these bit-for-bit
(pairwise F1 == 1.0), and both are then measured against the generator's
gold entity labels (target >= 0.99 per BASELINE.json).

Reference semantic ancestors: canonicalize inference/linker.py:147-150 +
whitespace collapse 1_1_harambee...py:228-236; thresholding
evaluator.py:190; transitive grouping 3_2b...py:473-532 (as union-find).
"""

from __future__ import annotations

import hashlib
import re
from collections import defaultdict

import pandas as pd

from tabiya_livelihoods_classifier_spark.config import ERConfig
from tabiya_livelihoods_classifier_spark.functions.embed import embed_text
from tabiya_livelihoods_classifier_spark.functions.strsim import jaro_winkler
from tabiya_livelihoods_classifier_spark.plans.pipeline import STOP_TOKEN_DF

_WS_RE = re.compile(r"[\n\r\t]")
_MULTI_SPACE_RE = re.compile(r" {2,}")
_TOKEN_RE = re.compile(r"[^a-z0-9]+")


def reference_canonicalize(text: str | None) -> str:
    """Python twin of functions.text.canonicalize_text (the per-turn invariant)."""
    t = text or ""
    t = _WS_RE.sub(" ", t)
    t = _MULTI_SPACE_RE.sub(" ", t)
    return t.strip()


def _tokens(text: str) -> list[str]:
    return [t for t in _TOKEN_RE.split(text.lower()) if t]


def _dedupe_keep_order(xs: list[str]) -> list[str]:
    seen: set[str] = set()
    out = []
    for x in xs:
        if x not in seen:
            seen.add(x)
            out.append(x)
    return out


def _shingles(toks: list[str], width: int) -> list[str]:
    if len(toks) < width:
        return [" ".join(toks)]
    return _dedupe_keep_order(
        [" ".join(toks[i : i + width]) for i in range(len(toks) - width + 1)]
    )


def _minhash_band_keys(
    shingle_list: list[str], num_hashes: int, band_rows: int
) -> list[str]:
    sig: list[str | None] = []
    for i in range(num_hashes):
        sig.append(
            min(
                (
                    hashlib.md5(f"{i}:{s}".encode("utf-8")).hexdigest()
                    for s in shingle_list
                ),
                default=None,  # empty set -> NULL min, skipped by concat_ws
            )
        )
    keys = []
    for b in range(0, num_hashes, band_rows):
        parts = [f"b{b // band_rows}"] + [
            s for s in sig[b : b + band_rows] if s is not None
        ]
        keys.append("|".join(parts))
    return keys


def _seq_dot(a, b) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def _cosine(a, b) -> float:
    import math

    dot = _seq_dot(a, b)
    na = math.sqrt(_seq_dot(a, a))
    nb = math.sqrt(_seq_dot(b, b))
    if na > 0 and nb > 0:
        return dot / (na * nb)
    return 0.0


class UnionFind:
    def __init__(self):
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        self.parent.setdefault(x, x)
        while self.parent[x] != x:
            self.parent[x] = self.parent[self.parent[x]]
            x = self.parent[x]
        return x

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # min-id representative, matching hash-min CC output
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            self.parent[hi] = lo


def oracle_pipeline(turns: pd.DataFrame, cfg: ERConfig = ERConfig()) -> dict:
    """Run the full single-process pipeline on a transcript pandas frame.

    Returns dict with records, pairs, scored, edges, clusters
    (conv_id -> component id = min conv_id in component).
    """
    # stage 1+2: canonical record per conversation; signature tokens are
    # those occurring in a strict majority of the conversation's turns
    # (pipeline.MAJORITY_TURN_FRACTION), minus corpus-level stop tokens.
    from tabiya_livelihoods_classifier_spark.plans.pipeline import (
        MAJORITY_TURN_FRACTION,
        TURN_STOP_DF,
    )

    by_conv: dict[str, list[tuple[int, str, str]]] = defaultdict(list)
    for row in turns.itertuples(index=False):
        by_conv[row.conv_id].append(
            (int(row.turn_idx), reference_canonicalize(row.text), row.tool or "")
        )

    # corpus boilerplate by turn document-frequency
    n_turns_total = 0
    turn_df: dict[str, int] = defaultdict(int)
    for items in by_conv.values():
        for _, text, _ in items:
            n_turns_total += 1
            for t in set(_tokens(text)):
                turn_df[t] += 1
    turn_stop = {t for t, c in turn_df.items() if c > TURN_STOP_DF * n_turns_total}

    recs: dict[str, dict] = {}
    for conv_id, items in by_conv.items():
        items.sort(key=lambda x: x[0])
        record_text = " ".join(t for _, t, _ in items)
        role_sig = ",".join(sorted({tool for _, _, tool in items if tool}))
        n_turns = len({ti for ti, _, _ in items})
        turn_count: dict[str, int] = defaultdict(int)
        for _, text, _ in items:
            for t in set(_tokens(text)) - turn_stop:
                turn_count[t] += 1
        toks_all = sorted(
            t for t, c in turn_count.items() if c > MAJORITY_TURN_FRACTION * n_turns
        )
        recs[conv_id] = {"record_text": record_text, "role_sig": role_sig,
                         "tokens_all": toks_all}

    n_docs = len(recs)
    df_count: dict[str, int] = defaultdict(int)
    for r in recs.values():
        for t in r["tokens_all"]:
            df_count[t] += 1
    common = {t for t, c in df_count.items() if c > STOP_TOKEN_DF * n_docs}

    for conv_id, r in recs.items():
        toks = sorted(set(r["tokens_all"]) - common)
        r["tokens"] = toks
        r["name_key"] = " ".join(toks)

    # stage 2b: signature collapse twin (pipeline.signature_records) —
    # records sharing a name_key collapse to one node; sid = min member rid;
    # composite blocking keys are the union over member role_sigs
    sig_members: dict[str, list[str]] = defaultdict(list)
    for conv_id, r in recs.items():
        sig_members[r["name_key"]].append(conv_id)
    sigs: dict[str, dict] = {}
    for name_key, members in sig_members.items():
        sid = min(members)
        r0 = recs[members[0]]
        rs_counts: dict[str, int] = defaultdict(int)
        for m in members:
            rs_counts[recs[m]["role_sig"]] += 1
        sigs[sid] = {
            "name_key": name_key,
            "tokens": r0["tokens"],
            "role_sigs": dict(sorted(rs_counts.items())),
            "members": sorted(members),
            "embedding": embed_text(name_key, cfg.embed_dim),
        }

    # stage 3: blocking (MinHash directly over signature tokens); each
    # membership carries its RECORD mass (band keys: all members; composite
    # keys: the members with that role_sig)
    blocks: dict[str, list[tuple[str, int]]] = defaultdict(list)
    for sid, s in sigs.items():
        n_members = len(s["members"])
        lead = s["tokens"][0] if s["tokens"] else "_"
        for k in _minhash_band_keys(s["tokens"], cfg.num_hashes, cfg.band_rows):
            blocks[k].append((sid, n_members))
        for rs, rs_n in s["role_sigs"].items():
            blocks["#".join(["ck", rs, lead])].append((sid, rs_n))
    # block purging by RESIDUAL record mass (purge_oversized_by_mass twin):
    # mass outside the dominant signature must stay under the threshold
    blocks = {
        k: [sid for sid, _ in v]
        for k, v in blocks.items()
        if sum(m for _, m in v) - max(m for _, m in v) <= cfg.purge_block_size
    }
    max_block = max((len(v) for v in blocks.values()), default=0)
    assert max_block <= cfg.max_block_size, (
        "oracle does not replicate salting; shrink fixture or raise cap"
    )

    # duplicate-block collapse twin (candidate_pairs: blocks with identical
    # member sets count once toward n_common)
    distinct_blocks = {tuple(sorted(v)) for v in blocks.values()}
    pair_counts: dict[tuple[str, str], int] = defaultdict(int)
    for ms in distinct_blocks:
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                pair_counts[(ms[i], ms[j])] += 1
    # meta-blocking twin (candidate_pairs min_common)
    pairs: set[tuple[str, str]] = {
        p for p, c in pair_counts.items() if c >= cfg.min_common_blocks
    }

    # stage 4: scoring (signature level)
    scored = []
    edges = []
    for a, b in sorted(pairs):
        ra, rb = sigs[a], sigs[b]
        sa, sb = set(ra["tokens"]), set(rb["tokens"])
        union = sa | sb
        jac = (len(sa & sb) / len(union)) if union else 0.0
        if jac < cfg.min_jaccard:  # scoring cascade prefilter twin
            continue
        jw = jaro_winkler(ra["name_key"], rb["name_key"])
        cos = _cosine(ra["embedding"], rb["embedding"])
        score = cfg.w_jaccard * jac + cfg.w_jw * jw + cfg.w_cosine * cos
        scored.append((a, b, jac, jw, cos, score))
        if score >= cfg.match_threshold:
            edges.append((a, b))

    # stage 5: clustering over signatures, composed back to records
    uf = UnionFind()
    for sid in sigs:
        uf.find(sid)
    for a, b in edges:
        uf.union(a, b)
    # min sid per component == min conv_id (each sid is its group's min rid)
    comp_min: dict[str, str] = {}
    for sid in sigs:
        root = uf.find(sid)
        cur = comp_min.get(root)
        if cur is None or sid < cur:
            comp_min[root] = sid
    clusters = {
        conv_id: comp_min[uf.find(sid)]
        for sid, s in sigs.items()
        for conv_id in s["members"]
    }

    return {
        "records": recs,
        "signatures": sigs,
        "pairs": pairs,
        "scored": scored,
        "edges": edges,
        "clusters": clusters,
    }
