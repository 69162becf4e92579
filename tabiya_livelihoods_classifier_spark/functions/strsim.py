"""Batched string-similarity metrics (SURVEY §2.8 M8, §2.6 U2).

Jaro-Winkler has no Spark built-in, so it is an Arrow-batched pandas UDF
(pure-python inner loop over one Arrow batch — no per-row Spark Python UDF).
Levenshtein uses Spark's built-in `levenshtein()`; `levenshtein_sim_expr`
normalizes it to [0,1]. Token-set Jaccard (reference evaluator.py:412-424)
is a pure column expression on array columns.

Parity contract: `jaro_winkler(a, b)` matches DuckDB's
`jaro_winkler_similarity` (fuzz-tested in tests/test_strsim.py) so oracle
SQL can reuse the DuckDB built-in.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def jaro(s1: str, s2: str) -> float:
    """Jaro similarity, matching DuckDB/rapidfuzz conventions exactly:
    empty input (either side) -> 0.0, and the transposition count uses
    integer floor division (t = flagged_mismatches // 2)."""
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0
    if s1 == s2:
        return 1.0
    window = max(len1, len2) // 2 - 1
    if window < 0:
        window = 0
    match1 = [False] * len1
    match2 = [False] * len2
    matches = 0
    for i, c1 in enumerate(s1):
        lo = max(0, i - window)
        hi = min(len2, i + window + 1)
        for j in range(lo, hi):
            if not match2[j] and s2[j] == c1:
                match1[i] = True
                match2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    k = 0
    for i in range(len1):
        if match1[i]:
            while not match2[k]:
                k += 1
            if s1[i] != s2[k]:
                transpositions += 1
            k += 1
    t = transpositions // 2
    m = matches
    return (m / len1 + m / len2 + (m - t) / m) / 3.0


def jaro_winkler(s1: str, s2: str, prefix_scale: float = 0.1) -> float:
    """Jaro-Winkler: Jaro boosted by common prefix (<=4 chars) when jaro>0.7."""
    j = jaro(s1, s2)
    if j > 0.7:
        prefix = 0
        for c1, c2 in zip(s1[:4], s2[:4]):
            if c1 != c2:
                break
            prefix += 1
        j += prefix * prefix_scale * (1.0 - j)
    return j


@F.pandas_udf(T.DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched Jaro-Winkler over two string columns."""
    av = a.fillna("").to_numpy()
    bv = b.fillna("").to_numpy()
    return pd.Series([jaro_winkler(x, y) for x, y in zip(av, bv)])


def levenshtein_sim_expr(a: Column, b: Column) -> Column:
    """1 - levenshtein/max(len) in [0,1]; built-in JVM levenshtein."""
    dist = F.levenshtein(a, b).cast("double")
    mx = F.greatest(F.length(a), F.length(b)).cast("double")
    return F.when(mx == 0, F.lit(1.0)).otherwise(1.0 - dist / mx)


def jaccard_expr(a: Column, b: Column) -> Column:
    """Token-set Jaccard of two array columns (evaluator.py:412-424)."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union == 0, F.lit(0.0)).otherwise(inter / union)


def jaccard_py(a: set[str], b: set[str]) -> float:
    """Single-process twin for the oracle."""
    if not a and not b:
        return 0.0
    return len(a & b) / len(a | b)
