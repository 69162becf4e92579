"""T-golden: full ER pipeline vs single-process oracle on the xs corpus.

Gates (BASELINE.json): Spark clusters == oracle clusters (pairwise F1 1.0 by
construction — identical semantics), and both >= 0.99 pairwise F1 against the
generator's gold entity labels on labeled pairs at shared blocking keys.
"""

from __future__ import annotations

import pytest

from tabiya_livelihoods_classifier_spark.config import ERConfig
from tabiya_livelihoods_classifier_spark.data.transcripts import TRANSCRIPT_SCHEMA
from tabiya_livelihoods_classifier_spark.plans.evaluate import (
    labeled_pairs_from_gold,
    pairwise_f1,
)
from tabiya_livelihoods_classifier_spark.plans.oracle import oracle_pipeline
from tabiya_livelihoods_classifier_spark.plans.pipeline import er_pipeline


@pytest.fixture(scope="module")
def results(spark, xs_corpus):
    turns, gold = xs_corpus
    cfg = ERConfig()
    tdf = spark.createDataFrame(turns, schema=TRANSCRIPT_SCHEMA)
    spark_out = er_pipeline(spark, tdf, cfg)
    spark_clusters = {
        r.rid: r.component for r in spark_out["clusters"].collect()
    }
    oracle_out = oracle_pipeline(turns, cfg)
    return turns, gold, spark_out, spark_clusters, oracle_out


def test_spark_matches_oracle_exactly(results):
    _, _, _, spark_clusters, oracle_out = results
    assert spark_clusters == oracle_out["clusters"]


def test_candidate_pairs_match_oracle(results):
    _, _, spark_out, _, oracle_out = results
    got = {
        (r.id_a, r.id_b) for r in spark_out["pairs"].collect()
    }
    assert got == oracle_out["pairs"]


def test_edges_match_oracle(results):
    _, _, spark_out, _, oracle_out = results
    got = {(r.id_a, r.id_b) for r in spark_out["edges"].collect()}
    assert got == set(oracle_out["edges"])


def test_pairwise_f1_vs_gold(results):
    _, gold, _, spark_clusters, oracle_out = results
    pairs = labeled_pairs_from_gold(gold)
    spark_f1 = pairwise_f1(spark_clusters, pairs)
    oracle_f1 = pairwise_f1(oracle_out["clusters"], pairs)
    assert spark_f1 == oracle_f1
    assert spark_f1.f1 >= 0.99, spark_f1
