"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship ER-style query on sf0.001;
``queries()`` maps every implemented operator (SURVEY.md §2) to a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` provides the
DuckDB-equivalent SQL used by the correctness gate.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from tabiya_livelihoods_classifier_spark.plans import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: near-duplicate entity clustering over documents at sf0.001."""
    return Q.QUERIES["q26_er_clusters"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(Q.ORACLE_SQL)
