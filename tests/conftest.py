"""Shared pytest fixtures: one local SparkSession for the whole run."""

from __future__ import annotations

import pytest

from tabiya_livelihoods_classifier_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def xs_corpus():
    from tabiya_livelihoods_classifier_spark.data.transcripts import (
        generate_transcripts,
    )

    return generate_transcripts("xs", seed=42)
