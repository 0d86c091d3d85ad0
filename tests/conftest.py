"""Shared pytest fixtures: one session-scoped local SparkSession."""

from __future__ import annotations

import pytest

from instructor_embedding_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="ies-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_small_dir():
    return SF_SMALL


@pytest.fixture(scope="session")
def sf_correctness_dir():
    return SF_CORRECTNESS
