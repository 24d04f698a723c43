"""Shared SparkSession for the test suite (local, small parallelism)."""

from __future__ import annotations

import pytest

from hierarchical_to_relational_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="h2r-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g", "spark.sql.autoBroadcastJoinThreshold": "1MB"},
    )
    yield s


def rows_as_set(df):
    """Order-insensitive comparison helper: DataFrame → set of tuples
    (mirrors the reference's HashSet golden comparison,
    HierarchyToRelationalTest.java:272)."""
    return {tuple(r) for r in df.collect()}
