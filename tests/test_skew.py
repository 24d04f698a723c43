"""Salted two-phase aggregation helpers (north_rule skew path)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hierarchical_to_relational_spark.functions.skew import salted_agg, salted_max, with_salt


def _skewed(spark, n_hot=2000, n_cold=50):
    rows = [("hot", i, float(i)) for i in range(n_hot)] + [
        (f"k{i}", i, float(i)) for i in range(n_cold)
    ]
    return spark.createDataFrame(rows, "k string, v int, x double")


def test_salted_max_equals_plain_max(spark):
    df = _skewed(spark)
    plain = {tuple(r) for r in df.groupBy("k").agg(F.max("v").alias("v")).collect()}
    salted = {tuple(r) for r in salted_max(df, ["k"], "v", salt_buckets=8).collect()}
    assert plain == salted


def test_salted_agg_multi_aggregate(spark):
    df = _skewed(spark)
    out = salted_agg(
        df, ["k"], {"mx": ("max", "v"), "mn": ("min", "v"), "s": ("sum", "v"), "n": ("count", "v")},
        salt_buckets=4,
    )
    plain = {
        tuple(r)
        for r in df.groupBy("k")
        .agg(F.max("v").alias("mx"), F.min("v").alias("mn"), F.sum("v").alias("s"), F.count("v").alias("n"))
        .collect()
    }
    assert {tuple(r) for r in out.collect()} == plain


def test_salted_agg_rejects_non_algebraic(spark):
    df = _skewed(spark, 10, 2)
    with pytest.raises(ValueError, match="non-algebraic"):
        salted_agg(df, ["k"], {"a": ("avg", "v")})


def test_with_salt_spreads_hot_key(spark):
    df = with_salt(_skewed(spark), 8)
    n_salts = (
        df.where(F.col("k") == "hot").select("_salt").distinct().count()
    )
    assert n_salts == 8  # the hot key fans out across all salt buckets
