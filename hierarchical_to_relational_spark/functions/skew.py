"""Skew-defusing aggregation helpers (north_rule: salted repartition on
``conv_id`` for hot conversations).

Spark's hash aggregation already does map-side partial aggregation, which
collapses hot keys before the shuffle — for algebraic aggregates
(max/min/sum/count/max_by) that alone defuses most key skew. The explicit
two-phase *salted* form below is for cases where the reduce side must still
be spread (extremely hot keys whose partials remain large, or non-algebraic
follow-ups), and as the documented, testable skew path the north rule asks
for. AQE skew-join splitting (enabled in session.py) covers the join side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def with_salt(df: DataFrame, salt_buckets: int, salt_col: str = "_salt") -> DataFrame:
    """Deterministic salt derived from the whole row's hash — spreads a hot
    key across ``salt_buckets`` reducers without RNG (replay-stable)."""
    return df.withColumn(salt_col, F.pmod(F.xxhash64(*df.columns), F.lit(salt_buckets)).cast("int"))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation: group on (keys + salt), then on keys alone.

    ``aggs`` maps output name → (fn, source column), fn in
    {max, min, sum, count} — algebraic, so re-aggregating partials is exact
    (count partials combine with sum).
    """
    recombine = {"max": "max", "min": "min", "sum": "sum", "count": "sum"}
    for name, (fn, _) in aggs.items():
        if fn not in recombine:
            raise ValueError(f"non-algebraic aggregate {fn!r} for {name!r}")
    salted = with_salt(df, salt_buckets)
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[getattr(F, fn)(src).alias(name) for name, (fn, src) in aggs.items()]
    )
    phase2 = phase1.groupBy(*keys).agg(
        *[getattr(F, recombine[fn])(name).alias(name) for name, (fn, _) in aggs.items()]
    )
    return phase2


def salted_max(df: DataFrame, keys: list[str], value: str, salt_buckets: int = 16) -> DataFrame:
    """max(value) per keys, skew-safe (two-phase)."""
    return salted_agg(df, keys, {value: ("max", value)}, salt_buckets)
