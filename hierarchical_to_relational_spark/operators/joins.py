"""Temporal join operators Spark lacks as built-ins, composed from
DataFrame primitives (no Python on the hot path).

**As-of join** (``asof_join``): for each left row, attach the single most
recent right row with ``right_ts <= left_ts`` per key — the canonical
"state as of event time" lookup (market data, dimension snapshots,
config-at-time-of-event). Implemented as ONE union + ONE window pass:

    union(left tagged 1, right tagged 0)
      → last(right payload, ignorenulls) OVER (PARTITION BY keys
            ORDER BY ts, side ROWS UNBOUNDED PRECEDING)
      → keep left rows

Cost: one shuffle of |L|+|R| rows on the key — the same exchange a
sort-merge join would pay, with no range-explosion (a naive
``l.ts >= r.ts`` join is quadratic per key). Skewed keys behave like any
window: one task per key partition; salt upstream if a single key exceeds
a task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _epoch_seconds(df: DataFrame, colname: str) -> Column:
    """Numeric time columns pass through; TIMESTAMP/TIMESTAMP_NTZ become
    epoch seconds (NTZ can't cast to DOUBLE directly in Spark 4; the
    session-tz interpretation is consistent across both join sides, which
    is all bucketing/tolerance arithmetic needs)."""
    c = F.col(colname)
    if df.schema[colname].dataType.typeName() in ("timestamp", "timestamp_ntz"):
        return c.cast("timestamp").cast("double")
    return c.cast("double")


def _has_unorderable(dt) -> bool:
    """True when a type (or any nested part of it) is not orderable in
    Spark — MapType is the practical case (no < ordering defined)."""
    from pyspark.sql import types as T

    if isinstance(dt, T.MapType):
        return True
    if isinstance(dt, T.ArrayType):
        return _has_unorderable(dt.elementType)
    if isinstance(dt, T.StructType):
        return any(_has_unorderable(f.dataType) for f in dt.fields)
    return False


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_payload: list[str] | None = None,
    tolerance: int | None = None,
    suffix: str = "_asof",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Backward as-of join: every left row, plus the latest right payload
    at or before its timestamp (NULLs when no right row precedes it).

    ``right_payload``: right columns to attach (default: all non-key,
    non-ts columns), each renamed with ``suffix``. ``tolerance``: optional
    max allowed (left_ts - right_ts) in the timestamp's native unit
    (seconds for timestamps); older matches become NULL, matching pandas'
    ``merge_asof(tolerance=...)``.

    ``tiebreak_cols``: ORDERABLE right columns that order duplicate right
    rows at the same (key, ts) — the row with the max tiebreak tuple wins
    (``max_by``). Required when the payload contains non-orderable types
    (maps), where the default max-payload-struct dedup cannot compare."""
    if right_payload is None:
        right_payload = [c for c in right.columns if c not in on and c != right_ts]
    out_cols = [f"{c}{suffix}" for c in right_payload]

    # Determinism: duplicate right rows at the same (key, ts) would make
    # F.last() pick whichever lands physically last in the window's tie
    # region — partitioning-dependent. Collapse them first (one hash agg
    # with map-side combine): max over the payload struct, which requires
    # orderable payload types — or max_by over explicit tiebreak columns
    # when the payload holds maps.
    if tiebreak_cols is not None:
        packed = right.groupBy(*on, right_ts).agg(
            F.max_by(F.struct(*right_payload), F.struct(*tiebreak_cols)).alias("_rp")
        )
    else:
        for c in right_payload:
            if _has_unorderable(right.schema[c].dataType):
                raise TypeError(
                    f"asof_join payload column {c!r} has a non-orderable type "
                    f"({right.schema[c].dataType.simpleString()}); pass "
                    f"tiebreak_cols=[...] to define which duplicate wins"
                )
        packed = right.groupBy(*on, right_ts).agg(
            F.max(F.struct(*right_payload)).alias("_rp")
        )
    right = packed.select(
        *on, right_ts, *[F.col(f"_rp.{c}").alias(c) for c in right_payload]
    )

    l_tag = left.select(
        *on,
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_p_{c}") for c in right_payload],
        F.struct(*left.columns).alias("_lrow"),
    )
    r_tag = right.select(
        *on,
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_p_{c}") for c in right_payload],
        F.lit(None).cast(
            "struct<" + ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in left.schema.fields) + ">"
        ).alias("_lrow"),
    )
    # right rows sort before left rows at equal ts (<= semantics)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ats"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = l_tag.unionByName(r_tag)
    carried = [F.last(f"_p_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}") for c in right_payload]
    matched_ts = F.last(F.when(F.col("_side") == 0, F.col("_ats")), ignorenulls=True).over(w)
    out = (
        u.select("*", *carried, matched_ts.alias("_mts"))
        .where(F.col("_side") == 1)
    )
    if tolerance is not None:
        ats, mts = _epoch_seconds(out, "_ats"), _epoch_seconds(out, "_mts")
        stale = F.col("_mts").isNull() | (ats - mts > F.lit(float(tolerance)))
        out = out.select(
            *[c for c in out.columns if c not in out_cols],
            *[F.when(stale, F.lit(None)).otherwise(F.col(c)).alias(c) for c in out_cols],
        )
    return out.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *out_cols,
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_seconds: int,
) -> DataFrame:
    """Range/interval join at scale: every (point, interval) pair with
    ``start_ts <= point_ts <= end_ts`` per key.

    A naive inequality join plans as a per-key nested loop (quadratic in
    hot keys; OSS Spark has no range-join optimization). This is the
    bucketized form: intervals explode into the fixed-width time buckets
    they cover, points map to their single bucket, the join is a plain
    EQUI-join on (key, bucket), and the exact range predicate filters the
    bucket-coarse candidates. Cost: |P| + |I|·(avg interval span /
    bucket_seconds) rows shuffled through a hash join — pick
    ``bucket_seconds`` near the typical interval length so intervals
    explode into O(1) buckets each.

    Output: all point columns + the interval's columns (caller aliases any
    collisions beforehand)."""
    p_bucket = F.floor(_epoch_seconds(points, point_ts) / bucket_seconds).cast("long")
    i_from = F.floor(_epoch_seconds(intervals, start_ts) / bucket_seconds).cast("long")
    i_to = F.floor(_epoch_seconds(intervals, end_ts) / bucket_seconds).cast("long")

    p = points.withColumn("_bkt", p_bucket)
    i = intervals.withColumn("_bkt", F.explode(F.sequence(i_from, i_to)))
    joined = p.join(i, [*on, "_bkt"]).where(
        (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) <= F.col(end_ts))
    )
    return joined.drop("_bkt")


def read_with_stats(
    spark,
    table,
    broadcast_threshold_bytes: int = 32 * 1024 * 1024,
    version: int | None = None,
) -> DataFrame:
    """Statistics-driven join input: read a SnapshotTable and attach a
    broadcast hint when the MANIFEST says its live bytes fit under the
    threshold. Spark's own size estimation sees only the scan's file sizes
    AFTER filters are planned and defaults to sort-merge for multi-file
    reads near the boundary; the table's commit_bytes stats are exact,
    cost nothing (no filesystem listing), and are known before planning —
    the same statistics-feed-the-optimizer pattern as Iceberg's
    table-level stats. Joining a dimension-sized table read this way
    against a fact stream plans a BroadcastHashJoin with zero exchange on
    the dimension side; a large table passes through unhinted and lets
    AQE pick the strategy."""
    df = table.read(spark, version=version)
    if table.total_bytes() <= broadcast_threshold_bytes:
        return F.broadcast(df)
    return df
