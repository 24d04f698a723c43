"""Key-partitioned MERGE: last-write-wins upsert + whole-key tombstone
deletes into a SnapshotTable, copy-on-write over hash buckets.

This generalizes the reference's dedup idiom — its groupBy(parent, child,
level) + max/first aggregation (HierarchyFlattener.java:322-342) — into the
CDC merge core: group on the primary key, keep the row with the maximum
``(lsn, commit_ts)`` via ``max_by`` (hash aggregation: partial/map-side
combine makes it skew-tolerant, no sort needed, unlike a row_number window).

Order-insensitive and idempotent by construction: replaying events in any
order, with duplicates, converges to the same final state — this is how
out-of-order/late binlog data is handled without watermark-based event-time
processing (SURVEY.md §2.2 streaming row).

Physical shape at scale: the batch shuffles once on the LWW key, the target
is scanned only for affected buckets (manifest pruning), and only those
buckets are rewritten — the same partition-level copy-on-write Iceberg MERGE
produces.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from hierarchical_to_relational_spark.operators.normalize import META_BUCKET, META_LSN, META_OP, META_TS
from hierarchical_to_relational_spark.table.snapshot_table import SnapshotTable


def lww_latest(df: DataFrame, keys: list[str], order_cols: list[str]) -> DataFrame:
    """Keep, per key, the row with the maximum (order_cols) — via
    ``max_by(struct(payload), struct(order))`` hash aggregation.

    Preferred over ``row_number() OVER (PARTITION BY keys ORDER BY ...)``
    at scale: hash agg does map-side partial combine (hot keys collapse
    before the shuffle) and avoids the window's per-partition sort.
    """
    payload = [c for c in df.columns if c not in keys]
    packed = df.groupBy(*keys).agg(
        F.max_by(F.struct(*payload), F.struct(*order_cols)).alias("_r")
    )
    return packed.select(*keys, *[F.col(f"_r.{c}").alias(c) for c in payload])


def merge_lww(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    order_cols: list[str],
) -> DataFrame:
    """Standalone relational MERGE (no table layer): rows from source
    replace target rows with the same key iff their order columns are
    higher. Both inputs must share a schema containing keys + order_cols."""
    return lww_latest(target.unionByName(source, allowMissingColumns=True), keys, order_cols)


def _tombstone_rows(deletes_b: DataFrame, schema: T.StructType) -> DataFrame:
    """Delete watermarks → storable tombstone rows (null payload, _op='d')."""
    cols = [F.col(META_BUCKET), F.col("conv_id"), F.col(META_LSN)]
    out = deletes_b.select(*cols)
    for fld in schema.fields:
        if fld.name not in ("conv_id", META_LSN):
            if fld.name == META_OP:
                out = out.withColumn(META_OP, F.lit("d"))
            else:
                out = out.withColumn(fld.name, F.lit(None).cast(fld.dataType))
    return out.select(META_BUCKET, *schema.fieldNames())


def table_schema_for(upsert_cols: list[T.StructField]) -> T.StructType:
    """Target physical schema = user columns + merge metadata
    (_lsn, _commit_ts, _op)."""
    fields = list(upsert_cols)
    fields += [
        T.StructField(META_LSN, T.LongType(), False),
        T.StructField(META_TS, T.TimestampType(), True),
        T.StructField(META_OP, T.StringType(), False),
    ]
    return T.StructType(fields)


def apply_cdc_batch(
    spark: SparkSession,
    table: SnapshotTable,
    upserts: DataFrame,
    deletes: DataFrame,
    batch_id: str,
) -> dict:
    """Apply one normalized change batch to the table, exactly-once.

    upserts: conv_id, <turn columns...>, _lsn, _commit_ts  (from normalize)
    deletes: conv_id, _lsn  (max delete LSN per conversation in this batch)

    Steps: additively evolve schema if the batch is wider → bucket the batch
    → batch-local LWW → read only affected target buckets → re-resolve
    (LWW + tombstone watermark filter) → rewrite those buckets in one
    idempotent snapshot commit keyed by ``batch_id``.
    """
    t0 = time.monotonic()
    schema = table.schema()

    # --- additive schema evolution (widen target before merge) ---
    have = set(schema.fieldNames())
    incoming = [f for f in upserts.schema.fields if f.name not in (META_LSN, META_TS)]
    new_fields = [T.StructField(f.name, f.dataType, True) for f in incoming if f.name not in have]
    if new_fields:
        table.evolve(new_fields, batch_id=f"{batch_id}::evolve")
        schema = table.schema()

    bucket_of = table.bucket_col()
    ups = upserts.withColumn(META_BUCKET, bucket_of(F.col("conv_id"))).withColumn(META_OP, F.lit("u"))
    dels = deletes.withColumn(META_BUCKET, bucket_of(F.col("conv_id")))

    # batch-local LWW (collapses duplicate/out-of-order events before the
    # target scan; one shuffle on the primary key)
    ups = lww_latest(ups, [META_BUCKET, "conv_id", "turn_idx"], [META_LSN, META_TS])

    # affected buckets → driver (bounded by n_buckets: partition-pruning
    # metadata, not data)
    affected = sorted(
        r[0]
        for r in ups.select(META_BUCKET).union(dels.select(META_BUCKET)).distinct().collect()
    )
    if not affected:
        return {"batch_id": batch_id, "committed": False, "rows_written": 0, "buckets": [],
                "upserts": 0, "deletes": 0, "duration_s": time.monotonic() - t0, "max_lsn": None}

    current = table.read(spark, buckets=affected)

    ups_full = ups.unionByName(current.where(F.col(META_OP) == "u"), allowMissingColumns=True)
    tomb_all = (
        dels.select(META_BUCKET, "conv_id", META_LSN)
        .unionByName(current.where(F.col(META_OP) == "d").select(META_BUCKET, "conv_id", META_LSN))
    )
    # one watermark per conversation (algebraic max: map-side combine
    # defuses hot-conversation delete storms — the salted-agg equivalent)
    tomb = tomb_all.groupBy(META_BUCKET, "conv_id").agg(F.max(META_LSN).alias("_del_lsn"))

    resolved = lww_latest(ups_full, [META_BUCKET, "conv_id", "turn_idx"], [META_LSN, META_TS])
    live = (
        resolved.join(tomb, [META_BUCKET, "conv_id"], "left")
        .where(F.col("_del_lsn").isNull() | (F.col(META_LSN) > F.col("_del_lsn")))
        .drop("_del_lsn")
    )
    live = live.select(META_BUCKET, *schema.fieldNames())
    tomb_rows = _tombstone_rows(tomb.withColumnRenamed("_del_lsn", META_LSN), schema)
    final = live.unionByName(tomb_rows)

    # materialize once: both the stats action and the commit write read it
    final = final.persist()
    stats_row = final.groupBy().agg(
        F.count(F.lit(1)).alias("rows"),
        F.max(META_LSN).alias("max_lsn"),
        F.sum(F.when(F.col(META_OP) == "u", 1).otherwise(0)).alias("ups"),
        F.sum(F.when(F.col(META_OP) == "d", 1).otherwise(0)).alias("dels"),
    ).collect()[0]

    committed = table.commit_overwrite_buckets(final, affected, batch_id=batch_id)
    final.unpersist()
    return {
        "batch_id": batch_id,
        "committed": committed,
        "rows_written": stats_row["rows"],
        "upserts": stats_row["ups"],
        "deletes": stats_row["dels"],
        "max_lsn": stats_row["max_lsn"],
        "buckets": affected,
        "duration_s": time.monotonic() - t0,
    }


def read_transcripts(spark: SparkSession, table: SnapshotTable, version: int | None = None) -> DataFrame:
    """User-facing read: live rows only, metadata dropped, stable
    (conv_id, turn_idx) ordering left to the caller."""
    df = table.read(spark, version=version)
    user_cols = [n for n in table.schema(version).fieldNames() if not n.startswith("_")]
    return df.where(F.col(META_OP) == "u").select(*user_cols)
