"""SQL surface: expose a SnapshotTable to plain ``spark.sql`` users.

Everything else in the engine is Python-API; this thin layer registers
the resolved table state (and friends) as temp views so a downstream SQL
user can ``SELECT ... FROM transcripts`` without writing Python — the
same role Iceberg's catalog integration plays for its tables.

Views are SNAPSHOT-PINNED: each registration resolves the table at one
version (consistent reads — a concurrent commit can't tear a query), so
call ``register_views`` again (or ``refresh``) to advance. That is the
semantics a lakehouse SQL session gets from a catalog snapshot, made
explicit.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from hierarchical_to_relational_spark.operators.merge import (
    changes_between_timestamps,
    changes_since,
    read_transcripts,
    resolve,
)
from hierarchical_to_relational_spark.table.snapshot_table import SnapshotTable


def register_views(
    spark: SparkSession,
    table: SnapshotTable,
    prefix: str = "transcripts",
    version: int | None = None,
) -> dict:
    """Register SQL temp views over the table, pinned at ``version``
    (default: current):

    - ``<prefix>``          — live user-facing rows (LWW-resolved,
                              tombstones dropped, patches folded)
    - ``<prefix>_raw``      — resolved PHYSICAL rows incl. metadata
                              (_bucket, _lsn, _commit_ts, _op; tombstones
                              and retained patch rows visible) for
                              debugging / audits
    - ``<prefix>_history``  — the snapshot log (version, batch_id, kind,
                              committed_at, ...)

    Returns {"version": pinned version, "views": [names]}. Registration
    is lazy — no data is read until a query selects from a view."""
    v = table.current_version() if version is None else version
    read_transcripts(spark, table, version=v).createOrReplaceTempView(prefix)
    schema = table.schema(v)
    resolve(table.read(spark, version=v), schema).createOrReplaceTempView(f"{prefix}_raw")
    spark.createDataFrame(table.history()).createOrReplaceTempView(f"{prefix}_history")
    return {"version": v, "views": [prefix, f"{prefix}_raw", f"{prefix}_history"]}


def refresh(spark: SparkSession, table: SnapshotTable, prefix: str = "transcripts") -> dict:
    """Re-pin the views at the table's current version."""
    return register_views(spark, table, prefix=prefix)


def register_changes_view(
    spark: SparkSession,
    table: SnapshotTable,
    since_version: int | None = None,
    since_ts: float | None = None,
    until_ts: float | None = None,
    prefix: str = "transcripts",
) -> str:
    """Register ``<prefix>_changes``: the net CDC diff since a version or
    wall-clock cursor (exactly one must be given), queryable as plain SQL
    — ``SELECT * FROM transcripts_changes WHERE change_op = 'd'``."""
    if (since_version is None) == (since_ts is None):
        raise ValueError("pass exactly one of since_version / since_ts")
    if since_version is not None:
        df = changes_since(spark, table, since_version)
    else:
        df = changes_between_timestamps(spark, table, since_ts, until_ts=until_ts)
    name = f"{prefix}_changes"
    df.createOrReplaceTempView(name)
    return name
