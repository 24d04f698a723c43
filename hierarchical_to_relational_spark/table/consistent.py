"""Multi-table consistent reads: pin one cross-table version cut.

Each SnapshotTable pins its own version per read, but a query joining
two tables fed by two streams (fact + dim) needs a CUT that was
simultaneously current — otherwise the join can see table A after a
commit and table B before its matching one.

Without a global transaction log, a linearizable cut is obtained by the
classic double-collect: read every table's current version, read them
all again, and accept only if nothing moved. If the two passes agree,
the whole version vector was current throughout the interval between
them (each table's version is monotone, so unchanged endpoints imply
unchanged throughout) — a true consistent cut, not merely a close one.
Commits landing between passes just trigger a bounded retry.

Driver-side metadata only (two snapshot-log globs per table per pass);
no Spark job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hierarchical_to_relational_spark.table.snapshot_table import SnapshotTable


def pin_consistent_versions(
    tables: dict[str, SnapshotTable], retries: int = 20
) -> dict[str, int]:
    """{name: version} vector that was simultaneously current at some
    instant. Raises after ``retries`` torn attempts (a pathological
    commit storm across every table at once)."""
    for _ in range(retries):
        first = {n: t.current_version() for n, t in tables.items()}
        second = {n: t.current_version() for n, t in tables.items()}
        if first == second:
            return first
    raise RuntimeError(
        f"could not pin a consistent cut across {sorted(tables)} in "
        f"{retries} attempts — commits kept landing mid-pin"
    )


def consistent_reads(
    spark: SparkSession,
    tables: dict[str, SnapshotTable],
    versions: dict[str, int] | None = None,
) -> dict[str, DataFrame]:
    """Version-pinned user-facing DataFrames for every table, all from ONE
    consistent cut (pinned here unless ``versions`` is supplied — e.g. a
    cut saved earlier for reproducing a report). Join them freely; no
    concurrent writer can skew the result."""
    from hierarchical_to_relational_spark.operators.merge import read_transcripts

    if versions is None:
        versions = pin_consistent_versions(tables)
    return {
        n: read_transcripts(spark, t, version=versions[n]) for n, t in tables.items()
    }
