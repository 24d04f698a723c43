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
    scope: str = "session",
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

    ``scope`` widens who can see them:

    - ``"session"`` (default) — this SparkSession only;
    - ``"global"`` — ``global_temp.<name>`` views, visible to EVERY
      session of the JVM/cluster (``spark.newSession()``, a Connect or
      JDBC/Thrift session sharing the context) for the application's
      lifetime — the catalog-persistence story a second SQL user needs
      without running any Python. Cross-APPLICATION persistence is a
      different contract: the table's own on-disk snapshot log IS the
      durable catalog (any new application re-attaches with
      ``SnapshotTable(root)`` + one ``register_views`` call — the same
      re-attach a lakehouse catalog performs at session start).

    Returns {"version": pinned version, "views": [names]}. Registration
    is lazy — no data is read until a query selects from a view."""
    if scope not in ("session", "global"):
        raise ValueError(f"scope must be 'session' or 'global', got {scope!r}")
    v = table.current_version() if version is None else version
    schema = table.schema(v)
    frames = {
        prefix: read_transcripts(spark, table, version=v),
        f"{prefix}_raw": resolve(table.read(spark, version=v), schema),
        f"{prefix}_history": spark.createDataFrame(table.history()),
    }
    for name, df in frames.items():
        if scope == "global":
            df.createOrReplaceGlobalTempView(name)
        else:
            df.createOrReplaceTempView(name)
    names = [(f"global_temp.{n}" if scope == "global" else n) for n in frames]
    return {"version": v, "views": names}


def refresh(spark: SparkSession, table: SnapshotTable, prefix: str = "transcripts",
            scope: str = "session") -> dict:
    """Re-pin the views at the table's current version."""
    return register_views(spark, table, prefix=prefix, scope=scope)


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


def export_snapshot(
    spark: SparkSession,
    table: SnapshotTable,
    path: str,
    version: int | None = None,
    table_name: str | None = None,
    overwrite: bool = False,
) -> dict:
    """Cross-APPLICATION SQL export: materialize the resolved live rows at
    one version as a PLAIN parquet directory plus the one-line DDL that
    attaches it to any Spark SQL catalog — ``CREATE TABLE <name> USING
    parquet LOCATION '<path>'``. A JDBC/Thrift user, a different Spark
    application, DuckDB, or any parquet reader gets the snapshot WITHOUT
    running engine Python — the lakehouse "export a consistent snapshot"
    story (``register_views`` covers same-application sessions; this
    covers everything else).

    The export is immutable and snapshot-pinned: it is a COPY of version
    ``version`` (default current), not a live view — later commits to the
    SnapshotTable do not leak in (exactly the isolation a downstream BI
    extract wants). Publication is atomic (stage + rename): readers never
    see a partial directory. ``_export.json`` inside records provenance
    {source_root, version, row schema}.

    If ``table_name`` is given the DDL is also EXECUTED here, registering
    the table in this application's catalog (shared by every session of
    the SparkContext — ``spark.newSession()`` or a Thrift session sees it
    with zero Python).

    Returns {"path", "version", "ddl", "registered"}."""
    import json as _json
    import os
    import shutil
    import uuid

    from hierarchical_to_relational_spark.operators.merge import read_transcripts

    if os.path.exists(path) and not overwrite:
        raise FileExistsError(f"export exists at {path}; pass overwrite=True")
    v = table.current_version() if version is None else version
    df = read_transcripts(spark, table, version=v)
    stage = f"{path.rstrip('/')}.stage-{uuid.uuid4().hex}"
    try:
        df.write.parquet(os.path.join(stage, "data"))
        with open(os.path.join(stage, "_export.json"), "w") as f:
            _json.dump({"source_root": table.root, "version": v,
                        "schema": df.schema.jsonValue()}, f)
            f.flush()
            os.fsync(f.fileno())
        if os.path.exists(path):
            old = f"{path.rstrip('/')}.old-{uuid.uuid4().hex}"
            os.replace(path, old)
            os.replace(stage, path)
            shutil.rmtree(old, ignore_errors=True)
        else:
            os.replace(stage, path)
    except BaseException:
        shutil.rmtree(stage, ignore_errors=True)
        raise
    data_loc = os.path.abspath(os.path.join(path, "data"))
    ddl = None
    registered = False
    if table_name is not None:
        # external (LOCATION) table: DROP removes only catalog metadata,
        # never the exported files
        ddl = (f"CREATE TABLE {table_name} USING parquet "
               f"LOCATION '{data_loc}'")
        spark.sql(f"DROP TABLE IF EXISTS {table_name}")
        spark.sql(ddl)
        registered = True
    else:
        ddl = f"CREATE TABLE <name> USING parquet LOCATION '{data_loc}'"
    return {"path": path, "version": v, "ddl": ddl, "registered": registered}
