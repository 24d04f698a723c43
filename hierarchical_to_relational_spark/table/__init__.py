from hierarchical_to_relational_spark.table.snapshot_table import SnapshotTable  # noqa: F401
