"""hierarchical_to_relational_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch engine with the query + data-processing capabilities of the
reference plugin ``data-integrations/hierarchical-to-relational``
(/root/reference, CDAP/Spark-2.1 Java), re-expressed Spark-first:

- ``operators.flatten``   — hierarchy → relational flattening (reference's
  headline op, HierarchyFlattener.java:127-351 semantics) with per-iteration
  lineage checkpointing the reference lacks.
- ``operators.normalize`` — nested CDC change-event envelopes → relational
  turn rows (explode + column algebra, zero per-row Python).
- ``operators.merge``     — last-write-wins key-partitioned MERGE (upsert +
  whole-key tombstone deletes) with salted skew handling.
- ``table``               — "icelite" snapshot-log parquet table: atomic,
  idempotent (batch-id keyed) commits, additive schema evolution, time travel.
- ``streaming``           — Structured Streaming foreachBatch CDC driver with
  per-batch lineage/watermark records, resumable from checkpoint.
- ``sql``                 — SQL view surface (``spark.sql`` over the table,
  its raw state, history, and CDC diffs) with snapshot-pinned semantics.
- ``table.consistent``    — multi-table consistent version cuts for
  cross-stream joins.
- ``operators.dedup`` / ``operators.similarity`` / ``operators.text`` /
  ``operators.multimodal`` — large-scale training-data pipeline ops
  (exact/MinHash-LSH/SimHash/Jaccard/embedding near-dup, ANN top-k,
  language-ID, quality scoring, token counting, fingerprinting, binary
  column plumbing).

Everything on the hot path is built-in Column algebra (JVM side); Python
appears only in driver-side plan construction, mirroring the reference's
zero-UDF discipline (SURVEY.md §2.1).
"""

from hierarchical_to_relational_spark.session import get_spark  # noqa: F401
from hierarchical_to_relational_spark.config import FlattenConfig  # noqa: F401
from hierarchical_to_relational_spark.operators.flatten import flatten  # noqa: F401

__version__ = "0.1.0"
