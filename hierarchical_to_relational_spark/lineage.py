"""Lineage / metrics store: one record per applied batch.

Generalizes the reference's field-lineage recording
(HierarchyToRelational.java:80-98, which registers a
FieldTransformOperation per run) to the CDC engine's needs (north_rule):
per-batch rows of (batch_id, table version, applied-LSN watermark, affected
buckets, row counts, duration) appended to a ``_lineage`` JSONL log next to
the table. Resumable replay reads the max applied LSN; auditing reads the
whole log. Records are tiny driver-side metadata (one per batch), so a
local JSONL append is the right tool — no Spark job.
"""

from __future__ import annotations

import json
import os
import time


class LineageStore:
    def __init__(self, table_root: str):
        self.path = os.path.join(table_root, "_lineage", "log.jsonl")
        os.makedirs(os.path.dirname(self.path), exist_ok=True)

    def record(self, entry: dict) -> None:
        entry = dict(entry, recorded_at=time.time())
        with open(self.path, "a") as f:
            f.write(json.dumps(entry, default=str) + "\n")
            f.flush()
            os.fsync(f.fileno())

    def entries(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]

    def applied_lsn_watermark(self) -> int | None:
        """Highest LSN known applied (for monitoring/resume audits; the
        correctness-critical replay safety comes from idempotent commits,
        not this watermark)."""
        lsns = [e["max_lsn"] for e in self.entries() if e.get("max_lsn") is not None]
        return max(lsns) if lsns else None
