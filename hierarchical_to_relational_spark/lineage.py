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

    def bucket_lsn_watermarks(self) -> dict[str, int]:
        """Per-partition (bucket) applied-LSN watermarks — the north rule's
        per-partition lineage: highest LSN ever written into each bucket,
        folded over every batch's footer stats."""
        out: dict[str, int] = {}
        for e in self.entries():
            for b, lsn in (e.get("bucket_max_lsn") or {}).items():
                if lsn is not None and (b not in out or lsn > out[b]):
                    out[b] = lsn
        return out

    def monitoring_summary(self) -> dict:
        """Operational snapshot for a live stream: batch/commit counts,
        row totals, rolling throughput, compactions, watermark lag inputs.
        Driver-side JSONL fold — no Spark job; cheap enough to poll."""
        all_entries = self.entries()
        progress = [e for e in all_entries if e.get("type") == "progress"]
        es = [e for e in all_entries if e.get("type") != "progress"]
        committed = [e for e in es if e.get("committed")]
        dur = sum(e.get("duration_s") or 0.0 for e in committed)
        rows = sum(e.get("rows_written") or 0 for e in committed)
        return {
            "batches_seen": len(es),
            "batches_committed": len(committed),
            "batches_skipped": len(es) - len(committed),
            "rows_written": rows,
            "upserts": sum(e.get("upserts") or 0 for e in committed),
            "deletes": sum(e.get("deletes") or 0 for e in committed),
            "compactions": sum(1 for e in es if e.get("compacted")),
            "rows_per_sec": (rows / dur) if dur > 0 else None,
            "applied_lsn_watermark": self.applied_lsn_watermark(),
            "min_bucket_lsn": min(self.bucket_lsn_watermarks().values(), default=None),
            "last_batch_at": max((e.get("recorded_at") or 0) for e in es) if es else None,
            # live-tail telemetry (present when run_stream(record_progress=True))
            "progress_events": len(progress),
            "last_stream_rate": (progress[-1].get("processed_rows_per_second")
                                 if progress else None),
        }
