"""Continuous CDC egress: a crash-resumable consumer loop over
``operators.merge.changes_since``.

``ChangeFollower`` is the downstream half of the CDC contract the ingest
side provides: it polls the table's commit log, emits each non-empty
window's net diff (materialized 'u' rows + conversation 'd' rows), and
persists its cursor — the last consumed snapshot VERSION — through a tiny
JSON file written with the same tmp+rename atomicity the table uses. A
crashed/restarted follower resumes from the cursor and re-polls the same
window; emissions are net state (idempotent upserts + re-droppable
deletes), so downstream replays converge exactly like the ingest side's
batch-id commits.

With ``out_dir`` set, every poll is exported as one parquet directory
``inc-<from>-<to>/`` (written atomically: stage + rename). That directory
stream IS a Structured Streaming source — a downstream pipeline tails it
with ``spark.readStream.schema(...).parquet(out_dir)`` and gets the
table's changelog with file-granularity exactly-once: published windows
never overlap (on startup the follower adopts the max published ``to`` as
its cursor when the exports ran ahead of the cursor file — the export IS
the durable cursor), so each version window appears in exactly one file
set. Consumers that merge increments into their own store should still
apply rows LWW by ``change_lsn`` — it is the defensive idempotent apply
order for any changelog.

Delivery channels: ``out_dir`` (durable parquet increments) and/or an
``on_changes`` callback, which fires BEFORE the window's cursor advance —
a crash or callback error re-polls the same window (at-least-once;
windows are net state, so re-application converges). A follower with
neither channel only reports counts.

A rollback in a polled window raises ``ValueError`` from changes_since
(rolled-back rows vanish without tombstones): the follower surfaces it
as ``needs_resync`` and stops — the consumer must rebuild from a full
read and reset the cursor, the same restriction Iceberg places on
incremental reads across non-append history rewrites.
"""

from __future__ import annotations

import glob
import json
import os
import re
import shutil
import time
import uuid

from pyspark.sql import SparkSession

from hierarchical_to_relational_spark.operators.merge import changes_since
from hierarchical_to_relational_spark.table.snapshot_table import SnapshotTable


class ChangeFollower:
    def __init__(
        self,
        spark: SparkSession,
        table: SnapshotTable,
        cursor_path: str,
        out_dir: str | None = None,
        since_ts: float | None = None,
    ):
        """``since_ts`` (epoch seconds): where a BRAND-NEW follower starts
        — the first poll emits everything committed after the latest
        snapshot at/before that wall-clock instant, instead of the default
        "pin at current, emit nothing". Ignored once a cursor exists (a
        resumed follower keeps its exact position; restarting from a
        timestamp would re-emit or skip windows)."""
        self.spark = spark
        self.table = table
        self.cursor_path = cursor_path
        self.out_dir = out_dir
        self.since_ts = since_ts
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            # Crash recovery: a poll that published inc-A-B but died before
            # advancing the cursor file would otherwise re-poll from A after
            # new commits land and publish an OVERLAPPING inc-A-C — two
            # exports whose 'u' rows a file-order-agnostic streaming tail
            # could apply out of LSN order. The published exports ARE the
            # durable record of what was delivered, so adopt the max
            # published 'to' as the cursor whenever it is ahead of (or
            # missing from) the cursor file.
            published_to = -1
            for d in glob.glob(os.path.join(out_dir, "inc-*-*")):
                m = re.fullmatch(r"inc-(\d+)-(\d+)", os.path.basename(d))
                if m:
                    published_to = max(published_to, int(m.group(2)))
            if published_to >= 0 and (self.cursor() is None or published_to > self.cursor()):
                self._write_cursor(published_to)
            # a crash between export and rename leaves _stage-* orphans
            # (readers only see inc-* dirs). Remove only STALE ones: a
            # supervisor may restart the follower while the old process is
            # still mid-export, and deleting its live stage dir would let
            # it publish a PARTIAL increment. An hour of no modification
            # means no write is in flight.
            now = time.time()
            for stale in glob.glob(os.path.join(out_dir, "_stage-*")):
                try:
                    if now - os.path.getmtime(stale) > 3600:
                        shutil.rmtree(stale, ignore_errors=True)
                except FileNotFoundError:
                    pass

    # -- cursor ----------------------------------------------------------
    def cursor(self) -> int | None:
        try:
            with open(self.cursor_path) as f:
                return json.load(f)["version"]
        except FileNotFoundError:
            return None

    def _write_cursor(self, version: int) -> None:
        tmp = f"{self.cursor_path}.tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump({"version": version}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.cursor_path)

    def reset_cursor(self, version: int) -> None:
        """After a full resync: pin the cursor at the version the resync
        read (subsequent polls emit only what lands after it)."""
        self._write_cursor(version)

    # -- polling ---------------------------------------------------------
    def poll_once(self, on_changes=None) -> dict:
        """One poll: diff (cursor, current], export/emit, DELIVER, then
        advance the cursor. Returns {from, to, upserts, deletes, out_path,
        needs_resync}. First poll with no cursor emits nothing and pins the
        cursor at the current version (a brand-new consumer starts from a
        full read it performs itself — emitting the whole table as a 'diff'
        would duplicate that read).

        ``on_changes(result)`` — invoked for a non-empty window BEFORE the
        cursor advances: if the callback raises, the cursor stays put and
        the next poll re-delivers the same window (at-least-once; emissions
        are net state, so a re-applied window converges). Without it and
        without ``out_dir`` the poll returns only counts — rows are never
        materialized anywhere, so consumers that need the data must use one
        of the two delivery channels."""
        v_now = self.table.current_version()
        since = self.cursor()
        if since is None and self.since_ts is not None:
            # timestamp start point: resume as if a cursor had been pinned
            # at the snapshot current at since_ts — the first poll emits
            # the diff from there
            since = self.table.version_as_of(self.since_ts)
        if since is None:
            self._write_cursor(v_now)
            return {"from": None, "to": v_now, "upserts": 0, "deletes": 0,
                    "out_path": None, "needs_resync": False}
        if v_now <= since:
            return {"from": since, "to": since, "upserts": 0, "deletes": 0,
                    "out_path": None, "needs_resync": False}
        try:
            df = changes_since(self.spark, self.table, since, version=v_now)
        except ValueError:
            # rollback in the window: full resync
            return {"from": since, "to": v_now, "upserts": 0, "deletes": 0,
                    "out_path": None, "needs_resync": True}
        except FileNotFoundError:
            # Resync ONLY if the cursor's snapshot really expired (offline
            # past the retention window); a transient FS blip on some other
            # snapshot file should propagate and be retried next poll — a
            # spurious resync is a full-table rebuild at scale.
            if not os.path.exists(self.table._snapshot_path(since)):
                return {"from": since, "to": v_now, "upserts": 0, "deletes": 0,
                        "out_path": None, "needs_resync": True}
            raise
        out_path = None
        if self.out_dir:
            final = os.path.join(self.out_dir, f"inc-{since:010d}-{v_now:010d}")
            if not os.path.exists(final):
                stage = os.path.join(self.out_dir, f"_stage-{uuid.uuid4().hex}")
                df.write.mode("overwrite").parquet(stage)
                os.replace(stage, final)  # atomic: readers see whole dirs only
            # else: a previous poll exported this exact window but crashed
            # before advancing the cursor — the diff of (since, v_now] is
            # deterministic, so the existing export IS this poll's output
            df = self.spark.read.parquet(final)
            out_path = final
        ops = {r["change_op"]: r["n"] for r in
               df.groupBy("change_op").count().withColumnRenamed("count", "n").collect()}
        res = {"from": since, "to": v_now,
               "upserts": ops.get("u", 0), "deletes": ops.get("d", 0),
               "out_path": out_path, "needs_resync": False,
               "changes": df}
        # deliver BEFORE advancing: a crash (or callback error) between
        # delivery and cursor write re-polls the same window — at-least-once
        # for callback consumers instead of the at-most-once a
        # cursor-first order would give
        if on_changes is not None and (res["upserts"] or res["deletes"]):
            on_changes(res)
        self._write_cursor(v_now)
        res.pop("changes")
        return res

    def run(
        self,
        poll_interval_s: float = 5.0,
        max_polls: int | None = None,
        on_changes=None,
    ) -> list[dict]:
        """Follow loop: poll every ``poll_interval_s``; call
        ``on_changes(poll_result)`` for every non-empty window BEFORE that
        window's cursor advance (see poll_once — at-least-once delivery);
        stop after ``max_polls`` (None = until needs_resync). Returns the
        polls."""
        polls: list[dict] = []
        while max_polls is None or len(polls) < max_polls:
            res = self.poll_once(on_changes=on_changes)
            polls.append(res)
            if res["needs_resync"]:
                break
            if max_polls is None or len(polls) < max_polls:
                time.sleep(poll_interval_s)
        return polls
