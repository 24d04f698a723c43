"""Production streaming mode: processing-time trigger live tail — segments
land WHILE the stream runs; rate-limited intake; crash-resume stays
exactly-once under the continuous trigger; lineage powers monitoring."""

from __future__ import annotations

import os
import time

import pandas as pd

from hierarchical_to_relational_spark import datagen
from hierarchical_to_relational_spark.operators.merge import read_transcripts
from hierarchical_to_relational_spark.streaming.driver import CdcPipeline

SPEC = datagen.BinlogSpec(n_events=400, n_convs=20, seed=31)


def _wait_for(predicate, timeout_s=90.0, poll_s=0.5):
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        if predicate():
            return True
        time.sleep(poll_s)
    return False


def test_live_tail_processing_time_trigger(spark, tmp_path):
    """Start a live tail FIRST, then land segments in waves while it runs.
    The query must pick up each wave without restarts; final state equals
    the pandas oracle; a post-crash restart under the same checkpoint
    replays nothing (exactly-once)."""
    events = datagen.generate_events(SPEC)
    stream_rows = datagen.arrival_order(events, SPEC)
    binlog = str(tmp_path / "binlog")
    # wave 0 exists before the stream starts
    datagen.write_binlog(stream_rows.iloc[:100], binlog, n_segments=2)

    pipe = CdcPipeline(spark, binlog, str(tmp_path / "t"), str(tmp_path / "ck"),
                       n_buckets=8, text_mode="none")
    query = pipe.run_stream(max_files_per_trigger=2, await_termination=False,
                            processing_time="1 second", record_progress=True)
    try:
        assert _wait_for(lambda: pipe.lineage.applied_lsn_watermark() is not None)
        # waves 1..3 land while the query is live — atomically (stage +
        # rename): Spark's file source assumes files appear whole, so a
        # producer writing in place can be catalogued mid-write
        for w in range(1, 4):
            lo = w * 100
            hi = (w + 1) * 100 if w < 3 else len(stream_rows)  # last wave takes the tail
            stage = str(tmp_path / f"stage{w}")
            for p in datagen.write_binlog(stream_rows.iloc[lo:hi], stage,
                                          n_segments=2, start_segment=2 * w):
                os.rename(p, os.path.join(binlog, os.path.basename(p)))
        # drain detection: the arrival stream is shuffled, so the max-LSN
        # watermark can land early — wait for quiescence instead (lineage
        # totals unchanged across several trigger intervals)
        target = int(stream_rows["lsn"].max())
        assert _wait_for(lambda: pipe.lineage.applied_lsn_watermark() == target, 120), \
            f"live tail never reached lsn {target}: at {pipe.lineage.applied_lsn_watermark()}"
        last, stable_since = None, time.time()
        deadline = time.time() + 120
        while time.time() < deadline:
            cur = pipe.lineage.monitoring_summary()["batches_committed"]
            if cur != last:
                last, stable_since = cur, time.time()
            elif time.time() - stable_since > 5:
                break
            time.sleep(1)
    finally:
        query.stop()

    got = (read_transcripts(spark, pipe.table)
           .orderBy("conv_id", "turn_idx").toPandas().reset_index(drop=True))
    want = datagen.expected_state(events)
    pd.testing.assert_frame_equal(got.astype({"turn_idx": "int64"}),
                                  want.astype({"turn_idx": "int64"}), check_dtype=False)

    # crash-resume under the continuous trigger: same checkpoint, nothing
    # re-applies (idempotent commits), state unchanged
    v_before = pipe.table.current_version()
    pipe2 = CdcPipeline(spark, binlog, str(tmp_path / "t"), str(tmp_path / "ck"),
                        n_buckets=8, text_mode="none")
    q2 = pipe2.run_stream(max_files_per_trigger=2, await_termination=False,
                          processing_time="1 second")
    try:
        time.sleep(4)
    finally:
        q2.stop()
    assert pipe2.table.current_version() == v_before

    # monitoring: lineage summary reflects the run, including the stream's
    # own progress telemetry (StreamingQueryListener -> lineage)
    mon = pipe2.lineage.monitoring_summary()
    assert mon["applied_lsn_watermark"] == int(stream_rows["lsn"].max())
    assert mon["batches_committed"] >= 4  # at least one per wave
    assert mon["rows_written"] > 0 and mon["rows_per_sec"] is not None
    assert mon["progress_events"] >= 4
    prog = [e for e in pipe2.lineage.entries() if e.get("type") == "progress"]
    assert {p["stream_batch_id"] for p in prog} >= {0, 1}
    assert all(p["num_input_rows"] >= 0 for p in prog)
    # per-bucket watermarks exist for every live bucket
    marks = pipe2.lineage.bucket_lsn_watermarks()
    assert marks and all(v <= mon["applied_lsn_watermark"] for v in marks.values())


def test_schema_evolution_across_stream_restart(spark, tmp_path):
    """The production schema-evolution path for a live tail: a file-source
    stream's schema is FIXED per query, so an additively wider binlog means
    stop → restart the stream with the evolved envelope schema (same
    checkpoint). Old micro-batches stay committed (no replay), the table
    widens on the first evolved batch, pre-evolution rows read NULL for
    the new column."""
    from pyspark.sql import functions as F, types as T
    from hierarchical_to_relational_spark.sources.binlog import envelope_schema

    binlog = str(tmp_path / "binlog")
    spec_old = datagen.BinlogSpec(n_events=80, n_convs=8, seed=13, delete_rate=0.0)
    old_events = datagen.generate_events(spec_old)
    datagen.write_binlog(old_events, binlog, n_segments=2)

    pipe = CdcPipeline(spark, binlog, str(tmp_path / "t"), str(tmp_path / "ck"),
                       n_buckets=4, text_mode="none")
    pipe.run_stream(max_files_per_trigger=1)  # availableNow drain
    v_after_old = pipe.table.current_version()
    assert "model" not in pipe.table.schema().fieldNames()

    # evolved segments land (new producer version); restart with the wider
    # envelope schema and the same checkpoint
    spec_new = datagen.BinlogSpec(n_events=80, n_convs=8, seed=14,
                                  delete_rate=0.0, evolve_after=0)
    new_events = datagen.generate_events(spec_new)
    new_events["lsn"] = new_events["lsn"] + 10_000
    datagen.write_binlog(new_events, binlog, n_segments=2, evolved=True,
                         start_segment=2)

    evolved = envelope_schema([T.StructField("model", T.StringType(), True)])
    pipe2 = CdcPipeline(spark, binlog, str(tmp_path / "t"), str(tmp_path / "ck"),
                        n_buckets=4, text_mode="none", envelope_schema=evolved)
    pipe2.run_stream(max_files_per_trigger=1)

    assert "model" in pipe2.table.schema().fieldNames()
    out = read_transcripts(spark, pipe2.table)
    assert out.where(F.col("model").isNotNull()).count() > 0
    assert out.where(F.col("model").isNull()).count() > 0  # pre-evolution rows
    # old batches were NOT replayed: version advanced only by the new ones
    assert pipe2.table.current_version() > v_after_old
    n_old_convs = out.where(F.col("model").isNull()).select("conv_id").distinct().count()
    assert n_old_convs > 0


def test_live_tail_with_patch_events_and_egress(spark, tmp_path):
    """Merge-patch through the live tail: a stream carrying partial-column
    patch events (null = keep previous) lands in waves while the query
    runs; final state equals the pandas per-column-fold oracle. A
    downstream consumer polls changes_since mid-stream and applying its
    polls to the checkpointed state reproduces the final state (streaming
    egress end-to-end)."""
    from hierarchical_to_relational_spark.operators.merge import changes_since

    spec = datagen.BinlogSpec(n_events=300, n_convs=15, seed=41, patch_rate=0.3)
    events = datagen.generate_events(spec)
    stream_rows = datagen.arrival_order(events, spec)
    binlog = str(tmp_path / "binlog")
    datagen.write_binlog(stream_rows.iloc[:150], binlog, n_segments=2)

    pipe = CdcPipeline(spark, binlog, str(tmp_path / "t"), str(tmp_path / "ck"),
                       n_buckets=4, text_mode="none")
    query = pipe.run_stream(max_files_per_trigger=2, await_termination=False,
                            processing_time="1 second")
    try:
        assert _wait_for(lambda: pipe.lineage.applied_lsn_watermark() is not None)
        # consumer checkpoint mid-stream
        v_ckpt = pipe.table.current_version()
        state_ckpt = (read_transcripts(spark, pipe.table, version=v_ckpt)
                      .orderBy("conv_id", "turn_idx").toPandas())
        stage = str(tmp_path / "stage")
        for p in datagen.write_binlog(stream_rows.iloc[150:], stage,
                                      n_segments=2, start_segment=2):
            os.rename(p, os.path.join(binlog, os.path.basename(p)))
        target = int(stream_rows["lsn"].max())
        assert _wait_for(lambda: pipe.lineage.applied_lsn_watermark() == target, 120)
        last, stable_since = None, time.time()
        deadline = time.time() + 60
        while time.time() < deadline:
            cur = pipe.lineage.monitoring_summary()["batches_committed"]
            if cur != last:
                last, stable_since = cur, time.time()
            elif time.time() - stable_since > 4:
                break
            time.sleep(1)
    finally:
        query.stop()

    got = (read_transcripts(spark, pipe.table)
           .orderBy("conv_id", "turn_idx").toPandas().reset_index(drop=True))
    want = datagen.expected_state(events)
    pd.testing.assert_frame_equal(got.astype({"turn_idx": "int64"}),
                                  want.astype({"turn_idx": "int64"}), check_dtype=False)

    # egress: one poll covering everything after the consumer checkpoint
    changes = changes_since(spark, pipe.table, v_ckpt).collect()
    dead = {r["conv_id"] for r in changes if r["change_op"] == "d"}
    ups = {(r["conv_id"], r["turn_idx"]): r for r in changes if r["change_op"] == "u"}
    state = {(r["conv_id"], r["turn_idx"]): r for _, r in state_ckpt.iterrows()
             if r["conv_id"] not in dead}
    state.update(ups)
    got_keys = {
        (k, int(t)) for (k, t) in state.keys()
    }
    want_keys = {(r["conv_id"], int(r["turn_idx"])) for _, r in want.iterrows()}
    assert got_keys == want_keys
    for (k, t), r in state.items():
        w = want[(want["conv_id"] == k) & (want["turn_idx"] == t)].iloc[0]
        assert r["text"] == w["text"], (k, t)
