"""Structured Streaming CDC driver: foreachBatch apply, checkpoint resume,
crash-and-replay exactly-once (SURVEY.md §5.4 CDC end-to-end)."""

from __future__ import annotations

import pandas as pd
import pytest

from hierarchical_to_relational_spark import datagen
from hierarchical_to_relational_spark.operators.merge import read_transcripts
from hierarchical_to_relational_spark.streaming.driver import CdcPipeline

SPEC = datagen.BinlogSpec(n_events=300, n_convs=20, seed=21)


@pytest.fixture(scope="module")
def binlog(tmp_path_factory):
    d = tmp_path_factory.mktemp("binlog-stream")
    events = datagen.generate_events(SPEC)
    stream = datagen.arrival_order(events, SPEC)
    paths = datagen.write_binlog(stream, str(d), n_segments=6)
    return {"dir": str(d), "paths": paths, "events": events}


def _state(spark, pipe):
    return (
        read_transcripts(spark, pipe.table)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
        .reset_index(drop=True)
    )


def test_stream_end_to_end(spark, tmp_path, binlog):
    """availableNow stream over all segments (2 files/micro-batch) lands the
    oracle state; lineage has one record per micro-batch."""
    pipe = CdcPipeline(spark, binlog["dir"], str(tmp_path / "t"), str(tmp_path / "ck"),
                       n_buckets=8, text_mode="none")
    pipe.run_stream(max_files_per_trigger=2)
    got = _state(spark, pipe)
    want = datagen.expected_state(binlog["events"])
    pd.testing.assert_frame_equal(got.astype({"turn_idx": "int64"}), want.astype({"turn_idx": "int64"}), check_dtype=False)
    assert len(pipe.lineage.entries()) == 3  # 6 segments / 2 per trigger


def test_stream_resume_from_checkpoint(spark, tmp_path, binlog):
    """Crash mid-stream (simulated: batch 0 applied, then stream restarted
    with the same checkpoint): already-committed micro-batches replay as
    no-ops; the rest apply once; final state equals the one-shot replay."""
    ck = str(tmp_path / "ck")
    pipe = CdcPipeline(spark, binlog["dir"], str(tmp_path / "t"), ck, n_buckets=8, text_mode="none")

    # phase 1: process only the first micro-batch, then "crash" (stop)
    stream = __import__("hierarchical_to_relational_spark.sources.binlog", fromlist=["stream_binlog"]).stream_binlog(
        spark, binlog["dir"], pipe.envelope_schema, max_files_per_trigger=2
    )
    crashed = {"n": 0}

    def apply_once(df, bid):
        if crashed["n"] >= 1:
            raise RuntimeError("simulated crash before applying batch 1")
        pipe.apply_batch(df, bid)
        crashed["n"] += 1

    q = stream.writeStream.foreachBatch(apply_once).option("checkpointLocation", ck).trigger(availableNow=True).start()
    with pytest.raises(Exception):
        q.awaitTermination()
    applied_after_crash = len(pipe.lineage.entries())
    assert applied_after_crash >= 1

    # phase 2: restart from the same checkpoint — Spark replays the failed
    # batch (idempotent commit makes any double-delivery a no-op) and
    # continues to the end
    pipe.run_stream(max_files_per_trigger=2)
    got = _state(spark, pipe)
    want = datagen.expected_state(binlog["events"])
    pd.testing.assert_frame_equal(got.astype({"turn_idx": "int64"}), want.astype({"turn_idx": "int64"}), check_dtype=False)
    # every applied batch committed exactly once at the table layer
    committed = [e for e in pipe.lineage.entries() if e["committed"]]
    batch_ids = [e["batch_id"] for e in committed]
    assert len(batch_ids) == len(set(batch_ids))


def test_late_segment_new_stream_run(spark, tmp_path, binlog):
    """New segments landing after a completed run are picked up by the next
    availableNow run from the same checkpoint — incremental tailing."""
    ck = str(tmp_path / "ck")
    troot = str(tmp_path / "t")
    first, rest = binlog["paths"][:4], binlog["paths"][4:]
    import os, shutil
    live_dir = str(tmp_path / "live-binlog")
    os.makedirs(live_dir)
    for p in first:
        shutil.copy(p, live_dir)
    pipe = CdcPipeline(spark, live_dir, troot, ck, n_buckets=8, text_mode="none")
    pipe.run_stream(max_files_per_trigger=2)
    v_mid = pipe.table.current_version()
    for p in rest:
        shutil.copy(p, live_dir)
    pipe.run_stream(max_files_per_trigger=2)
    assert pipe.table.current_version() > v_mid
    got = _state(spark, pipe)
    want = datagen.expected_state(binlog["events"])
    pd.testing.assert_frame_equal(got.astype({"turn_idx": "int64"}), want.astype({"turn_idx": "int64"}), check_dtype=False)
