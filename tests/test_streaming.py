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


def test_pipeline_binpack_and_mview_cadence(spark, tmp_path):
    """Inline maintenance cadences on the ingest pipeline: binpack_every
    merges small delta dirs on schedule (state-preserving), and
    mview_root co-maintains the incremental per-conversation aggregate —
    lagging the table by at most mview_every batches and exactly equal to
    a recompute at refresh points."""
    from pyspark.sql import functions as F

    from hierarchical_to_relational_spark.operators.merge import read_transcripts
    from tests.test_cdc import _env_rows

    pipe = CdcPipeline(
        spark, str(tmp_path / "bl"), str(tmp_path / "t"), str(tmp_path / "ck"),
        n_buckets=2, text_mode="none",
        compact_every=1000,           # keep pressure-compaction out of the way
        binpack_every=2, binpack_min_dirs=2,
        mview_root=str(tmp_path / "mv"), mview_every=2,
    )
    m0 = pipe.apply_batch(_env_rows(spark, [
        (1, "insert", "cA", [(0, "user", "a0", None)]),
    ]), "b0")
    assert "packed_buckets" not in m0 and "mview" not in m0, "cadence=2: not yet"
    m1 = pipe.apply_batch(_env_rows(spark, [
        (2, "insert", "cB", [(0, "user", "b0", None)]),
        (3, "update", "cA", [(0, "user", "a1", None)]),
    ]), "b1")
    assert m1.get("packed_buckets"), "two delta dirs binpacked on cadence"
    assert m1["mview"]["mode"] == "full", "first MV refresh is the build"

    # state preserved through the pack; MV equals recompute at this point
    state = {(r["conv_id"], r["turn_idx"]): r["text"]
             for r in read_transcripts(spark, pipe.table).collect()}
    assert state == {("cA", 0): "a1", ("cB", 0): "b0"}
    mv_rows = {r["conv_id"]: r["n_turns"] for r in pipe._mview.read().collect()}
    assert mv_rows == {"cA": 1, "cB": 1}

    m2 = pipe.apply_batch(_env_rows(spark, [
        (4, "insert", "cC", [(0, "user", "c0", None)]),
    ]), "b2")
    assert "mview" not in m2, "off-cadence batch skips the refresh"
    m3 = pipe.apply_batch(_env_rows(spark, [
        (5, "delete", "cB", None),
    ]), "b3")
    assert m3["mview"]["mode"] == "incremental"
    mv_rows = {r["conv_id"]: r["n_turns"] for r in pipe._mview.read().collect()}
    assert mv_rows == {"cA": 1, "cC": 1}, "delete propagated, cC added"
