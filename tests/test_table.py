"""SnapshotTable ("icelite") semantics: atomicity, idempotence, evolution,
time travel, orphan tolerance (SURVEY.md §7.1 M1)."""

from __future__ import annotations

import glob
import os
import time

import pytest
from pyspark.sql import functions as F, types as T

from hierarchical_to_relational_spark.table import SnapshotTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), False),
        T.StructField("v", T.IntegerType(), True),
    ]
)


def _bucketed(spark, table, rows):
    df = spark.createDataFrame(rows, "k string, v int")
    return df.withColumn("_bucket", table.bucket_col()(F.col("k")))


def _buckets(df):
    return sorted(r[0] for r in df.select("_bucket").distinct().collect())


def test_create_and_first_commit(spark, tmp_path):
    t = SnapshotTable.create(str(tmp_path / "t"), SCHEMA, n_buckets=4)
    assert t.current_version() == 0
    assert t.read(spark).count() == 0

    df = _bucketed(spark, t, [("a", 1), ("b", 2), ("c", 3)])
    assert t.commit_overwrite_buckets(df, _buckets(df), "b1") is True
    out = t.read(spark)
    assert {tuple(r) for r in out.select("k", "v").collect()} == {("a", 1), ("b", 2), ("c", 3)}


def test_idempotent_commit_same_batch_id(spark, tmp_path):
    t = SnapshotTable.create(str(tmp_path / "t"), SCHEMA, n_buckets=4)
    df = _bucketed(spark, t, [("a", 1)])
    assert t.commit_overwrite_buckets(df, _buckets(df), "b1") is True
    v = t.current_version()
    # replaying the same batch must be a no-op (exactly-once primitive)
    df2 = _bucketed(spark, t, [("a", 999)])
    assert t.commit_overwrite_buckets(df2, _buckets(df2), "b1") is False
    assert t.current_version() == v
    assert t.read(spark).select("v").collect()[0][0] == 1


def test_copy_on_write_only_affected_buckets(spark, tmp_path):
    t = SnapshotTable.create(str(tmp_path / "t"), SCHEMA, n_buckets=8)
    df = _bucketed(spark, t, [(f"k{i}", i) for i in range(20)])
    t.commit_overwrite_buckets(df, _buckets(df), "b1")
    live_before = dict(t.snapshot()["live"])

    upd = _bucketed(spark, t, [("k0", 100)])
    (b0,) = _buckets(upd)
    t.commit_overwrite_buckets(upd, [b0], "b2")
    live_after = dict(t.snapshot()["live"])
    # only k0's bucket re-pointed; all others untouched
    changed = {b for b in live_before if live_before[b] != live_after.get(b)}
    assert changed == {str(b0)}
    # pruned read of one bucket only sees that bucket's rows
    pruned = t.read(spark, buckets=[b0])
    assert ("k0", 100) in {tuple(r) for r in pruned.select("k", "v").collect()}


def test_bucket_emptied_is_dropped(spark, tmp_path):
    t = SnapshotTable.create(str(tmp_path / "t"), SCHEMA, n_buckets=4)
    df = _bucketed(spark, t, [("a", 1)])
    (b,) = _buckets(df)
    t.commit_overwrite_buckets(df, [b], "b1")
    empty = spark.createDataFrame([], df.schema)
    t.commit_overwrite_buckets(empty, [b], "b2")
    assert t.read(spark).count() == 0


def test_orphan_files_invisible(spark, tmp_path):
    """Crash between data write and snapshot commit → orphan files that no
    snapshot references; reads never see them."""
    t = SnapshotTable.create(str(tmp_path / "t"), SCHEMA, n_buckets=4)
    df = _bucketed(spark, t, [("a", 1)])
    t.commit_overwrite_buckets(df, _buckets(df), "b1")
    # simulate a crashed writer: data lands, snapshot never created
    orphan_dir = os.path.join(t.root, "data", "c-orphan")
    _bucketed(spark, t, [("zz", 999)]).write.parquet(orphan_dir)
    assert glob.glob(os.path.join(orphan_dir, "*.parquet"))
    out = {tuple(r) for r in t.read(spark).select("k", "v").collect()}
    assert out == {("a", 1)}


def test_additive_evolution_and_null_fill(spark, tmp_path):
    t = SnapshotTable.create(str(tmp_path / "t"), SCHEMA, n_buckets=4)
    df = _bucketed(spark, t, [("a", 1)])
    t.commit_overwrite_buckets(df, _buckets(df), "b1")

    assert t.evolve([T.StructField("w", T.StringType(), True)], "b2") is True
    assert t.schema().fieldNames() == ["k", "v", "w"]
    # old files read with the new column null-filled
    row = t.read(spark).select("k", "v", "w").collect()[0]
    assert tuple(row) == ("a", 1, None)
    # evolution is idempotent on batch_id too
    assert t.evolve([T.StructField("w2", T.StringType(), True)], "b2") is False

    wide = spark.createDataFrame([("b", 2, "x")], "k string, v int, w string")
    wide = wide.withColumn("_bucket", t.bucket_col()(F.col("k")))
    t.commit_overwrite_buckets(wide, _buckets(wide), "b3")
    out = {tuple(r) for r in t.read(spark).select("k", "v", "w").collect()}
    assert out == {("a", 1, None), ("b", 2, "x")}


def test_non_additive_evolution_rejected(spark, tmp_path):
    t = SnapshotTable.create(str(tmp_path / "t"), SCHEMA, n_buckets=4)
    df = _bucketed(spark, t, [("a", 1)])
    narrower = T.StructType([T.StructField("k", T.StringType(), False)])
    with pytest.raises(ValueError, match="additive"):
        t.commit_overwrite_buckets(df, _buckets(df), "b1", new_schema=narrower)


def test_time_travel(spark, tmp_path):
    t = SnapshotTable.create(str(tmp_path / "t"), SCHEMA, n_buckets=4)
    d1 = _bucketed(spark, t, [("a", 1)])
    t.commit_overwrite_buckets(d1, _buckets(d1), "b1")
    v1 = t.current_version()
    d2 = _bucketed(spark, t, [("a", 2)])
    t.commit_overwrite_buckets(d2, _buckets(d2), "b2")
    assert t.read(spark).select("v").collect()[0][0] == 2
    assert t.read(spark, version=v1).select("v").collect()[0][0] == 1


def test_concurrent_appends_both_commit(spark, tmp_path):
    """Two writers appending different batches race on the snapshot
    version; optimistic retry preserves BOTH (no lost update, distinct
    versions, union of rows visible)."""
    import threading

    t = SnapshotTable.create(str(tmp_path / "t"), SCHEMA, n_buckets=4)
    d1 = _bucketed(spark, t, [(f"a{i}", i) for i in range(10)])
    d2 = _bucketed(spark, t, [(f"b{i}", i) for i in range(10)])
    # pre-write both commits' data, then race only the pointer swap: two
    # handles so the in-memory batch-id caches don't serialize the race
    t1, t2 = SnapshotTable(t.root), SnapshotTable(t.root)
    results = {}

    def go(handle, df, bid):
        results[bid] = handle.commit_append(df, batch_id=bid)

    th1 = threading.Thread(target=go, args=(t1, d1, "w1"))
    th2 = threading.Thread(target=go, args=(t2, d2, "w2"))
    th1.start(); th2.start(); th1.join(); th2.join()
    assert results == {"w1": True, "w2": True}
    out = {r["k"] for r in t.read(spark).select("k").collect()}
    assert out == {f"a{i}" for i in range(10)} | {f"b{i}" for i in range(10)}
    assert t.current_version() == 2


def test_overwrite_merges_concurrent_append_deltas(spark, tmp_path):
    """A delta appended between a rewriter's read and its winning snapshot
    must NOT be dropped: the overwrite keeps unseen delta dirs stacked on
    the rewritten base (readers LWW-resolve), so no committed data is lost."""
    t = SnapshotTable.create(str(tmp_path / "t"), SCHEMA, n_buckets=1)
    d1 = _bucketed(spark, t, [("a", 1), ("b", 2)])
    t.commit_append(d1, "w1")

    base_v = t.current_version()
    rewrite = _bucketed(spark, t, [("a", 10), ("b", 20)])  # compactor's output

    # concurrent writer appends to the same bucket after the read
    other = SnapshotTable(t.root)
    d2 = _bucketed(spark, other, [("c", 3)])
    assert other.commit_append(d2, "w2") is True

    assert t.commit_overwrite_buckets(rewrite, [0], "compact", base_version=base_v) is True
    live = t.snapshot()["live"]["0"]
    assert len(live) == 2  # rewrite dir + the unseen delta dir
    out = {tuple(r) for r in t.read(spark).select("k", "v").collect()}
    assert out == {("a", 10), ("b", 20), ("c", 3)}


def test_racing_overwrites_raise_conflict(spark, tmp_path):
    """Two rewrites computed from the same base: the loser must get
    ConcurrentOverwriteError (blindly re-pointing would drop the winner)."""
    from hierarchical_to_relational_spark.table.snapshot_table import ConcurrentOverwriteError

    t = SnapshotTable.create(str(tmp_path / "t"), SCHEMA, n_buckets=1)
    t.commit_append(_bucketed(spark, t, [("a", 1)]), "w1")
    base_v = t.current_version()

    winner, loser = SnapshotTable(t.root), SnapshotTable(t.root)
    assert winner.commit_overwrite_buckets(
        _bucketed(spark, winner, [("a", 2)]), [0], "c1", base_version=base_v
    ) is True
    with pytest.raises(ConcurrentOverwriteError):
        loser.commit_overwrite_buckets(
            _bucketed(spark, loser, [("a", 3)]), [0], "c2", base_version=base_v
        )
    assert t.read(spark).select("v").collect()[0][0] == 2


def test_overwrite_retry_rereads_and_wins(spark, tmp_path):
    """The merge layer's copy-on-write loop re-reads + re-resolves after a
    conflicting overwrite and converges on the union of both writers."""
    from hierarchical_to_relational_spark.operators.merge import _overwrite_resolved

    t = SnapshotTable.create(str(tmp_path / "t"), SCHEMA, n_buckets=1)
    t.commit_append(_bucketed(spark, t, [("a", 1)]), "w1")

    other = SnapshotTable(t.root)
    calls = {"n": 0}

    def resolve_fn(current):
        calls["n"] += 1
        if calls["n"] == 1:  # inject a racing overwrite between read and commit
            other.commit_overwrite_buckets(
                _bucketed(spark, other, [("z", 9)]), [0], "racer"
            )
        # rewrite = current state with v bumped by 100
        return current.withColumn("v", F.col("v") + 100)

    assert _overwrite_resolved(spark, t, SCHEMA, [0], "compact", resolve_fn) is True
    assert calls["n"] == 2
    out = {tuple(r) for r in t.read(spark).select("k", "v").collect()}
    assert out == {("z", 109)}  # second attempt read the racer's state


def test_committed_ids_floor_collapse():
    from hierarchical_to_relational_spark.table.snapshot_table import CommittedIds

    ids = CommittedIds()
    for i in [0, 1, 2, 3, 5]:
        ids.add(str(i))
    ids.add("3::compact")
    ids.add("replay-abc")
    ids.compact()
    assert ids.numeric_floor == 3
    assert ids.ids == {"5", "replay-abc"}  # contiguous prefix + derived ids collapsed
    for covered in ["0", "2", "3", "3::compact", "1::evolve", "5", "replay-abc"]:
        assert covered in ids
    assert "4" not in ids and "6" not in ids and "replay-xyz" not in ids


def test_expire_snapshots_bounds_metadata_and_keeps_idempotence(spark, tmp_path):
    """After expiration: snapshot file count bounded, idempotence of
    EXPIRED batch ids survives via the ledger (floor + set), current state
    unchanged, orphan + dereferenced data dirs collected."""
    import os

    t = SnapshotTable.create(str(tmp_path / "t"), SCHEMA, n_buckets=2)
    for i in range(12):
        t.commit_append(_bucketed(spark, t, [(f"k{i}", i)]), str(i))
    # fold deltas so old append dirs become dereferenced
    full = _bucketed(spark, t, [(f"k{i}", i) for i in range(12)])
    t.commit_overwrite_buckets(full, [0, 1], "12")

    n_dirs_before = len(glob.glob(os.path.join(t.root, "data", "c-*")))
    # retain only the current snapshot: historical snapshots stop pinning
    # the superseded append dirs, so they become collectible
    stats = t.expire_snapshots(retain_last=1, orphan_grace_seconds=0.0)
    assert stats["expired_snapshots"] == 13  # v0..v12 gone, v13 kept
    assert len(glob.glob(os.path.join(t.root, "_snapshots", "v*.json"))) == 1
    assert stats["removed_data_dirs"] > 0
    assert len(glob.glob(os.path.join(t.root, "data", "c-*"))) < n_dirs_before

    # fresh handle (cold cache): every old batch id still reads committed
    t2 = SnapshotTable(t.root)
    for i in range(13):
        assert t2.commit_append(_bucketed(spark, t2, [("dup", 99)]), str(i)) is False
    assert t2.commit_append(_bucketed(spark, t2, [("new", 1)]), "13") is True
    got = {tuple(r) for r in t2.read(spark).select("k", "v").collect()}
    assert got == {(f"k{i}", i) for i in range(12)} | {("new", 1)}


def test_orphan_grace_protects_inflight_commit(spark, tmp_path):
    """A data dir younger than the grace window is NOT collected even if no
    snapshot references it (a concurrent writer between data write and
    pointer swap)."""
    import os

    t = SnapshotTable.create(str(tmp_path / "t"), SCHEMA, n_buckets=2)
    t.commit_append(_bucketed(spark, t, [("a", 1)]), "b0")
    # simulate in-flight: write data without committing the pointer
    df = _bucketed(spark, t, [("b", 2)])
    t._write_commit_data(df, SCHEMA, repartition=True)
    assert len(glob.glob(os.path.join(t.root, "data", "c-*"))) == 2
    t.expire_snapshots(retain_last=1, orphan_grace_seconds=3600.0)
    assert len(glob.glob(os.path.join(t.root, "data", "c-*"))) == 2  # survived
    t.expire_snapshots(retain_last=1, orphan_grace_seconds=0.0)
    assert len(glob.glob(os.path.join(t.root, "data", "c-*"))) == 1  # collected


def test_delta_bytes_from_manifest(spark, tmp_path):
    t = SnapshotTable.create(str(tmp_path / "t"), SCHEMA, n_buckets=1)
    assert t.delta_bytes() == 0
    t.commit_overwrite_buckets(_bucketed(spark, t, [("base", 0)]), [0], "b0")
    assert t.delta_bytes() == 0  # base only, no deltas
    t.commit_append(_bucketed(spark, t, [("d1", 1)]), "b1")
    t.commit_append(_bucketed(spark, t, [("d2", 2)]), "b2")
    n = t.delta_bytes()
    assert n > 0
    # matches the filesystem truth
    import os
    live = t.snapshot()["live"]["0"]
    fs = sum(
        os.path.getsize(f)
        for d in live[1:]
        for f in glob.glob(os.path.join(t.root, d, "*.parquet"))
    )
    assert n == fs


def test_rebucket_migration(spark, tmp_path):
    """evolve_buckets: 4 -> 16 buckets; state identical; reads prune on the
    NEW bucketing; later appends bucket under the new spec; racing commits
    conflict rather than vanish."""
    from pyspark.sql import functions as F
    from hierarchical_to_relational_spark.operators.merge import evolve_buckets
    from hierarchical_to_relational_spark.table.snapshot_table import ConcurrentOverwriteError

    schema = T.StructType([
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("v", T.IntegerType(), True),
        T.StructField("_lsn", T.LongType(), False),
        T.StructField("_commit_ts", T.TimestampType(), True),
        T.StructField("_op", T.StringType(), False),
    ])
    t = SnapshotTable.create(str(tmp_path / "t"), schema, n_buckets=4)
    rows = [(f"c{i}", 0, i, i + 1, None, "u") for i in range(40)]
    df = spark.createDataFrame(rows, schema).withColumn(
        "_bucket", t.bucket_col()(F.col("conv_id")))
    t.commit_append(df.select("_bucket", *schema.fieldNames()), "b0")
    before = {tuple(r) for r in t.read(spark).select("conv_id", "v").collect()}

    assert evolve_buckets(spark, t, 16, batch_id="rebucket-16") is True
    assert t.n_buckets == 16
    assert {tuple(r) for r in t.read(spark).select("conv_id", "v").collect()} == before

    # pruned read returns exactly the convs hashing to that bucket under 16
    expect_b3 = {r["conv_id"] for r in
                 spark.createDataFrame([(c,) for c, *_ in rows], "conv_id string")
                 .where(F.pmod(F.xxhash64("conv_id"), F.lit(16)) == 3).collect()}
    got_b3 = {r["conv_id"] for r in t.read(spark, buckets=[3]).select("conv_id").collect()}
    assert got_b3 == expect_b3

    # appends after migration land under the new bucketing
    extra = spark.createDataFrame([("c99", 0, 99, 100, None, "u")], schema).withColumn(
        "_bucket", t.bucket_col()(F.col("conv_id")))
    t.commit_append(extra.select("_bucket", *schema.fieldNames()), "b1")
    assert int(extra.select("_bucket").first()[0]) in [int(b) for b in t.snapshot()["live"]]

    # a rebucket computed against a stale base conflicts
    stale_base = t.current_version() - 1
    with pytest.raises(ConcurrentOverwriteError):
        t.commit_rebucket(df.select("_bucket", *schema.fieldNames()), 8,
                          "rebucket-8", base_version=stale_base)


def test_rollback_and_history(spark, tmp_path):
    """rollback re-points live to a retained historical version via a NEW
    commit (history preserved, idempotent); history() lists the log."""
    t = SnapshotTable.create(str(tmp_path / "t"), SCHEMA, n_buckets=2)
    d1 = _bucketed(spark, t, [("a", 1)])
    t.commit_overwrite_buckets(d1, _buckets(d1), "b1")
    v1 = t.current_version()
    d2 = _bucketed(spark, t, [("a", 2), ("b", 9)])
    t.commit_overwrite_buckets(d2, _buckets(d2), "b2")
    assert {tuple(r) for r in t.read(spark).select("k", "v").collect()} == {("a", 2), ("b", 9)}

    assert t.rollback(v1, batch_id="rb1") is True
    assert {tuple(r) for r in t.read(spark).select("k", "v").collect()} == {("a", 1)}
    assert t.rollback(v1, batch_id="rb1") is False  # idempotent
    assert t.current_version() == v1 + 2  # a new commit, not a deletion

    hist = t.history()
    assert [h["batch_id"] for h in hist] == ["__create__", "b1", "b2", "rb1"]
    assert hist[-1]["live_buckets"] == hist[1]["live_buckets"]

    # writes continue normally after rollback
    d3 = _bucketed(spark, t, [("c", 3)])
    t.commit_append(d3, "b3")
    got = {tuple(r) for r in t.read(spark).select("k", "v").collect()}
    assert got == {("a", 1), ("c", 3)}


def test_concurrent_expirations_merge_ledgers(tmp_path):
    """Two racing expirations must not lose each other's batch ids: the
    ledger uses versioned O_EXCL writes; the loser re-merges and retries.
    (Pure-metadata commits — no Spark needed.)"""
    import threading

    t = SnapshotTable.create(str(tmp_path / "t"), SCHEMA, n_buckets=2)
    for i in range(40):
        t._commit(str(i), SCHEMA, lambda live: live)
    h1, h2 = SnapshotTable(t.root), SnapshotTable(t.root)

    def expire(h):
        h.expire_snapshots(retain_last=5, clean_orphans=False)

    ths = [threading.Thread(target=expire, args=(h,)) for h in (h1, h2)]
    for th in ths:
        th.start()
    for th in ths:
        th.join()

    cold = SnapshotTable(t.root)
    ids = cold.committed_batch_ids()
    for i in range(40):
        assert str(i) in ids, f"batch {i} lost by racing expirations"
    assert glob.glob(os.path.join(t.root, "_snapshots", "ledger-v*.json"))


def test_rollback_protects_rereferenced_dirs_from_orphan_gc(spark, tmp_path):
    """rollback() re-references OLD data dirs whose mtimes may lie outside
    the orphan grace window; it must freshen them BEFORE committing so a
    concurrent expire_snapshots (which may have listed versions before the
    rollback landed) cannot rmtree the dirs the new head points at."""
    import os

    t = SnapshotTable.create(str(tmp_path / "t"), SCHEMA, n_buckets=2)
    d1 = _bucketed(spark, t, [("a", 1)])
    t.commit_overwrite_buckets(d1, _buckets(d1), "b1")
    v1 = t.current_version()
    dirs_v1 = {d for ds in t.snapshot(v1)["live"].values() for d in ds}
    d2 = _bucketed(spark, t, [("a", 2)])
    t.commit_overwrite_buckets(d2, _buckets(d2), "b2")

    # age the v1 dirs far past any grace window
    old = time.time() - 7200
    for d in dirs_v1:
        os.utime(os.path.join(t.root, d), (old, old))

    assert t.rollback(v1, batch_id="rb") is True
    for d in dirs_v1:  # mtimes freshened by the rollback itself
        assert time.time() - os.path.getmtime(os.path.join(t.root, d)) < 60

    # expire with a 1h grace window: the re-referenced dirs are inside the
    # window again, so even a retain-window that drops v1 can't collect them
    t.expire_snapshots(retain_last=1, orphan_grace_seconds=3600.0)
    got = {tuple(r) for r in t.read(spark).select("k", "v").collect()}
    assert got == {("a", 1)}  # table remains readable at the rollback state


def test_floor_credit_restricted_to_known_suffixes():
    """Floor coverage applies to pure-numeric ids and the engine-derived
    ::compact/::evolve only: a caller-chosen '2::manual' that never
    committed must NOT read as committed just because the floor passed 2
    (it would silently no-op when the caller finally runs it)."""
    from hierarchical_to_relational_spark.table.snapshot_table import CommittedIds

    ids = CommittedIds()
    for i in ("0", "1", "2", "3"):
        ids.add(i)
    ids.compact()
    assert ids.numeric_floor == 3
    assert "2" in ids and "2::compact" in ids and "3::evolve" in ids
    assert "2::manual" not in ids and "3::anything-else" not in ids


def test_floor_not_poisoned_by_derived_ids():
    """A caller-chosen id like '7::manual' must NOT advance the floor past
    epoch 7 — otherwise a later real epoch-7 batch would silently no-op
    (data loss)."""
    from hierarchical_to_relational_spark.table.snapshot_table import CommittedIds

    ids = CommittedIds()
    for i in ("0", "1", "2", "3::manual", "4"):
        ids.add(i)
    ids.compact()
    assert ids.numeric_floor == 2      # stops before the uncommitted "3"
    assert "3" not in ids              # epoch 3 still applies when it arrives
    assert "3::manual" in ids          # the derived id itself stays committed
    assert "1::compact" in ids         # derived ids under the floor are covered


def _envs(spark, rows):
    """rows: (lsn, op, conv_id, [(turn_idx, text), ...] | None) → envelope DF."""
    import pandas as pd
    from hierarchical_to_relational_spark.sources.binlog import envelope_schema

    ts = pd.Timestamp("2026-01-01").to_pydatetime()
    data = [
        (
            lsn, ts, op, cid,
            None if turns is None else {"turns": [
                {"turn_idx": i, "role": "user", "text": t, "tool": None, "ts": ts}
                for (i, t) in turns
            ]},
        )
        for (lsn, op, cid, turns) in rows
    ]
    return spark.createDataFrame(data, envelope_schema())


def test_file_level_minmax_pruning(spark, tmp_path):
    """A point lookup scans FEWER files than the bucket holds: per-file
    conv_id min-max from the commit sidecars prunes (a) delta files from
    batches that never touched the key and (b) range-clustered base files
    outside the key's range — and the pruned read returns the same rows."""
    from hierarchical_to_relational_spark.operators.merge import (
        compact, lookup_conversation, read_transcripts,
    )
    from hierarchical_to_relational_spark.streaming.driver import CdcPipeline

    pipe = CdcPipeline(spark, str(tmp_path / "bl"), str(tmp_path / "t"),
                       str(tmp_path / "ck"), n_buckets=1, text_mode="none",
                       compact_every=10_000)
    # three disjoint conv ranges, one batch each
    pipe.apply_batch(_envs(spark, [
        (i + 1, "insert", f"cAAA{i}", [(0, f"a{i}"), (1, f"a{i}b")]) for i in range(4)
    ]), "b-a")
    pipe.apply_batch(_envs(spark, [
        (i + 11, "insert", f"cMMM{i}", [(0, f"m{i}")]) for i in range(4)
    ]), "b-m")
    compact(spark, pipe.table, batch_id="manual-compact")
    # post-compact delta that never mentions cAAA*
    pipe.apply_batch(_envs(spark, [
        (i + 21, "insert", f"cZZZ{i}", [(0, f"z{i}")]) for i in range(4)
    ]), "b-z")

    t = pipe.table
    full_files = set(t.read(spark).inputFiles())
    pruned = t.read(spark, key_range=("cAAA2", "cAAA2"))
    pruned_files = set(pruned.inputFiles())
    assert pruned_files < full_files, "pruning must drop files"
    rows_pruned = {
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in pruned.where(F.col("conv_id") == "cAAA2").collect()
    }
    rows_full = {
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in t.read(spark).where(F.col("conv_id") == "cAAA2").collect()
    }
    assert rows_pruned == rows_full and rows_pruned

    # the user-facing point lookup: same result as the full read, filtered
    via_lookup = {
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in lookup_conversation(spark, t, "cAAA2").collect()
    }
    via_full = {
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in read_transcripts(spark, t)
        .where(F.col("conv_id") == "cAAA2").collect()
    }
    assert via_lookup == via_full and via_lookup


def test_lsn_range_pruning_skips_old_deltas(spark, tmp_path):
    """Incremental 'changes since LSN' reads skip delta files whose max
    _lsn is below the watermark."""
    from hierarchical_to_relational_spark.streaming.driver import CdcPipeline

    pipe = CdcPipeline(spark, str(tmp_path / "bl"), str(tmp_path / "t"),
                       str(tmp_path / "ck"), n_buckets=1, text_mode="none",
                       compact_every=10_000)
    pipe.apply_batch(_envs(spark, [(i + 1, "insert", f"c{i}", [(0, "x")]) for i in range(3)]), "b0")
    pipe.apply_batch(_envs(spark, [(i + 100, "insert", f"d{i}", [(0, "y")]) for i in range(3)]), "b1")
    t = pipe.table
    full = set(t.read(spark).inputFiles())
    recent = t.read(spark, lsn_range=(100, None))
    assert set(recent.inputFiles()) < full
    assert {r["conv_id"] for r in recent.where(F.col("_lsn") >= 100).collect()} == {"d0", "d1", "d2"}


def test_pruning_superset_without_sidecar(spark, tmp_path):
    """Commit dirs without a sidecar (pre-feature tables) are never pruned:
    key_range reads fall back to full bucket scans."""
    import os as _os
    from hierarchical_to_relational_spark.table.snapshot_table import FILE_STATS_NAME
    from hierarchical_to_relational_spark.streaming.driver import CdcPipeline

    pipe = CdcPipeline(spark, str(tmp_path / "bl"), str(tmp_path / "t"),
                       str(tmp_path / "ck"), n_buckets=1, text_mode="none")
    pipe.apply_batch(_envs(spark, [(1, "insert", "cA", [(0, "x")]),
                                   (2, "insert", "cB", [(0, "y")])]), "b0")
    t = pipe.table
    for d in t.snapshot()["live"]["0"]:
        _os.unlink(_os.path.join(t.root, d, FILE_STATS_NAME))
    t._file_stats_cache.clear()
    pruned = t.read(spark, key_range=("cA", "cA"))
    assert set(pruned.inputFiles()) == set(t.read(spark).inputFiles())


def test_bloom_filters_on_delta_appends(spark, tmp_path, monkeypatch):
    """Hash-ordered delta appends carry parquet bloom filters on conv_id —
    the row-group-skip complement to min-max pruning (which cannot help on
    hash-ordered files). parquet-mr materializes the bloom only when the
    dictionary overflows, so the probe uses enough distinct keys to force
    fallback; the bloom's presence shows up as extra file bytes for the
    IDENTICAL data. Range-clustered rewrites skip the bloom (tight min-max
    bounds already give file-level pruning)."""
    import hierarchical_to_relational_spark.table.snapshot_table as st

    schema = T.StructType([
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("_lsn", T.LongType(), False),
    ])
    # one bucket, 150k distinct 45-char keys → dictionary page overflow
    df = spark.range(150_000).select(
        F.lit(0).alias("_bucket"),
        F.concat(F.lit("conversation-"), F.md5(F.col("id").cast("string"))).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("id").alias("_lsn"),
    )

    def commit_bytes(root, opts):
        monkeypatch.setattr(st, "PARQUET_BLOOM_OPTS", opts)
        t = st.SnapshotTable.create(str(root), schema, n_buckets=1)
        t.commit_append(df, batch_id="b0")
        d = t.snapshot()["live"]["0"][0]
        import glob as g, os as o
        return sum(o.path.getsize(p)
                   for p in g.glob(o.path.join(t.root, d, "*.parquet")))

    with_bloom = commit_bytes(tmp_path / "tb", dict(st.PARQUET_BLOOM_OPTS))
    without = commit_bytes(tmp_path / "tp", {})
    assert with_bloom > without + 50_000, (with_bloom, without)

    # lookups through bloom-carrying files stay correct
    t = st.SnapshotTable(str(tmp_path / "tb"))
    key = "conversation-" + __import__("hashlib").md5(b"77").hexdigest()
    got = t.read(spark).where(F.col("conv_id") == key).collect()
    assert [r["_lsn"] for r in got] == [77]


def test_zorder_compaction_prunes_both_dimensions(spark, tmp_path):
    """compact(zorder=["conv_id", "_lsn"]) clusters the base so BOTH a
    conv_id point lookup AND an _lsn range read prune files via the
    min-max sidecar — single-column clustering can only serve one.
    State is unchanged by the z-ordered rewrite."""
    from hierarchical_to_relational_spark.operators.merge import compact, read_transcripts
    from hierarchical_to_relational_spark.streaming.driver import CdcPipeline

    pipe = CdcPipeline(spark, str(tmp_path / "bl"), str(tmp_path / "t"),
                       str(tmp_path / "ck"), n_buckets=1, text_mode="none",
                       compact_every=10_000)
    # 400 convs; lsn deliberately NOT correlated with conv order
    rows = [((i * 37) % 400 + 1000, "insert", f"c{i:04d}", [(0, f"t{i}")])
            for i in range(400)]
    pipe.apply_batch(_envs(spark, rows), "b0")
    before = {(r["conv_id"], r["text"]) for r in read_transcripts(spark, pipe.table).collect()}
    # AQE would coalesce this tiny rewrite into one file and leave nothing
    # to prune; at real scale each range partition is a full-sized file
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        assert compact(spark, pipe.table, batch_id="z0", zorder=["conv_id", "_lsn"])
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    t = pipe.table
    after = {(r["conv_id"], r["text"]) for r in read_transcripts(spark, t).collect()}
    assert after == before

    full = set(t.read(spark).inputFiles())
    assert len(full) >= 4, "need multiple files for pruning to be observable"
    by_key = set(t.read(spark, key_range=("c0100", "c0100")).inputFiles())
    by_lsn = set(t.read(spark, lsn_range=(1350, None)).inputFiles())
    assert by_key < full, (len(by_key), len(full))
    assert by_lsn < full, (len(by_lsn), len(full))
    # pruned reads stay supersets of the exact answers
    assert {r["conv_id"] for r in t.read(spark, key_range=("c0100", "c0100"))
            .where(F.col("conv_id") == "c0100").collect()} == {"c0100"}
    got_lsn = {r["conv_id"] for r in t.read(spark, lsn_range=(1350, None))
               .where(F.col("_lsn") >= 1350).collect()}
    want_lsn = {f"c{i:04d}" for i in range(400) if (i * 37) % 400 + 1000 >= 1350}
    assert got_lsn == want_lsn


def test_zorder_expr_interleaves(spark):
    """z-value sanity: for two uniform int columns the interleave maps the
    (x, y) grid so that z-adjacent ranges form small rectangles — check
    the corner ordering property z(0,0) < z(max,max) and that both
    columns influence the value."""
    from hierarchical_to_relational_spark.functions.zorder import zorder_expr

    df = spark.range(256).select(
        (F.col("id") % 16).alias("x"), (F.col("id") / 16).cast("long").alias("y")
    )
    z = df.select("x", "y", zorder_expr(df, ["x", "y"]).alias("z")).collect()
    zmap = {(r["x"], r["y"]): r["z"] for r in z}
    assert zmap[(0, 0)] == min(zmap.values())
    assert zmap[(15, 15)] == max(zmap.values())
    assert zmap[(1, 0)] != zmap[(0, 1)]  # both dimensions contribute


def test_partial_compaction_folds_only_pressured_buckets(spark, tmp_path):
    """Partial compaction (the per-bucket trigger the pipeline uses):
    only buckets whose delta stack crosses the threshold rewrite; cold
    buckets keep their shallow stacks untouched (O(pressured) rewrite,
    not O(table)); state is preserved and the compaction window emits no
    incremental changes."""
    from hierarchical_to_relational_spark.operators.merge import (
        changes_since, compact_pressured, read_transcripts,
    )
    from hierarchical_to_relational_spark.streaming.driver import CdcPipeline

    pipe = CdcPipeline(spark, str(tmp_path / "bl"), str(tmp_path / "t"),
                       str(tmp_path / "ck"), n_buckets=8, text_mode="none",
                       compact_every=10_000)
    t = pipe.table
    bucket_of = t.bucket_col()
    # find two conv ids living in different buckets
    probe = spark.createDataFrame(
        [(f"c{i}",) for i in range(50)], "conv_id string"
    ).select("conv_id", bucket_of(F.col("conv_id")).alias("b")).collect()
    by_bucket: dict[int, str] = {}
    for r in probe:
        by_bucket.setdefault(r["b"], r["conv_id"])
    (hot_b, hot_c), (cold_b, cold_c) = list(by_bucket.items())[:2]

    # hot conv: 5 delta batches; cold conv: 2
    for i in range(5):
        pipe.apply_batch(_envs(spark, [(100 + i, "insert", hot_c, [(i, f"h{i}")])]), f"h{i}")
    for i in range(2):
        pipe.apply_batch(_envs(spark, [(200 + i, "insert", cold_c, [(i, f"k{i}")])]), f"k{i}")
    before = {(r["conv_id"], r["turn_idx"], r["text"])
              for r in read_transcripts(spark, t).collect()}
    v1 = t.current_version()

    folded = compact_pressured(spark, t, batch_id="pc0", depth_threshold=4)
    assert folded == [hot_b]
    stats = t.delta_stats()
    assert stats[hot_b]["depth"] == 1          # folded to a single base
    assert stats[cold_b]["depth"] == 2         # untouched
    after = {(r["conv_id"], r["turn_idx"], r["text"])
             for r in read_transcripts(spark, t).collect()}
    assert after == before
    assert changes_since(spark, t, v1).count() == 0  # pure rewrite window

    # nothing pressured → no commit at all
    v2 = t.current_version()
    assert compact_pressured(spark, t, batch_id="pc1", depth_threshold=4) == []
    assert t.current_version() == v2


def test_timestamp_time_travel_and_age_expiry(spark, tmp_path, monkeypatch):
    """version_as_of / read(as_of_ts): timestamp time travel resolves to
    the latest snapshot committed at or before the given time;
    expire_snapshots(older_than_s) keeps young snapshots alive even
    beyond retain_last (wall-clock time-travel horizon)."""
    import hierarchical_to_relational_spark.table.snapshot_table as st

    clock = {"now": 1_000_000.0}
    monkeypatch.setattr(st.time, "time", lambda: clock["now"])

    t = SnapshotTable.create(str(tmp_path / "t"), SCHEMA, n_buckets=2)
    stamps = {}
    for i in range(5):
        clock["now"] += 100
        df = _bucketed(spark, t, [("a", i)])
        t.commit_overwrite_buckets(df, _buckets(df), f"b{i}")
        stamps[t.current_version()] = clock["now"]

    # exact stamp, between stamps, and before-history
    v3 = t.version_as_of(stamps[3])
    assert v3 == 3
    assert t.version_as_of(stamps[3] + 50) == 3
    assert t.read(spark, as_of_ts=stamps[2]).select("v").collect()[0][0] == 1
    with pytest.raises(ValueError, match="no retained snapshot"):
        t.version_as_of(999_999.0)
    with pytest.raises(ValueError, match="not both"):
        t.read(spark, version=1, as_of_ts=stamps[2])
    assert all(h["committed_at"] for h in t.history())

    # age-restricted expiration: retain_last=1 would expire v0..v4, but
    # only snapshots older than 250s (v0..v2 at now) actually expire
    res = t.expire_snapshots(retain_last=1, older_than_s=250.0,
                             orphan_grace_seconds=1e9)
    assert res["expired_snapshots"] == 3
    assert t._versions() == [3, 4, 5]
    # the surviving window still time-travels
    assert t.read(spark, as_of_ts=stamps[4]).select("v").collect()[0][0] == 3


def _ts_envs(spark, rows):
    """rows: (lsn, op, conv_id, [(turn_idx, role, text, ts_day)]) with a
    controllable per-turn ts (days from 2026-01-01)."""
    import datetime

    import pandas as pd
    from hierarchical_to_relational_spark.sources.binlog import envelope_schema

    base = pd.Timestamp("2026-01-01").to_pydatetime()
    data = [
        (lsn, base, op, cid,
         None if turns is None else {"turns": [
             {"turn_idx": i, "role": r, "text": t, "tool": None,
              "ts": base + datetime.timedelta(days=day)}
             for (i, r, t, day) in turns]})
        for (lsn, op, cid, turns) in rows
    ]
    return spark.createDataFrame(data, envelope_schema())


def test_col_ranges_pruning_and_scan_range(spark, tmp_path):
    """Non-key lookup pruning: per-file sidecar bounds on ANY scalar user
    column let a ts-range read scan fewer files than the table holds — on
    a PLAIN delta stack and on a z-ordered base — while scan_range stays
    LWW-safe: superseded and deleted in-range rows do not resurrect."""
    import datetime

    from hierarchical_to_relational_spark.operators.merge import compact, scan_range
    from hierarchical_to_relational_spark.streaming.driver import CdcPipeline

    base = datetime.datetime(2026, 1, 1)
    day = lambda d: base + datetime.timedelta(days=d)
    pipe = CdcPipeline(spark, str(tmp_path / "bl"), str(tmp_path / "t"),
                       str(tmp_path / "ck"), n_buckets=4, text_mode="none",
                       compact_every=999)
    # three time-ordered batches -> three delta dirs with disjoint ts spans
    pipe.apply_batch(_ts_envs(spark, [
        (1, "insert", "cA", [(0, "user", "a0", 0)]),
        (2, "insert", "cB", [(0, "user", "b0", 0)]),
    ]), "b0")
    pipe.apply_batch(_ts_envs(spark, [
        (3, "insert", "cC", [(0, "user", "c0", 10)]),
        (4, "update", "cA", [(0, "user", "a0-v2", 10)]),  # supersedes day-0 row
    ]), "b1")
    pipe.apply_batch(_ts_envs(spark, [
        (5, "delete", "cB", None),                         # kills day-0 cB
        (6, "insert", "cD", [(0, "user", "d0", 20)]),
    ]), "b2")
    t = pipe.table

    # (a) PLAIN base: ts-range file pruning drops the other days' deltas
    full = set(t.read(spark).inputFiles())
    day0 = set(t.read(spark, col_ranges={"ts": (day(0), day(1))}).inputFiles())
    assert day0 and day0 < full, f"ts-range must prune files: {len(day0)}/{len(full)}"

    # (b) scan_range is resolution-safe: day-0 window returns NOTHING
    # (cA's day-0 row was superseded, cB was deleted) — a naive
    # pruned-files resolve would return both
    assert scan_range(spark, t, "ts", day(0), day(1)).count() == 0
    got10 = {(r["conv_id"], r["text"])
             for r in scan_range(spark, t, "ts", day(9), day(11)).collect()}
    assert got10 == {("cA", "a0-v2"), ("cC", "c0")}
    # open-ended + equality-style ranges
    assert {r["conv_id"] for r in scan_range(spark, t, "ts", lo=day(15)).collect()} == {"cD"}
    assert {r["conv_id"] for r in
            scan_range(spark, t, "role", "user", "user").collect()} == {"cA", "cC", "cD"}

    # (c) Z-ORDERED base: cluster on (conv_id, ts); per-file ts bounds on
    # the rewritten base still prune a ts window (AQE coalescing disabled
    # so the tiny rewrite keeps multiple files, as at real scale)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        assert compact(spark, t, batch_id="z0", zorder=["conv_id", "ts"])
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
        spark.conf.unset("spark.sql.shuffle.partitions")
    fullz = set(t.read(spark).inputFiles())
    day20 = set(t.read(spark, col_ranges={"ts": (day(19), day(21))}).inputFiles())
    assert day20 and day20 < fullz, f"z-base ts pruning: {len(day20)}/{len(fullz)}"
    # same answers through the z-ordered base
    assert {r["conv_id"] for r in scan_range(spark, t, "ts", lo=day(15)).collect()} == {"cD"}
    assert scan_range(spark, t, "ts", day(0), day(1)).count() == 0


def test_pre_round4_bucket_dir_layout_still_readable(spark, tmp_path):
    """Back-compat (round-4 migration hazard): a commit dir written by the
    PRE-flat layout — files under physical ``_bucket=k/`` partition
    subdirs, sidecar rel paths carrying the partition dir, no per-file
    ``_bucket``/``cols`` sidecar keys, no ``_bucket`` data column — must
    stay readable: the explicit-leaf-file read reconstructs ``_bucket``
    via basePath, and bucket pruning falls back to the partition-dir
    encoding in the rel path."""
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as papq

    t = SnapshotTable.create(str(tmp_path / "t"), SCHEMA, n_buckets=4)
    rows = [(f"k{i}", i) for i in range(12)]
    df = _bucketed(spark, t, rows)
    t.commit_overwrite_buckets(df, _buckets(df), "b1")
    commit_dirs = {d for dirs in t.snapshot()["live"].values() for d in dirs}
    assert len(commit_dirs) == 1
    cdir = os.path.join(t.root, commit_dirs.pop())
    # rewrite the commit dir on disk in the round-3 physical layout
    old_stats: dict = {}
    for i, f in enumerate(sorted(glob.glob(os.path.join(cdir, "*.parquet")))):
        pdf = papq.read_table(f).to_pandas()
        for b, grp in pdf.groupby("_bucket"):
            rel = os.path.join(f"_bucket={int(b)}", f"part-{i:05d}.parquet")
            os.makedirs(os.path.dirname(os.path.join(cdir, rel)), exist_ok=True)
            papq.write_table(
                pa.Table.from_pandas(grp.drop(columns=["_bucket"]),
                                     preserve_index=False),
                os.path.join(cdir, rel))
            old_stats[rel] = {"conv_id": None, "_lsn": None}
        os.remove(f)
    with open(os.path.join(cdir, "_file_stats.json"), "w") as fh:
        _json.dump(old_stats, fh)

    t2 = SnapshotTable(t.root)  # fresh instance: no memoized sidecar
    out = t2.read(spark)
    assert {tuple(r) for r in out.select("k", "v").collect()} == set(rows)
    # bucket-filtered read: partition-dir pruning + exact bucket filter
    want_bucket = _buckets(df)[0]
    sub = t2.read(spark, buckets=[want_bucket])
    assert {r[0] for r in sub.select("_bucket").distinct().collect()} == {want_bucket}
    with_all = {tuple(r) for r in out.where(F.col("_bucket") == want_bucket)
                .select("k", "v").collect()}
    assert {tuple(r) for r in sub.select("k", "v").collect()} == with_all


def test_query_bound_matches_pyspark_naive_datetime_conversion():
    """col_ranges/scan_range pruning bounds for NAIVE datetimes must equal
    what PySpark's own driver-side literal conversion produces
    (TimestampType.toInternal = local mktime) — under a NON-UTC driver TZ
    too, or pruning drifts from the row filter by the TZ offset and
    silently drops matching rows."""
    import datetime
    import time as _time

    from pyspark.sql.types import TimestampType

    from hierarchical_to_relational_spark.table.snapshot_table import (
        _query_bound_to_json,
    )

    old = os.environ.get("TZ")
    try:
        for tz in ("America/New_York", "Asia/Tokyo", "UTC"):
            os.environ["TZ"] = tz
            _time.tzset()
            for dt in (datetime.datetime(2026, 1, 15, 12, 30, 45, 123456),
                       datetime.datetime(2025, 7, 1, 0, 0, 0)):
                assert _query_bound_to_json(dt) == TimestampType().toInternal(dt), tz
            aware = datetime.datetime(2026, 1, 15, 12, 0,
                                      tzinfo=datetime.timezone.utc)
            assert _query_bound_to_json(aware) == TimestampType().toInternal(aware), tz
    finally:
        if old is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = old
        _time.tzset()


def test_pruning_keeps_file_on_incomparable_bounds(spark, tmp_path):
    """A cross-type col_ranges bound (e.g. a string vs an int sidecar
    bound) must keep the file — superset-safe — instead of raising
    TypeError or wrongly pruning."""
    t = SnapshotTable.create(str(tmp_path / "t"), SCHEMA, n_buckets=2)
    df = _bucketed(spark, t, [("a", 1), ("b", 2)])
    t.commit_overwrite_buckets(df, _buckets(df), "b1")
    out = t.read(spark, col_ranges={"v": ("not-a-number", None)})
    assert out.count() == 2, "incomparable bound kept every file"


def test_observe_accounting_matches_pyarrow_and_skips_data_read(spark, tmp_path, monkeypatch):
    """Round-5: per-commit accounting (rows / max-LSN / tombstones, global
    and per bucket) comes from the WRITE JOB's df.observe aggregates —
    executor-side, no driver read of just-written data files. It must agree
    exactly with the legacy pyarrow column-read path, and the observe-mode
    commit must never touch data pages on the driver (footer metadata
    only)."""
    schema = T.StructType([
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("_lsn", T.LongType(), True),
    ])
    rows = ([(f"c{i % 7}", i, 100 + i) for i in range(40)]
            + [("c1", None, 500), ("c3", None, 501)])  # tombstones

    def build(mode):
        t = SnapshotTable.create(str(tmp_path / f"t-{mode}"), schema, n_buckets=4)
        t.stats_mode = mode
        df = (spark.createDataFrame(rows, "conv_id string, turn_idx int, _lsn long")
              .withColumn("_bucket", t.bucket_col()(F.col("conv_id"))))
        bks = sorted(r[0] for r in df.select("_bucket").distinct().collect())
        t.commit_overwrite_buckets(df, bks, "b1")
        return t

    t_obs = build("observe")

    # observe mode: data pages must never be read driver-side on commit
    import pyarrow.parquet as papq

    def no_data_read(self, *a, **k):
        raise AssertionError("driver read data pages on the commit hot path")

    monkeypatch.setattr(papq.ParquetFile, "read", no_data_read)
    t_obs2 = SnapshotTable.create(str(tmp_path / "t-obs2"), schema, n_buckets=4)
    t_obs2.stats_mode = "observe"
    df2 = (spark.createDataFrame(rows, "conv_id string, turn_idx int, _lsn long")
           .withColumn("_bucket", t_obs2.bucket_col()(F.col("conv_id"))))
    t_obs2.commit_append(df2, "b1")
    monkeypatch.undo()

    t_py = build("pyarrow")
    mo, mp = t_obs.last_commit_stats, t_py.last_commit_stats
    assert mo == mp, f"observe metrics diverge from pyarrow: {mo} vs {mp}"
    assert mo["rows_written"] == 42 and mo["deletes"] == 2
    assert mo["max_lsn"] == 501
    assert mo["bucket_rows"] == mp["bucket_rows"]
    assert mo["bucket_max_lsn"] == mp["bucket_max_lsn"]


def test_scan_range_key_set_phase2_prunes_far_apart_candidates(spark, tmp_path, monkeypatch):
    """Round-5 scan_range phase 2: when the candidate set is small, the
    DISTINCT candidate keys drive key_set bisect file pruning — two
    far-apart keys read only their OWN files on a range-clustered base,
    where the old global (min, max) envelope kept every file between
    them."""
    import datetime

    from hierarchical_to_relational_spark.operators.merge import compact, scan_range
    from hierarchical_to_relational_spark.streaming.driver import CdcPipeline

    day = lambda d: datetime.datetime(2026, 1, 1) + datetime.timedelta(days=d)
    pipe = CdcPipeline(spark, str(tmp_path / "bl"), str(tmp_path / "t"),
                       str(tmp_path / "ck"), n_buckets=4, text_mode="none",
                       compact_every=999)
    # 40 conversations; ONLY the keyspace extremes c00/c39 carry day-50
    rows = [(i + 1, "insert", f"c{i:02d}",
             [(0, "user", f"t{i}", 50 if i in (0, 39) else i % 10)])
            for i in range(40)]
    for lo_i in range(0, 40, 10):
        pipe.apply_batch(_ts_envs(spark, rows[lo_i:lo_i + 10]), f"b{lo_i}")
    t = pipe.table
    # range-cluster the base into many tight-key-span files
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        assert compact(spark, t, batch_id="z0", zorder=["conv_id", "ts"])
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
        spark.conf.unset("spark.sql.shuffle.partitions")

    reads = []
    orig = SnapshotTable.read

    def spy(self, spark_, **kw):
        reads.append(kw)
        return orig(self, spark_, **kw)

    monkeypatch.setattr(SnapshotTable, "read", spy)
    out = scan_range(spark, t, "ts", day(49), day(51))
    got = {(r["conv_id"], r["text"]) for r in out.collect()}
    assert got == {("c00", "t0"), ("c39", "t39")}
    # phase 2 ran in the key-set regime with exactly the candidate keys
    assert reads[-1].get("key_set") == ["c00", "c39"]
    assert reads[-1].get("key_range") is None
    monkeypatch.undo()
    # and it scanned strictly fewer files than the envelope would
    key_files = set(out.inputFiles())
    env_files = set(t.read(spark, buckets=reads[-1]["buckets"],
                           key_range=("c00", "c39")).inputFiles())
    assert key_files and key_files < env_files, (
        f"key_set kept {len(key_files)} files, envelope {len(env_files)}")
    # oversized candidate sets fall back to the envelope regime
    reads.clear()
    monkeypatch.setattr(SnapshotTable, "read", spy)
    all_rows = scan_range(spark, t, "role", "user", "user", key_set_threshold=5)
    assert all_rows.count() == 40
    assert reads[-1].get("key_set") is None and reads[-1].get("key_range") is not None


def test_bloom_index_equality_probe_prunes_files(spark, tmp_path):
    """Round-5 secondary index: a table created with index_cols writes a
    per-file Bloom over the indexed column into the manifest sidecar, and
    an equality probe on a hash-like HIGH-CARDINALITY column (where every
    file's [min, max] bounds span the probe — bounds prune nothing) skips
    files the bloom proves absent. scan_range(v, v) rides the same pruning
    and stays resolution-safe; enable_index mid-stream indexes only new
    commits (old files never pruned — superset-safe)."""
    import hashlib

    from hierarchical_to_relational_spark.operators.merge import (
        scan_range,
        table_schema_for,
    )
    from hierarchical_to_relational_spark.streaming.driver import CdcPipeline
    from tests.test_cdc import _env_rows

    turn_cols = [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
    SnapshotTable.create(str(tmp_path / "t"), table_schema_for(turn_cols), 4,
                         index_cols=["text"])
    pipe = CdcPipeline(spark, str(tmp_path / "bl"), str(tmp_path / "t"),
                       str(tmp_path / "ck"), n_buckets=4, text_mode="none")
    texts, lsn = {}, 0
    for b in range(4):
        rows = []
        for i in range(12):
            lsn += 1
            tx = hashlib.md5(f"{b}-{i}".encode()).hexdigest()
            texts[(b, i)] = tx
            rows.append((lsn, "insert", f"c{b:02d}{i:02d}", [(0, "user", tx, None)]))
        pipe.apply_batch(_env_rows(spark, rows), f"b{b}")
    t = pipe.table
    assert t.index_cols == ["text"]

    probe = texts[(2, 5)]
    full = set(t.read(spark).inputFiles())
    kept = set(t.read(spark, col_eq={"text": probe}).inputFiles())
    bounds_only = set(t.read(spark, col_ranges={"text": (probe, probe)}).inputFiles())
    assert kept and kept < full, f"bloom kept {len(kept)}/{len(full)}"
    assert len(kept) < len(bounds_only), (
        "the bloom must prune beyond what min-max bounds can on a "
        f"hash-like column: {len(kept)} vs {len(bounds_only)}")
    out = scan_range(spark, t, "text", lo=probe, hi=probe)
    assert [(r["conv_id"], r["text"]) for r in out.collect()] == [("c0205", probe)]

    # enable_index on a previously UNindexed table: old files stay
    # unpruned (no bloom -> keep), new commits get blooms, results exact
    pipe2 = CdcPipeline(spark, str(tmp_path / "bl2"), str(tmp_path / "t2"),
                        str(tmp_path / "ck2"), n_buckets=4, text_mode="none")
    pipe2.apply_batch(_env_rows(spark, [
        (1, "insert", "cA", [(0, "user", "old-text", None)])]), "b0")
    assert pipe2.table.enable_index(["text"], "idx-on") is True
    assert pipe2.table.enable_index(["text"], "idx-on") is False  # idempotent
    pipe2.apply_batch(_env_rows(spark, [
        (2, "insert", "cB", [(0, "user", "new-text", None)])]), "b1")
    got = {r["conv_id"] for r in
           scan_range(spark, pipe2.table, "text", "old-text", "old-text").collect()}
    assert got == {"cA"}
    with pytest.raises(ValueError, match="string/int"):
        pipe2.table.enable_index(["ts"], "idx-bad")


def test_bloom_build_and_membership_unit():
    """Pure-Python bloom: no false negatives ever; false-keep rate near
    the designed ~1% at 9.6 bits/value."""
    from hierarchical_to_relational_spark.functions.xxh64 import xxh64
    from hierarchical_to_relational_spark.table.snapshot_table import (
        _bloom_build,
        _bloom_maybe,
    )

    vals = {f"v{i:05d}" for i in range(2000)}
    bl = _bloom_build(vals, xxh64)
    assert all(_bloom_maybe(bl, v, xxh64) for v in vals), "no false negatives"
    fp = sum(_bloom_maybe(bl, f"absent{i}", xxh64) for i in range(5000)) / 5000
    assert fp < 0.05, f"false-keep rate {fp}"
    # ints index too; unindexable probe values are never pruned on
    bli = _bloom_build({1, 2, 3}, xxh64)
    assert _bloom_maybe(bli, 2, xxh64) and not _bloom_maybe(bli, 99, xxh64)
    assert _bloom_maybe(bli, 1.5, xxh64) is True


def test_binpack_deltas_preserves_state_and_reduces_dirs(spark, tmp_path):
    """Round-5 bin-packing: small delta dirs merge VERBATIM (no resolve,
    no base rewrite) into one packed dir per bucket — resolved state is
    bit-identical, delta depth drops, tombstones/patches survive, the
    commit is idempotent, and incremental readers see NO spurious
    emissions (kind='compact' → skipped by changes_since)."""
    from hierarchical_to_relational_spark.operators.merge import (
        binpack_deltas,
        changes_since,
        read_transcripts,
    )
    from hierarchical_to_relational_spark.streaming.driver import CdcPipeline
    from tests.test_cdc import _env_rows

    pipe = CdcPipeline(spark, str(tmp_path / "bl"), str(tmp_path / "t"),
                       str(tmp_path / "ck"), n_buckets=2, text_mode="none",
                       compact_every=999)
    lsn = 0
    for b in range(5):
        rows = []
        for i in range(4):
            lsn += 1
            rows.append((lsn, "insert" if (b + i) % 3 else "update",
                         f"c{i}", [(b, "user", f"t{b}-{i}", None)]))
        lsn += 1
        rows.append((lsn, "delete", "c9", None))  # tombstones pass through
        pipe.apply_batch(_env_rows(spark, rows), f"b{b}")
    t = pipe.table
    before = sorted(map(tuple, read_transcripts(spark, t)
                        .select("conv_id", "turn_idx", "text").collect()))
    depth_before = t.delta_depth()
    v_before = t.current_version()

    packed = binpack_deltas(spark, t, "bp0", target_bytes=10 << 20, min_dirs=2)
    assert packed, "small dirs must get packed"
    assert t.delta_depth() < depth_before
    after = sorted(map(tuple, read_transcripts(spark, t)
                       .select("conv_id", "turn_idx", "text").collect()))
    assert after == before, "bin-packing must not change resolved state"
    # tombstones preserved verbatim: a late upsert below the del LSN stays dead
    assert binpack_deltas(spark, t, "bp0") == [], "idempotent on batch id"
    assert changes_since(spark, t, v_before).count() == 0, (
        "a pure rewrite must not re-emit anything downstream")
    # min_dirs guard: nothing left to pack at the same threshold
    assert binpack_deltas(spark, t, "bp1", target_bytes=10 << 20,
                          min_dirs=5) == []


def test_bloom_sidecar_spark_build_bit_identical(spark, tmp_path):
    """bloom_mode='spark' (executor-side applyInPandas build) AND
    bloom_mode='fold' (r6: built inside the write job itself — the
    indexed commit makes ONE pass over the batch, no re-read) write
    sidecars BIT-IDENTICAL to the driver-side pyarrow build on the same
    data, and equality probes prune identically."""
    import hashlib
    import json as _json
    import os

    from hierarchical_to_relational_spark.operators.merge import table_schema_for
    from hierarchical_to_relational_spark.streaming.driver import CdcPipeline
    from tests.test_cdc import _env_rows

    turn_cols = [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]

    def build(root, ck, bloom_mode):
        SnapshotTable.create(root, table_schema_for(turn_cols), 4,
                             index_cols=["text", "turn_idx"])
        pipe = CdcPipeline(spark, str(tmp_path / "bl"), root, ck,
                           n_buckets=4, text_mode="none")
        pipe.table.bloom_mode = bloom_mode
        lsn = 0
        for b in range(2):
            rows = []
            for i in range(10):
                lsn += 1
                tx = hashlib.md5(f"{b}-{i}".encode()).hexdigest()
                rows.append((lsn, "insert", f"c{b}{i}", [(i, "user", tx, None)]))
            pipe.apply_batch(_env_rows(spark, rows), f"b{b}")
        return pipe.table

    ta = build(str(tmp_path / "ta"), str(tmp_path / "cka"), "pyarrow")
    tb = build(str(tmp_path / "tb"), str(tmp_path / "ckb"), "spark")
    tc = build(str(tmp_path / "tc"), str(tmp_path / "ckc"), "fold")

    def blooms(t):
        # commit dirs carry uuid names: walk them in VERSION order (the
        # deterministic order both tables share); files inside a commit
        # sort by their part index
        seen, out = set(), []
        for v in range(1, t.current_version() + 1):
            dirs = {d for ds in t.snapshot(v)["live"].values() for d in ds}
            for d in sorted(dirs - seen):
                sc = os.path.join(t.root, d, "_file_stats.json")
                if os.path.exists(sc):
                    with open(sc) as f:
                        fs = _json.load(f)
                    out.extend(fs[rel]["bloom"] for rel in sorted(fs)
                               if "bloom" in fs[rel])
            seen |= dirs
        return out

    ba, bb, bc = blooms(ta), blooms(tb), blooms(tc)
    assert ba and len(ba) == len(bb) == len(bc)
    # same data partitioned the same way → same per-file distinct sets →
    # identical bloom bits, both columns (string AND integral, whose
    # pandas null-float round trip must coerce back)
    assert _json.dumps(ba, sort_keys=True) == _json.dumps(bb, sort_keys=True)
    assert _json.dumps(ba, sort_keys=True) == _json.dumps(bc, sort_keys=True)

    probe = hashlib.md5(b"1-3").hexdigest()
    kept_a = ta.read(spark, col_eq={"text": probe}).inputFiles()
    kept_b = tb.read(spark, col_eq={"text": probe}).inputFiles()
    kept_c = tc.read(spark, col_eq={"text": probe}).inputFiles()
    # identical blooms → identical pruning decisions (file NAMES differ:
    # uuid part files — the counts and the result rows are the invariant)
    assert len(kept_a) == len(kept_b) == len(kept_c) and kept_a
    assert len(kept_a) < len(ta.read(spark).inputFiles())
    # col_eq prunes FILES (superset semantics); the row filter is the
    # caller's — together they give the exact probe result on both builds
    for t in (ta, tb, tc):
        assert ({tuple(r) for r in t.read(spark, col_eq={"text": probe})
                 .where(F.col("text") == probe)
                 .select("conv_id", "text").collect()}
                == {("c13", probe)})


def test_tagged_snapshot_survives_expiration(spark, tmp_path):
    """Named refs (Iceberg-style tags): a tagged version outlives ANY
    retention window — snapshot file retained, data dirs protected from
    the orphan sweep, still time-travelable by name; dropping the tag
    returns it to normal retention."""
    import pytest as _pytest

    from hierarchical_to_relational_spark.operators.merge import (
        apply_cdc_batch,
        read_transcripts,
        table_schema_for,
    )
    from hierarchical_to_relational_spark.operators.normalize import (
        normalize_envelopes,
    )
    from tests.test_cdc import _env_rows

    cols = [T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), True),
            T.StructField("role", T.StringType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("tool", T.StringType(), True),
            T.StructField("ts", T.TimestampType(), True)]
    t = SnapshotTable.create(str(tmp_path / "t"), table_schema_for(cols), 2)

    def _apply(lsn, op, cid, turns, bid):
        u, d = normalize_envelopes(_env_rows(spark, [(lsn, op, cid, turns)]),
                                   text_mode="none")
        apply_cdc_batch(spark, t, u, d, batch_id=bid)

    _apply(1, "insert", "cA", [(0, "user", "a0", None)], "b0")
    v_tagged = t.tag("audit-2026q1")
    assert t.ref("audit-2026q1") == v_tagged == t.current_version()
    tagged_state = {(r["conv_id"], r["turn_idx"]): r["text"]
                    for r in read_transcripts(spark, t, version=v_tagged).collect()}

    for i in range(4):
        _apply(10 + i, "update", "cA", [(0, "user", f"a{i+1}", None)], f"b{i+1}")
    rep = t.expire_snapshots(retain_last=1, orphan_grace_seconds=0.0)
    assert rep["expired_snapshots"] > 0

    # the tagged version is still there and still reads EXACTLY its state
    assert v_tagged in t._versions(), "tag exempted the version from expiry"
    again = {(r["conv_id"], r["turn_idx"]): r["text"]
             for r in read_transcripts(spark, t, version=t.ref("audit-2026q1")).collect()}
    assert again == tagged_state == {("cA", 0): "a0"}
    # ...while untagged old versions between tag and head are gone
    assert len(t._versions()) == 2  # the tag + the current head

    # re-tag moves the name; drop returns the version to retention
    t.tag("audit-2026q1")  # now points at head
    assert t.ref("audit-2026q1") == t.current_version()
    t.expire_snapshots(retain_last=1, orphan_grace_seconds=0.0)
    assert v_tagged not in t._versions(), "old target re-entered retention and aged out"
    assert t.drop_tag("audit-2026q1") is True
    assert t.drop_tag("audit-2026q1") is False
    with _pytest.raises(KeyError):
        t.ref("audit-2026q1")
    with _pytest.raises(FileNotFoundError):
        t.tag("bogus", version=9999)


def test_read_by_tag_name(spark, tmp_path):
    """Every version-taking surface accepts a tag NAME (resolved in
    snapshot(), the single resolver)."""
    from hierarchical_to_relational_spark.operators.merge import (
        apply_cdc_batch,
        read_transcripts,
        table_schema_for,
    )
    from hierarchical_to_relational_spark.operators.normalize import (
        normalize_envelopes,
    )
    from tests.test_cdc import _env_rows

    cols = [T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), True),
            T.StructField("role", T.StringType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("tool", T.StringType(), True),
            T.StructField("ts", T.TimestampType(), True)]
    t = SnapshotTable.create(str(tmp_path / "t"), table_schema_for(cols), 2)
    u, d = normalize_envelopes(_env_rows(spark, [
        (1, "insert", "cA", [(0, "user", "v1", None)])]), text_mode="none")
    apply_cdc_batch(spark, t, u, d, batch_id="b0")
    t.tag("prod")
    u, d = normalize_envelopes(_env_rows(spark, [
        (2, "update", "cA", [(0, "user", "v2", None)])]), text_mode="none")
    apply_cdc_batch(spark, t, u, d, batch_id="b1")

    assert [r["text"] for r in read_transcripts(spark, t, version="prod").collect()] == ["v1"]
    assert [r["text"] for r in read_transcripts(spark, t).collect()] == ["v2"]
    assert t.schema("prod") == t.schema()
