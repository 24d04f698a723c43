"""CDC vertical slice: datagen → normalize → merge → read, verified against
the independent pure-pandas replay oracle (SURVEY.md §5.4, §7.2).

Judged invariants covered here (BASELINE.json north_rule):
- final-state equality: per-turn text equality under stable
  (conv_id, turn_idx) ordering;
- order-insensitivity: two different shuffles/batchings of the same event
  set yield identical final state;
- exactly-once: re-firing the same batch_id is a no-op;
- deletes: whole-conversation tombstones kill older turns, spare newer;
- schema evolution: additively-widened late events widen the target.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from hierarchical_to_relational_spark import datagen
from hierarchical_to_relational_spark.operators.merge import read_transcripts
from hierarchical_to_relational_spark.sources.binlog import envelope_schema
from hierarchical_to_relational_spark.streaming.driver import CdcPipeline
from pyspark.sql import types as T


SPEC = datagen.BinlogSpec(n_events=400, n_convs=25, seed=7)


@pytest.fixture(scope="module")
def binlog(tmp_path_factory):
    d = tmp_path_factory.mktemp("binlog")
    events = datagen.generate_events(SPEC)
    stream = datagen.arrival_order(events, SPEC)
    paths = datagen.write_binlog(stream, str(d), n_segments=6)
    return {"dir": str(d), "paths": paths, "events": events}


def _final_state(spark, table) -> pd.DataFrame:
    return (
        read_transcripts(spark, table)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
        .reset_index(drop=True)
    )


def _assert_matches_oracle(spark, pipe, events):
    got = _final_state(spark, pipe.table)
    want = datagen.expected_state(events)
    pd.testing.assert_frame_equal(
        got.astype({"turn_idx": "int64"}),
        want.astype({"turn_idx": "int64"}),
        check_dtype=False,
    )


def test_batch_replay_matches_oracle(spark, tmp_path, binlog):
    """Apply all segments as one batch; final state == pandas oracle."""
    pipe = CdcPipeline(spark, binlog["dir"], str(tmp_path / "t"), str(tmp_path / "ck"),
                       n_buckets=8, text_mode="none")
    pipe.replay_batch(binlog["dir"], "all")
    _assert_matches_oracle(spark, pipe, binlog["events"])


def test_incremental_equals_one_shot_and_batching_insensitive(spark, tmp_path, binlog):
    """Segment-at-a-time replay (out-of-order, duplicated arrivals split
    across arbitrary batch boundaries) converges to the same state."""
    pipe = CdcPipeline(spark, binlog["dir"], str(tmp_path / "t"), str(tmp_path / "ck"),
                       n_buckets=8, text_mode="none")
    for i, p in enumerate(binlog["paths"]):
        pipe.replay_batch(p, f"seg-{i}")
    _assert_matches_oracle(spark, pipe, binlog["events"])
    # different batching: reversed pairs of segments into a second table
    pipe2 = CdcPipeline(spark, binlog["dir"], str(tmp_path / "t2"), str(tmp_path / "ck2"),
                        n_buckets=8, text_mode="none")
    rev = list(reversed(binlog["paths"]))
    for i in range(0, len(rev), 2):
        pipe2.replay_batch(rev[i : i + 2], f"pair-{i}")
    pd.testing.assert_frame_equal(_final_state(spark, pipe.table), _final_state(spark, pipe2.table))


def test_exactly_once_refire_batch(spark, tmp_path, binlog):
    """Re-firing an applied batch_id leaves version + state unchanged."""
    pipe = CdcPipeline(spark, binlog["dir"], str(tmp_path / "t"), str(tmp_path / "ck"),
                       n_buckets=8, text_mode="none")
    m1 = pipe.replay_batch(binlog["paths"][0], "seg-0")
    assert m1["committed"] is True
    v = pipe.table.current_version()
    before = _final_state(spark, pipe.table)
    m2 = pipe.replay_batch(binlog["paths"][0], "seg-0")
    assert m2["committed"] is False
    assert pipe.table.current_version() == v
    pd.testing.assert_frame_equal(before, _final_state(spark, pipe.table))


def test_delete_semantics(spark, tmp_path):
    """Tombstone kills older turns; re-insert after delete survives; a
    late-arriving pre-delete event stays dead."""
    rows = [
        # lsn, op, conv, turns
        (1, "insert", "cA", [(0, "user", "hello", None), (1, "assistant", "hi", None)]),
        (2, "insert", "cB", [(0, "user", "keep me", None)]),
        (3, "delete", "cA", None),
        (4, "insert", "cA", [(0, "user", "reborn", None)]),
    ]
    late = [(2, "insert", "cA", [(5, "user", "late pre-delete", None)])]  # lsn 2 < delete lsn 3

    def env_df(rws):
        ts = pd.Timestamp("2026-01-01")
        data = [
            (
                lsn,
                ts.to_pydatetime(),
                op,
                cid,
                None if turns is None else {"turns": [
                    {"turn_idx": i, "role": r, "text": t, "tool": tool, "ts": ts.to_pydatetime()}
                    for (i, r, t, tool) in turns
                ]},
            )
            for (lsn, op, cid, turns) in rws
        ]
        return spark.createDataFrame(data, envelope_schema())

    pipe = CdcPipeline(spark, str(tmp_path / "bl"), str(tmp_path / "t"), str(tmp_path / "ck"),
                       n_buckets=4, text_mode="none")
    pipe.apply_batch(env_df(rows), "b1")
    pipe.apply_batch(env_df(late), "b2")  # must NOT resurrect cA turn 5
    got = {
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in read_transcripts(spark, pipe.table).collect()
    }
    assert got == {("cA", 0, "reborn"), ("cB", 0, "keep me")}


def test_schema_evolution_widens_target(spark, tmp_path):
    """F6b: late events carry an additive turn field → the target table is
    widened before merge; earlier rows read as null."""
    spec_old = datagen.BinlogSpec(n_events=60, n_convs=6, seed=11, delete_rate=0.0)
    spec_new = datagen.BinlogSpec(n_events=60, n_convs=6, seed=12, delete_rate=0.0, evolve_after=0)
    old_events = datagen.generate_events(spec_old)
    new_events = datagen.generate_events(spec_new)
    new_events["lsn"] = new_events["lsn"] + 1000
    d_old, d_new = str(tmp_path / "old"), str(tmp_path / "new")
    datagen.write_binlog(old_events.rename(columns={}), d_old, n_segments=1)
    datagen.write_binlog(new_events, d_new, n_segments=1, evolved=True)

    pipe = CdcPipeline(spark, d_old, str(tmp_path / "t"), str(tmp_path / "ck"),
                       n_buckets=4, text_mode="none")
    pipe.replay_batch(d_old, "b-old")
    assert "model" not in pipe.table.schema().fieldNames()

    evolved_env = envelope_schema([T.StructField("model", T.StringType(), True)])
    env = spark.read.schema(evolved_env).parquet(d_new)
    pipe.apply_batch(env, "b-new")
    assert "model" in pipe.table.schema().fieldNames()

    out = read_transcripts(spark, pipe.table)
    assert "model" in out.columns
    n_new = out.where(F.col("model").isNotNull()).count()
    n_old = out.where(F.col("model").isNull()).count()
    assert n_new > 0 and n_old > 0


def _rating_envs(spark, rows, rating_type):
    """rows: (lsn, op, conv_id, [(turn_idx, role, text, rating)]) with a
    numeric ``rating`` turn column of the given Spark type."""
    import pandas as pd

    ts = pd.Timestamp("2026-01-01").to_pydatetime()
    schema = envelope_schema([T.StructField("rating", rating_type, True)])
    data = [
        (lsn, ts, op, cid,
         None if turns is None else {"turns": [
             {"turn_idx": i, "role": r, "text": t, "tool": None, "ts": ts, "rating": rt}
             for (i, r, t, rt) in turns]})
        for (lsn, op, cid, turns) in rows
    ]
    return spark.createDataFrame(data, schema)


def test_type_widening_evolution(spark, tmp_path):
    """A mid-stream int→long widening of a turn column evolves the table
    metadata-only; old narrow files read cast-up, late narrow batches cast
    up at write, and the final state matches an independent LWW oracle.
    Incompatible changes (long→string) are rejected."""
    pipe = CdcPipeline(spark, str(tmp_path / "bl"), str(tmp_path / "t"),
                       str(tmp_path / "ck"), n_buckets=4, text_mode="none",
                       envelope_schema=envelope_schema(
                           [T.StructField("rating", T.IntegerType(), True)]))
    pipe.apply_batch(_rating_envs(spark, [
        (1, "insert", "cA", [(0, "user", "a0", 7), (1, "assistant", "a1", 3)]),
        (2, "insert", "cB", [(0, "user", "b0", None)]),
    ], T.IntegerType()), "b0")
    assert pipe.table.schema()["rating"].dataType == T.IntegerType()

    big = 5_000_000_000  # does not fit int32
    pipe.apply_batch(_rating_envs(spark, [
        (3, "update", "cA", [(1, "assistant", "a1-v2", big)]),
    ], T.LongType()), "b1")
    assert pipe.table.schema()["rating"].dataType == T.LongType(), \
        "int→long widening evolved the table schema"

    # a NARROW (int) producer still lands after the widening, cast up
    pipe.apply_batch(_rating_envs(spark, [
        (4, "insert", "cC", [(0, "user", "c0", 9)]),
    ], T.IntegerType()), "b2")

    got = {(r["conv_id"], r["turn_idx"]): (r["text"], r["rating"])
           for r in read_transcripts(spark, pipe.table).collect()}
    # independent oracle: LWW fold of the event list by (conv, turn, lsn)
    want = {("cA", 0): ("a0", 7), ("cA", 1): ("a1-v2", big),
            ("cB", 0): ("b0", None), ("cC", 0): ("c0", 9)}
    assert got == want
    assert read_transcripts(spark, pipe.table).schema["rating"].dataType == T.LongType()

    # time travel BEFORE the widening still serves the narrow schema
    assert pipe.table.schema(version=1)["rating"].dataType == T.IntegerType()

    # incompatible change: numeric → string is refused, table untouched
    with pytest.raises(ValueError, match="incompatible type change"):
        pipe.apply_batch(_rating_envs(spark, [
            (5, "insert", "cD", [(0, "user", "d0", "five-stars")]),
        ], T.StringType()), "b3")
    assert pipe.table.schema()["rating"].dataType == T.LongType()


def test_evolve_to_rules(spark, tmp_path):
    """SnapshotTable.evolve_to unit rules: float→double and decimal
    precision-up accepted; narrowing and scale changes rejected; no-op
    returns False without a commit."""
    from hierarchical_to_relational_spark.table.snapshot_table import SnapshotTable

    schema = T.StructType([
        T.StructField("k", T.StringType(), False),
        T.StructField("x", T.FloatType(), True),
        T.StructField("d", T.DecimalType(10, 2), True),
    ])
    t = SnapshotTable.create(str(tmp_path / "t"), schema, n_buckets=2)
    v0 = t.current_version()
    assert t.evolve_to(schema, "e0") is False and t.current_version() == v0

    wide = T.StructType([
        T.StructField("k", T.StringType(), False),
        T.StructField("x", T.DoubleType(), True),
        T.StructField("d", T.DecimalType(18, 2), True),
    ])
    assert t.evolve_to(wide, "e1") is True
    assert t.schema()["x"].dataType == T.DoubleType()
    assert t.schema()["d"].dataType == T.DecimalType(18, 2)

    # a narrower schema is tolerated (kept wide; batches cast up at write)
    # and does NOT move the table
    v1 = t.current_version()
    assert t.evolve_to(schema, "e2") is False and t.current_version() == v1
    with pytest.raises(ValueError):  # decimal scale change is NOT lossless
        t.evolve_to(T.StructType([
            T.StructField("k", T.StringType(), False),
            T.StructField("x", T.DoubleType(), True),
            T.StructField("d", T.DecimalType(20, 4), True),
        ]), "e3")


def test_lineage_records(spark, tmp_path, binlog):
    pipe = CdcPipeline(spark, binlog["dir"], str(tmp_path / "t"), str(tmp_path / "ck"),
                       n_buckets=8, text_mode="none")
    for i, p in enumerate(binlog["paths"][:3]):
        pipe.replay_batch(p, f"seg-{i}")
    entries = pipe.lineage.entries()
    assert len(entries) == 3
    assert all({"batch_id", "rows_written", "buckets", "max_lsn", "table_version"} <= set(e) for e in entries)
    assert pipe.lineage.applied_lsn_watermark() is not None


def test_arrow_normalize_text(spark, tmp_path):
    """The vectorized Arrow normalize path cleans whitespace/control chars
    and matches the builtin-column path on plain input."""
    ts = pd.Timestamp("2026-01-01").to_pydatetime()
    data = [
        (1, ts, "insert", "cA",
         {"turns": [{"turn_idx": 0, "role": "user", "text": "  hello\t\tworld \x00!", "tool": None, "ts": ts}]})
    ]
    env = spark.createDataFrame(data, envelope_schema())
    pipe = CdcPipeline(spark, str(tmp_path / "bl"), str(tmp_path / "t"), str(tmp_path / "ck"),
                       n_buckets=2, text_mode="arrow")
    pipe.apply_batch(env, "b1")
    (row,) = read_transcripts(spark, pipe.table).collect()
    assert row["text"] == "hello world !"


def test_cow_mode_matches_oracle(spark, tmp_path, binlog):
    """Copy-on-write strategy converges to the same state as merge-on-read."""
    pipe = CdcPipeline(spark, binlog["dir"], str(tmp_path / "t"), str(tmp_path / "ck"),
                       n_buckets=8, text_mode="none", mode="cow")
    for i, p in enumerate(binlog["paths"]):
        pipe.replay_batch(p, f"seg-{i}")
    _assert_matches_oracle(spark, pipe, binlog["events"])


def test_mor_compaction_preserves_state(spark, tmp_path, binlog):
    """Appended deltas stack; compaction folds them without changing the
    resolved state; reads are identical before/after."""
    pipe = CdcPipeline(spark, binlog["dir"], str(tmp_path / "t"), str(tmp_path / "ck"),
                       n_buckets=8, text_mode="none", mode="mor", compact_every=1000)
    for i, p in enumerate(binlog["paths"]):
        pipe.replay_batch(p, f"seg-{i}")
    assert pipe.table.delta_depth() >= len(binlog["paths"]) - 1
    before = _final_state(spark, pipe.table)
    from hierarchical_to_relational_spark.operators.merge import compact
    assert compact(spark, pipe.table, "compact-1") is True
    assert pipe.table.delta_depth() == 1
    pd.testing.assert_frame_equal(before, _final_state(spark, pipe.table))
    _assert_matches_oracle(spark, pipe, binlog["events"])
    # compaction replay is a no-op
    assert compact(spark, pipe.table, "compact-1") is False


def test_tombstone_gc_on_compaction(spark, tmp_path, binlog):
    """Compaction with a retention watermark drops old tombstone rows but
    never live rows; resolved user-facing state is unchanged."""
    from hierarchical_to_relational_spark.operators.merge import compact
    from pyspark.sql import functions as F

    pipe = CdcPipeline(spark, binlog["dir"], str(tmp_path / "t"), str(tmp_path / "ck"),
                       n_buckets=8, text_mode="none")
    for i, p in enumerate(binlog["paths"]):
        pipe.replay_batch(p, f"seg-{i}")
    before = _final_state(spark, pipe.table)
    raw = pipe.table.read(spark)
    n_tomb_before = raw.where(F.col("_op") == "d").count()
    assert n_tomb_before > 0
    max_lsn = int(binlog["events"]["lsn"].max())
    assert compact(spark, pipe.table, "gc", expire_tombstones_below=max_lsn + 1) is True
    raw2 = pipe.table.read(spark)
    assert raw2.where(F.col("_op") == "d").count() == 0
    pd.testing.assert_frame_equal(before, _final_state(spark, pipe.table))


def test_derived_batch_id_applies_new_segments(spark, tmp_path):
    """Batch-mode replays derive the idempotence key from the input file
    listing: identical input → no-op; a NEW segment → a distinct batch that
    actually applies (a fixed id would silently skip the new data)."""
    d = str(tmp_path / "binlog")
    events = datagen.generate_events(datagen.BinlogSpec(n_events=200, n_convs=10, seed=7))
    stream = datagen.arrival_order(events, datagen.BinlogSpec(n_events=200, n_convs=10, seed=7))
    datagen.write_binlog(stream[:150], d, n_segments=3)

    pipe = CdcPipeline(spark, d, str(tmp_path / "t"), str(tmp_path / "ck"),
                       n_buckets=4, text_mode="none")
    m1 = pipe.replay_batch(d)
    assert m1["committed"] is True
    m2 = pipe.replay_batch(d)  # same listing → same derived id → no-op
    assert m2["committed"] is False and m2["batch_id"] == m1["batch_id"]

    # a late segment lands; the derived id changes and the replay applies
    datagen.write_binlog(stream[150:], d, n_segments=1, start_segment=3)
    m3 = pipe.replay_batch(d)
    assert m3["committed"] is True and m3["batch_id"] != m1["batch_id"]
    _assert_matches_oracle(spark, pipe, events)


def test_size_based_compaction_trigger(spark, tmp_path):
    """With a tiny byte threshold (and the depth trigger disabled), the
    pipeline compacts based on manifest delta-byte stats; state unchanged."""
    d = str(tmp_path / "binlog")
    spec = datagen.BinlogSpec(n_events=120, n_convs=6, seed=9)
    events = datagen.generate_events(spec)
    datagen.write_binlog(datagen.arrival_order(events, spec), d, n_segments=2)

    pipe = CdcPipeline(spark, d, str(tmp_path / "t"), str(tmp_path / "ck"),
                       n_buckets=2, text_mode="none",
                       compact_every=10_000, compact_min_bytes=1)
    env = spark.read.schema(pipe.envelope_schema).parquet(d)
    rows = env.collect()
    m1 = pipe.apply_batch(spark.createDataFrame(rows[:60], pipe.envelope_schema), 0)
    m2 = pipe.apply_batch(spark.createDataFrame(rows[60:], pipe.envelope_schema), 1)
    # first append is all base (no deltas to fold); the second stacks a
    # delta whose manifest bytes trip the threshold
    assert "compacted" not in m1 and m2.get("compacted")
    assert pipe.table.delta_depth() <= 1  # folded down after each batch
    _assert_matches_oracle(spark, pipe, events)

    # depth-only pipeline with a huge threshold never size-compacts
    pipe2 = CdcPipeline(spark, d, str(tmp_path / "t2"), str(tmp_path / "ck2"),
                        n_buckets=2, text_mode="none",
                        compact_every=10_000, compact_min_bytes=None)
    pipe2.apply_batch(spark.createDataFrame(rows[:60], pipe2.envelope_schema), 0)
    m = pipe2.apply_batch(spark.createDataFrame(rows[60:], pipe2.envelope_schema), 1)
    assert "compacted" not in m and pipe2.table.delta_depth() == 2


def test_csv_binlog_replays_to_same_state(spark, tmp_path, binlog):
    """A flat CSV export of the SAME arrival stream (one row per turn,
    null-turn delete rows — the reference's example-pipeline File-source
    shape) replays through the pipeline to the identical final state as
    the nested parquet WAL, both in batch and as a checkpointed stream."""
    events, spec = binlog["events"], SPEC
    stream = datagen.arrival_order(events, spec)
    d = str(tmp_path / "csvlog")
    paths = datagen.write_binlog_csv(stream, d, n_segments=6)
    assert len(paths) == 6 and all(p.endswith(".csv") for p in paths)

    # batch replay
    pipe = CdcPipeline(spark, d, str(tmp_path / "t"), str(tmp_path / "ck"),
                       n_buckets=8, text_mode="none", source_format="csv")
    pipe.replay_batch(d, "all")
    _assert_matches_oracle(spark, pipe, events)

    # streaming replay (availableNow over the csv segments)
    pipe2 = CdcPipeline(spark, d, str(tmp_path / "t2"), str(tmp_path / "ck2"),
                        n_buckets=8, text_mode="none", source_format="csv")
    pipe2.run_stream(max_files_per_trigger=2)
    pd.testing.assert_frame_equal(_final_state(spark, pipe.table),
                                  _final_state(spark, pipe2.table))


def test_csv_binlog_evolved_schema(spark, tmp_path):
    """CSV segments carrying an additively-evolved turn column (model)
    replay correctly when the evolved envelope schema is supplied."""
    spec = datagen.BinlogSpec(n_events=120, n_convs=8, seed=11, evolve_after=0)
    events = datagen.generate_events(spec)
    d = str(tmp_path / "csvlog")
    datagen.write_binlog_csv(datagen.arrival_order(events, spec), d,
                             n_segments=2, evolved=True)
    evolved = envelope_schema([T.StructField("model", T.StringType(), True)])
    pipe = CdcPipeline(spark, d, str(tmp_path / "t"), str(tmp_path / "ck"),
                       n_buckets=4, text_mode="none", source_format="csv",
                       envelope_schema=evolved)
    pipe.replay_batch(d, "all")
    got = _final_state(spark, pipe.table)
    assert "model" in got.columns and got["model"].notna().any()
    want = datagen.expected_state(events)
    pd.testing.assert_frame_equal(
        got[want.columns].astype({"turn_idx": "int64"}),
        want.astype({"turn_idx": "int64"}),
        check_dtype=False,
    )


def _env_rows(spark, rows):
    """rows: (lsn, op, conv_id, turns=[(idx, role, text, tool)]|None) → envelopes.
    Patch turns may carry None for unset columns (merge-patch)."""
    ts = pd.Timestamp("2026-01-01").to_pydatetime()
    data = [
        (
            lsn, ts, op, cid,
            None if turns is None else {"turns": [
                {"turn_idx": i, "role": r, "text": t, "tool": tool, "ts": ts}
                for (i, r, t, tool) in turns
            ]},
        )
        for (lsn, op, cid, turns) in rows
    ]
    return spark.createDataFrame(data, envelope_schema())


PATCH_EVENTS = [
    # full insert: two turns
    (1, "insert", "cA", [(0, "user", "hello", None), (1, "assistant", "hi", "bash")]),
    # patch turn 0: only text changes, role/tool keep previous values
    (2, "patch", "cA", [(0, None, "hello-edited", None)]),
    # patch turn 1: only tool changes
    (3, "patch", "cA", [(1, None, None, "python")]),
    # full rewrite of turn 1 AFTER the patch: resets every column (tool→None)
    (4, "update", "cA", [(1, "assistant", "hi-v2", None)]),
    # patch on top of the rewrite
    (5, "patch", "cA", [(1, None, None, "search")]),
    # other conversation, then delete it — patches below the tombstone die
    (6, "insert", "cB", [(0, "user", "doomed", None)]),
    (7, "patch", "cB", [(0, None, "edited-doomed", None)]),
    (8, "delete", "cB", None),
]

PATCH_WANT = {
    ("cA", 0, "user", "hello-edited", None),
    ("cA", 1, "assistant", "hi-v2", "search"),
}


def _patch_state(spark, table):
    return {
        (r["conv_id"], r["turn_idx"], r["role"], r["text"], r["tool"])
        for r in read_transcripts(spark, table).collect()
    }


def test_merge_patch_semantics(spark, tmp_path):
    """Partial-column upserts (op=patch): null columns keep the previous
    value; a later full row resets every column; patches below a tombstone
    die. Final state is identical for in-order, reversed, and re-fired
    replays (order-insensitivity of the full+patch semilattice)."""
    pipe = CdcPipeline(spark, str(tmp_path / "bl"), str(tmp_path / "t"),
                       str(tmp_path / "ck"), n_buckets=2, text_mode="none",
                       compact_every=10_000)
    for i, ev in enumerate(PATCH_EVENTS):
        pipe.apply_batch(_env_rows(spark, [ev]), f"b{i}")
    assert _patch_state(spark, pipe.table) == PATCH_WANT

    # reversed arrival, different batching
    pipe2 = CdcPipeline(spark, str(tmp_path / "bl"), str(tmp_path / "t2"),
                        str(tmp_path / "ck2"), n_buckets=2, text_mode="none",
                        compact_every=10_000)
    rev = list(reversed(PATCH_EVENTS))
    pipe2.apply_batch(_env_rows(spark, rev[:3]), "r0")
    pipe2.apply_batch(_env_rows(spark, rev[3:]), "r1")
    # duplicate re-fire of the whole stream under a new id (dup events)
    pipe2.apply_batch(_env_rows(spark, PATCH_EVENTS), "r2")
    assert _patch_state(spark, pipe2.table) == PATCH_WANT


def test_merge_patch_compaction_and_squash(spark, tmp_path):
    """Compaction keeps live patch rows as rows (per-column provenance
    survives the fold) — a LATE patch with an in-between LSN still resolves
    correctly after compaction. squash_patches_below folds patches under
    the retention watermark into materialized rows and state is unchanged."""
    from hierarchical_to_relational_spark.operators.merge import compact
    from hierarchical_to_relational_spark.operators.normalize import META_OP

    pipe = CdcPipeline(spark, str(tmp_path / "bl"), str(tmp_path / "t"),
                       str(tmp_path / "ck"), n_buckets=2, text_mode="none",
                       compact_every=10_000)
    pipe.apply_batch(_env_rows(spark, [
        (1, "insert", "cA", [(0, "user", "base", "bash")]),
        (4, "patch", "cA", [(0, None, "patched@4", None)]),
    ]), "b0")
    compact(spark, pipe.table, batch_id="c0")
    # late patch with LSN 3 (< 4): sets tool; text must STAY patched@4
    # (set at 4), tool comes from 3, role from the full row at 1
    pipe.apply_batch(_env_rows(spark, [
        (3, "patch", "cA", [(0, None, "late-text@3", "python")]),
    ]), "b1")
    assert _patch_state(spark, pipe.table) == {("cA", 0, "user", "patched@4", "python")}

    # squash everything below LSN 10 → patches fold away, state unchanged
    compact(spark, pipe.table, batch_id="c1", squash_patches_below=10)
    stored = pipe.table.read(spark)
    assert stored.where(F.col(META_OP) == "p").count() == 0
    assert _patch_state(spark, pipe.table) == {("cA", 0, "user", "patched@4", "python")}


def test_merge_patch_without_base_row(spark, tmp_path):
    """A patch for a key that never got a full upsert materializes a row
    with nulls for never-set columns (upsert-style, total semantics)."""
    pipe = CdcPipeline(spark, str(tmp_path / "bl"), str(tmp_path / "t"),
                       str(tmp_path / "ck"), n_buckets=2, text_mode="none")
    pipe.apply_batch(_env_rows(spark, [
        (1, "patch", "cX", [(0, None, "orphan-patch", None)]),
    ]), "b0")
    assert _patch_state(spark, pipe.table) == {("cX", 0, None, "orphan-patch", None)}


# ---------------------------------------------------------------------------
# changes_since: incremental CDC egress (net-diff contract)
# ---------------------------------------------------------------------------

def _apply_diff(state: pd.DataFrame, changes) -> pd.DataFrame:
    """Independent consumer model: apply a changes_since poll to a cached
    snapshot — deletes drop whole conversations, then upserts replace rows
    by (conv_id, turn_idx). Emitted upserts always supersede the poll's
    tombstones (they are post-resolution live state), so d-then-u is the
    correct apply order regardless of per-row LSNs."""
    dead = {r["conv_id"] for r in changes if r["change_op"] == "d"}
    ups = [r for r in changes if r["change_op"] == "u"]
    out = state[~state["conv_id"].isin(dead)]
    if ups:
        up_df = pd.DataFrame(
            [{c: r[c] for c in state.columns} for r in ups], columns=state.columns
        )
        keys = list(zip(up_df["conv_id"], up_df["turn_idx"]))
        mask = [
            (c, t) not in set(keys) for c, t in zip(out["conv_id"], out["turn_idx"])
        ]
        out = pd.concat([out[mask], up_df], ignore_index=True)
    return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def test_changes_since_net_diff(spark, tmp_path, binlog):
    """Replay half the (shuffled, out-of-order) stream, checkpoint
    (state, version); replay the rest, with compactions before and after
    the checkpoint; changes_since(version) applied to the checkpointed
    state must equal the current table state — late events with LOW LSNs
    are still surfaced because the cursor is the snapshot version, and the
    post-checkpoint compaction (a pure rewrite) adds no spurious
    re-emissions."""
    from hierarchical_to_relational_spark.operators.merge import changes_since, compact

    pipe = CdcPipeline(spark, binlog["dir"], str(tmp_path / "t"), str(tmp_path / "ck"),
                       n_buckets=8, text_mode="none", compact_every=10_000)
    half = len(binlog["paths"]) // 2
    for i, p in enumerate(binlog["paths"][:half]):
        pipe.replay_batch(p, f"seg-{i}")
    compact(spark, pipe.table, batch_id="mid-compact")
    state1 = _final_state(spark, pipe.table)
    v1 = pipe.table.current_version()

    for i, p in enumerate(binlog["paths"][half:]):
        pipe.replay_batch(p, f"seg-late-{i}")
    compact(spark, pipe.table, batch_id="late-compact")

    changes = changes_since(spark, pipe.table, v1).collect()
    assert changes, "second half of the stream must surface changes"
    got = _apply_diff(state1, changes)
    want = _final_state(spark, pipe.table)
    pd.testing.assert_frame_equal(
        got.astype({"turn_idx": "int64"}), want.astype({"turn_idx": "int64"}),
        check_dtype=False,
    )

    # idle poll at the advanced cursor: empty, stable schema
    again = changes_since(spark, pipe.table, pipe.table.current_version())
    assert again.count() == 0
    assert again.columns == [c for c in want.columns] + ["change_lsn", "change_op"]


def test_changes_since_delete_then_reinsert(spark, tmp_path):
    """A conversation deleted and re-inserted past the watermark emits BOTH
    a 'd' row and the new 'u' rows; a late dead upsert (below an old
    tombstone the consumer already saw) nets to nothing."""
    from hierarchical_to_relational_spark.operators.merge import changes_since

    pipe = CdcPipeline(spark, str(tmp_path / "bl"), str(tmp_path / "t"),
                       str(tmp_path / "ck"), n_buckets=2, text_mode="none")
    pipe.apply_batch(_env_rows(spark, [
        (1, "insert", "cA", [(0, "user", "v1", None)]),
        (5, "delete", "cB", None),          # consumer sees this tombstone
    ]), "b0")
    v1 = pipe.table.current_version()
    pipe.apply_batch(_env_rows(spark, [
        (6, "delete", "cA", None),
        (7, "insert", "cA", [(0, "user", "reborn", None)]),
        (3, "insert", "cB", [(0, "user", "late-dead", None)]),  # below cB tombstone
    ]), "b1")
    rows = changes_since(spark, pipe.table, v1).collect()
    by_op = {}
    for r in rows:
        by_op.setdefault(r["change_op"], []).append(r)
    assert {r["conv_id"] for r in by_op.get("d", [])} == {"cA"}
    assert [(r["conv_id"], r["turn_idx"], r["text"]) for r in by_op.get("u", [])] == [
        ("cA", 0, "reborn")
    ]


def test_changes_since_pure_rewrites_emit_nothing(spark, tmp_path):
    """A window containing only a compaction (pure rewrite) emits zero
    changes — the live-map churn is skipped via the commit kind."""
    from hierarchical_to_relational_spark.operators.merge import changes_since, compact

    pipe = CdcPipeline(spark, str(tmp_path / "bl"), str(tmp_path / "t"),
                       str(tmp_path / "ck"), n_buckets=2, text_mode="none",
                       compact_every=10_000)
    pipe.apply_batch(_env_rows(spark, [
        (1, "insert", "cA", [(0, "user", "v1", None)]),
        (2, "insert", "cB", [(0, "user", "v1", None)]),
    ]), "b0")
    v1 = pipe.table.current_version()
    compact(spark, pipe.table, batch_id="c0")
    assert changes_since(spark, pipe.table, v1).count() == 0


def test_changes_since_emits_through_rollback(spark, tmp_path):
    """Round-5: a rollback in the window EMITS an applicable diff —
    synthetic conversation deletes scanned from the dirs the rollback
    un-referenced (rolled-back rows vanish without tombstones, but their
    physical rows are still on disk, GC-protected by the pre-rollback
    snapshot) plus a superset re-add of the affected buckets' current
    rows. Applying the diff to the post-bad-batch checkpoint reproduces
    the post-rollback state exactly, including un-inserting cC and
    reverting cA."""
    from hierarchical_to_relational_spark.operators.merge import changes_since

    pipe = CdcPipeline(spark, str(tmp_path / "bl"), str(tmp_path / "t"),
                       str(tmp_path / "ck"), n_buckets=2, text_mode="none")
    pipe.apply_batch(_env_rows(spark, [
        (1, "insert", "cA", [(0, "user", "keep", None)]),
    ]), "b0")
    v_good = pipe.table.current_version()
    pipe.apply_batch(_env_rows(spark, [
        (2, "insert", "cA", [(0, "user", "bad-data", None)]),
        (3, "insert", "cC", [(0, "user", "bad-row", None)]),
    ]), "b1")
    v_ckpt = pipe.table.current_version()
    state_ckpt = _final_state(spark, pipe.table)
    # consumer checkpointed AFTER the bad batch; operator rolls it back
    pipe.table.rollback(v_good, batch_id="rb0")
    changes = changes_since(spark, pipe.table, v_ckpt).collect()
    assert any(r["change_op"] == "d" and r["conv_id"] == "cC" for r in changes), \
        "the un-inserted conv must get a synthetic delete"
    got = _apply_diff(state_ckpt, changes)
    want = _final_state(spark, pipe.table)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the retracted dirs expiring BEFORE consumption is the one remaining
    # resync case
    import shutil as _sh

    snap_mid = pipe.table.snapshot(v_ckpt)["live"]
    snap_now = pipe.table.snapshot()["live"]
    gone = ({d for ds in snap_mid.values() for d in ds}
            - {d for ds in snap_now.values() for d in ds})
    for d in gone:
        _sh.rmtree(str(tmp_path / "t" / d), ignore_errors=True)
    with pytest.raises(ValueError, match="resync"):
        changes_since(spark, pipe.table, v_ckpt).collect()


def test_changes_since_cow_overwrite_supersets(spark, tmp_path):
    """A CoW-mode merge commit in the window (non-append live change)
    degrades to whole-bucket re-emission; applying the poll to the
    checkpointed state still reproduces the current table state."""
    from hierarchical_to_relational_spark.operators.merge import changes_since

    pipe = CdcPipeline(spark, str(tmp_path / "bl"), str(tmp_path / "t"),
                       str(tmp_path / "ck"), n_buckets=2, text_mode="none",
                       mode="cow")
    pipe.apply_batch(_env_rows(spark, [
        (1, "insert", "cA", [(0, "user", "v1", None)]),
        (2, "insert", "cB", [(0, "user", "stays", None)]),
    ]), "b0")
    v1 = pipe.table.current_version()
    state1 = _final_state(spark, pipe.table)
    pipe.apply_batch(_env_rows(spark, [
        (3, "update", "cA", [(0, "user", "v2", None)]),
        (4, "delete", "cB", None),
        (5, "insert", "cC", [(0, "user", "new", None)]),
    ]), "b1")
    changes = changes_since(spark, pipe.table, v1).collect()
    got = _apply_diff(state1, changes)
    want = _final_state(spark, pipe.table)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_random_patch_stream_matches_oracle(spark, tmp_path):
    """Randomized merge-patch gate: a zipf-skewed, shuffled, duplicated
    stream with 25% patch events replayed through the engine equals the
    independent pandas per-column-fold oracle — and a second replay under
    a different batching converges to the same state."""
    spec = datagen.BinlogSpec(n_events=300, n_convs=20, seed=23, patch_rate=0.25)
    events = datagen.generate_events(spec)
    assert (events["op"] == "patch").sum() > 30
    d = str(tmp_path / "bl")
    paths = datagen.write_binlog(datagen.arrival_order(events, spec), d, n_segments=5)

    pipe = CdcPipeline(spark, d, str(tmp_path / "t"), str(tmp_path / "ck"),
                       n_buckets=8, text_mode="none")
    for i, p in enumerate(paths):
        pipe.replay_batch(p, f"seg-{i}")
    _assert_matches_oracle(spark, pipe, events)

    pipe2 = CdcPipeline(spark, d, str(tmp_path / "t2"), str(tmp_path / "ck2"),
                        n_buckets=8, text_mode="none")
    rev = list(reversed(paths))
    for i in range(0, len(rev), 2):
        pipe2.replay_batch(rev[i:i + 2], f"pair-{i}")
    _assert_matches_oracle(spark, pipe2, events)


def test_changes_since_legacy_rollback_sniffed(spark, tmp_path):
    """Pre-kind snapshots (older table format) whose batch id matches the
    maintenance CLI's derived rollback ids are sniffed as rollbacks — a
    plain superset emission would silently keep rolled-back rows alive;
    the sniffed rollback takes the synthetic-delete path instead and the
    applied diff un-inserts cB downstream."""
    import json
    from hierarchical_to_relational_spark.operators.merge import changes_since

    pipe = CdcPipeline(spark, str(tmp_path / "bl"), str(tmp_path / "t"),
                       str(tmp_path / "ck"), n_buckets=2, text_mode="none")
    pipe.apply_batch(_env_rows(spark, [(1, "insert", "cA", [(0, "user", "a", None)])]), "b0")
    v1 = pipe.table.current_version()
    pipe.apply_batch(_env_rows(spark, [(2, "insert", "cB", [(0, "user", "b", None)])]), "b1")
    v_ckpt = pipe.table.current_version()
    state_ckpt = _final_state(spark, pipe.table)
    pipe.table.rollback(v1, batch_id=f"maintenance-rollback-{v1}-v{v1+1}")
    # strip the kind field to simulate a snapshot from the pre-kind engine
    path = pipe.table._snapshot_path(pipe.table.current_version())
    with open(path) as fh:
        snap = json.load(fh)
    del snap["kind"]
    with open(path, "w") as fh:
        json.dump(snap, fh)
    changes = changes_since(spark, pipe.table, v_ckpt).collect()
    assert any(r["change_op"] == "d" and r["conv_id"] == "cB" for r in changes)
    got = _apply_diff(state_ckpt, changes)
    want = _final_state(spark, pipe.table)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_csv_binlog_embedded_newlines(spark, tmp_path):
    """RFC-4180 quoted fields with EMBEDDED NEWLINES (routine in chat
    transcript text) must round-trip through the CSV source — the
    multiLine reader parses them as one record, batch and stream."""
    events = pd.DataFrame({
        "lsn": [1, 2, 3],
        "commit_ts": pd.to_datetime(["2026-01-01"] * 3),
        "op": ["insert", "insert", "delete"],
        "conv_id": ["cA", "cB", "cC"],
        "turns": [
            [{"turn_idx": 0, "role": "user", "text": "line one\nline two", "tool": None,
              "ts": pd.Timestamp("2026-01-01").to_pydatetime()}],
            [{"turn_idx": 0, "role": "assistant", "text": 'quote " and,\ncomma', "tool": "bash",
              "ts": pd.Timestamp("2026-01-01").to_pydatetime()}],
            None,
        ],
    })
    d = str(tmp_path / "csvlog")
    datagen.write_binlog_csv(events, d, n_segments=1)
    pipe = CdcPipeline(spark, d, str(tmp_path / "t"), str(tmp_path / "ck"),
                       n_buckets=2, text_mode="none", source_format="csv")
    pipe.replay_batch(d, "all")
    got = {(r["conv_id"], r["text"]) for r in read_transcripts(spark, pipe.table).collect()}
    assert got == {("cA", "line one\nline two"), ("cB", 'quote " and,\ncomma')}

    pipe2 = CdcPipeline(spark, d, str(tmp_path / "t2"), str(tmp_path / "ck2"),
                        n_buckets=2, text_mode="none", source_format="csv")
    pipe2.run_stream(max_files_per_trigger=1)
    got2 = {(r["conv_id"], r["text"]) for r in read_transcripts(spark, pipe2.table).collect()}
    assert got2 == got


def test_fused_normalize_equals_two_frame_form(spark, tmp_path):
    """r6 single-scan normalize: the fused frame (upserts + inline
    tombstone rows, _op ∈ u/p/d) must be row-for-row identical to the
    legacy two-frame form unioned through apply_cdc_batch's tombstone
    shaping — across text modes and the edge cases (duplicate deletes,
    empty turn arrays dropping, a delete that still carries turns)."""
    from pyspark.sql import functions as F

    from hierarchical_to_relational_spark.operators.merge import (
        apply_cdc_batch,
        read_transcripts,
        table_schema_for,
    )
    from hierarchical_to_relational_spark.operators.normalize import (
        META_LSN,
        META_OP,
        META_TS,
        normalize_envelopes,
        normalize_envelopes_fused,
        turn_fields,
    )
    from hierarchical_to_relational_spark.table.snapshot_table import SnapshotTable
    from pyspark.sql import types as T

    env = _env_rows(spark, [
        (1, "insert", "cA", [(0, "user", "  hello\t world ", None),
                             (1, "assistant", "hi", "bash")]),
        (2, "patch", "cA", [(0, None, "h\x01i", None)]),
        (3, "delete", "cB", None),
        (4, "delete", "cB", None),                  # duplicate delete
        (5, "insert", "cC", []),                    # empty turns → drops
        (6, "update", "cC", [(0, "user", None, None)]),
        (7, "delete", "cA", [(0, "x", "y", "z")]),  # delete carrying turns
    ])
    for mode in ("none", "builtin", "arrow"):
        ups, dels = normalize_envelopes(env, text_mode=mode)
        types = {f.name: f.dataType for f in ups.schema.fields}
        tomb = dels.select(
            "conv_id",
            *[F.lit(None).cast(types[c]).alias(c) for c in ups.columns
              if c not in ("conv_id", META_LSN, META_TS, META_OP)],
            F.col(META_LSN),
            F.lit(None).cast("timestamp").alias(META_TS),
            F.lit("d").alias(META_OP),
        ).select(*ups.columns)
        legacy = ups.unionByName(tomb)
        fused = normalize_envelopes_fused(env, text_mode=mode)
        assert fused.exceptAll(legacy).count() == 0, mode
        assert legacy.exceptAll(fused).count() == 0, mode

    # end-to-end: two tables, one applied two-frame, one fused — the
    # stored state must be frame-equal
    base_cols = [T.StructField("conv_id", T.StringType(), False)] + turn_fields(env)
    t_leg = SnapshotTable.create(str(tmp_path / "legacy"),
                                 table_schema_for(base_cols), n_buckets=4)
    t_fus = SnapshotTable.create(str(tmp_path / "fused"),
                                 table_schema_for(base_cols), n_buckets=4)
    ups, dels = normalize_envelopes(env, text_mode="none")
    apply_cdc_batch(spark, t_leg, ups, dels, batch_id="b0")
    apply_cdc_batch(spark, t_fus, normalize_envelopes_fused(env, text_mode="none"),
                    None, batch_id="b0")
    a = read_transcripts(spark, t_leg)
    b = read_transcripts(spark, t_fus)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
