"""applyInPandasWithState operator: state persists across micro-batches and
final per-conversation totals equal the batch computation."""

from __future__ import annotations

from pyspark.sql import functions as F

from hierarchical_to_relational_spark import datagen
from hierarchical_to_relational_spark.sources.binlog import envelope_schema, stream_binlog
from hierarchical_to_relational_spark.streaming.stateful import conversation_progress

SPEC = datagen.BinlogSpec(n_events=150, n_convs=8, seed=44)


def test_conversation_progress_stateful(spark, tmp_path):
    d = str(tmp_path / "bl")
    events = datagen.generate_events(SPEC)
    datagen.write_binlog(datagen.arrival_order(events, SPEC), d, n_segments=4)

    stream = stream_binlog(spark, d, max_files_per_trigger=1)  # 4 micro-batches
    q = (
        conversation_progress(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("conv_progress")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # memory sink in update mode appends every update; last row per conv is
    # the final state
    rows = spark.sql("SELECT * FROM conv_progress").collect()
    final = {}
    for r in rows:  # later updates have monotonically increasing n_events
        cur = final.get(r["conv_id"])
        if cur is None or r["n_events"] >= cur["n_events"]:
            final[r["conv_id"]] = r

    env = spark.read.schema(envelope_schema()).parquet(d)
    want = {
        r["conv_id"]: r
        for r in env.groupBy("conv_id")
        .agg(
            F.max("lsn").alias("max_lsn"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.coalesce(F.size("payload.turns"), F.lit(0))).alias("n_turns"),
            F.sum(F.when(F.col("op") == "delete", 1).otherwise(0)).alias("n_deletes"),
        )
        .collect()
    }
    assert set(final) == set(want)
    for cid, w in want.items():
        g = final[cid]
        assert (g["max_lsn"], g["n_events"], g["n_turns"], g["n_deletes"]) == (
            w["max_lsn"], w["n_events"], w["n_turns"], w["n_deletes"]
        ), cid
    # state genuinely crossed micro-batch boundaries: some conversation was
    # updated in more than one batch
    from collections import Counter
    upd_counts = Counter(r["conv_id"] for r in rows)
    assert max(upd_counts.values()) > 1
