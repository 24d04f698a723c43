"""Structured Streaming event-time operators (SURVEY.md §2.2 streaming
row): watermarked tumbling-window aggregation over the binlog stream, and a
JSON-segment source. These complement the engine's primary lateness
strategy (order-insensitive LWW in the merge) with classic event-time
windowing for monitoring-style aggregates."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from hierarchical_to_relational_spark import datagen
from hierarchical_to_relational_spark.operators.merge import read_transcripts
from hierarchical_to_relational_spark.sources.binlog import stream_binlog
from hierarchical_to_relational_spark.streaming.driver import CdcPipeline

SPEC = datagen.BinlogSpec(n_events=200, n_convs=10, seed=33)


def test_watermarked_tumbling_window_counts(spark, tmp_path):
    """readStream → withWatermark → window().count() → memory sink:
    per-minute change-event counts by op, equal to the batch computation."""
    d = str(tmp_path / "bl")
    events = datagen.generate_events(SPEC)
    datagen.write_binlog(datagen.arrival_order(events, SPEC), d, n_segments=4)

    stream = stream_binlog(spark, d, max_files_per_trigger=2)
    agg = (
        stream.withWatermark("commit_ts", "10 minutes")
        .groupBy(F.window("commit_ts", "1 minute").alias("w"), "op")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_counts")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["w"]["start"], r["op"]): r["n"]
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    env = spark.read.schema(stream.schema).parquet(d)
    want = {
        (r["w"]["start"], r["op"]): r["n"]
        for r in env.groupBy(F.window("commit_ts", "1 minute").alias("w"), "op")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want and len(got) > 0


def test_json_binlog_source(spark, tmp_path):
    """A JSON-segment WAL (Debezium-file-sink shape) ingests identically."""
    pq_dir, js_dir = str(tmp_path / "pq"), str(tmp_path / "js")
    events = datagen.generate_events(SPEC)
    datagen.write_binlog(datagen.arrival_order(events, SPEC), pq_dir, n_segments=2)
    env = spark.read.schema(stream_binlog(spark, pq_dir).schema).parquet(pq_dir)
    env.coalesce(1).write.json(js_dir)

    pipe = CdcPipeline(spark, js_dir, str(tmp_path / "t"), str(tmp_path / "ck"),
                       n_buckets=4, text_mode="none", source_format="json")
    pipe.run_stream(max_files_per_trigger=4)
    got = (
        read_transcripts(spark, pipe.table)
        .orderBy("conv_id", "turn_idx").toPandas().reset_index(drop=True)
    )
    want = datagen.expected_state(events)
    pd.testing.assert_frame_equal(
        got.astype({"turn_idx": "int64"}), want.astype({"turn_idx": "int64"}), check_dtype=False
    )


def test_watermarked_sliding_window_counts(spark, tmp_path):
    """Sliding event-time window (2 min length, 1 min slide) over the
    stream equals the batch computation — each event lands in 2 windows."""
    d = str(tmp_path / "bl-slide")
    events = datagen.generate_events(SPEC)
    datagen.write_binlog(datagen.arrival_order(events, SPEC), d, n_segments=4)

    stream = stream_binlog(spark, d, max_files_per_trigger=2)
    agg = (
        stream.withWatermark("commit_ts", "10 minutes")
        .groupBy(F.window("commit_ts", "2 minutes", "1 minute").alias("w"))
        .count()
    )
    q = (agg.writeStream.format("memory").queryName("slide_counts")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()

    got = {(r["w"]["start"], r["count"]) for r in spark.table("slide_counts").collect()}
    env = spark.read.parquet(d)
    want = {(r["w"]["start"], r["count"]) for r in
            env.groupBy(F.window("commit_ts", "2 minutes", "1 minute").alias("w"))
            .count().collect()}
    assert got == want and len(got) > 2
    # sliding: total window-event memberships = 2x event count
    assert sum(c for _, c in got) == 2 * env.count()


def test_watermarked_session_window_per_conversation(spark, tmp_path):
    """session_window (30s gap) per conv_id over the stream equals the
    batch computation — native event-time sessionization (complements the
    batch lag/cumsum sessionize contract query)."""
    d = str(tmp_path / "bl-sess")
    events = datagen.generate_events(SPEC)
    datagen.write_binlog(datagen.arrival_order(events, SPEC), d, n_segments=4)

    stream = stream_binlog(spark, d, max_files_per_trigger=2)
    agg = (
        stream.withWatermark("commit_ts", "10 minutes")
        .groupBy(F.session_window("commit_ts", "30 seconds").alias("s"), "conv_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (agg.writeStream.format("memory").queryName("sess_counts")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()

    got = {(r["conv_id"], r["s"]["start"], r["n"])
           for r in spark.table("sess_counts").collect()}
    env = spark.read.parquet(d)
    want = {(r["conv_id"], r["s"]["start"], r["n"]) for r in
            env.groupBy(F.session_window("commit_ts", "30 seconds").alias("s"), "conv_id")
            .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == want and len(got) >= SPEC.n_convs


def test_stream_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: in-stream dedup of replayed envelopes
    by (lsn) with bounded state — the streaming-native complement to the
    merge layer's order-insensitive LWW (which is the engine's primary
    duplicate defence). Output count equals distinct-lsn count."""
    d = str(tmp_path / "bl-dedup")
    events = datagen.generate_events(SPEC)
    stream_rows = datagen.arrival_order(events, SPEC)  # 5% duplicate events
    datagen.write_binlog(stream_rows, d, n_segments=4)

    stream = stream_binlog(spark, d, max_files_per_trigger=2)
    deduped = (
        stream.withWatermark("commit_ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["lsn"])
    )
    q = (deduped.writeStream.format("memory").queryName("dedup_stream")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()

    got = spark.table("dedup_stream").count()
    want = spark.read.parquet(d).select("lsn").distinct().count()
    assert len(stream_rows) > want  # duplicates existed in the input
    assert got == want
