"""Inter-PROCESS concurrency: two independent spark-submit-equivalent
ingest processes (separate JVMs, separate Python interpreters) race on one
table through the filesystem-level commit protocol. Complements the
in-process threaded soak — this exercises O_EXCL snapshot creation, the
v0 create race, and append/compaction interleaving with no shared state."""

from __future__ import annotations

import json
import subprocess
import sys

import pandas as pd

from hierarchical_to_relational_spark import datagen
from hierarchical_to_relational_spark.operators.merge import read_transcripts
from hierarchical_to_relational_spark.table.snapshot_table import SnapshotTable

RUNNER = r"""
import json, sys
sys.path.insert(0, "/root/repo")
from hierarchical_to_relational_spark.session import get_spark
from hierarchical_to_relational_spark.streaming.driver import CdcPipeline

shard, binlog, table, ck = sys.argv[1:5]
spark = get_spark(app_name=f"writer-{shard}", master="local[2]", shuffle_partitions=4)
spark.sparkContext.setLogLevel("ERROR")
pipe = CdcPipeline(spark, binlog, table, ck, n_buckets=4, text_mode="none",
                   compact_every=3)
env = spark.read.schema(pipe.envelope_schema).parquet(binlog)
rows = env.collect()
per = max(1, len(rows) // 6)
committed = []
for i in range(-(-len(rows) // per)):
    m = pipe.apply_batch(spark.createDataFrame(rows[i*per:(i+1)*per], pipe.envelope_schema),
                         f"{shard}-{i}")
    committed.append(bool(m["committed"]))
print(json.dumps({"shard": shard, "committed": committed}))
spark.stop()
"""


def test_two_processes_race_one_table(spark, tmp_path):
    events = {}
    procs = []
    for k, seed in (("a", 61), ("b", 62)):
        spec = datagen.BinlogSpec(n_events=200, n_convs=8, seed=seed)
        ev = datagen.generate_events(spec)
        ev["conv_id"] = k + ev["conv_id"]
        if k == "b":
            ev["lsn"] = ev["lsn"] + 1_000_000
        events[k] = ev
        binlog = str(tmp_path / f"binlog-{k}")
        datagen.write_binlog(datagen.arrival_order(ev, spec), binlog, n_segments=1)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", RUNNER, k, binlog,
             str(tmp_path / "t"), str(tmp_path / f"ck-{k}")],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))

    results = {}
    for p in procs:
        out, err = p.communicate(timeout=540)
        assert p.returncode == 0, err[-2000:]
        r = json.loads(out.strip().splitlines()[-1])
        results[r["shard"]] = r["committed"]
    assert all(all(c) for c in results.values()), results  # no batch dropped

    got = (read_transcripts(spark, SnapshotTable(str(tmp_path / "t")))
           .orderBy("conv_id", "turn_idx").toPandas().reset_index(drop=True))
    want = (pd.concat([datagen.expected_state(events["a"]),
                       datagen.expected_state(events["b"])])
            .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got.astype({"turn_idx": "int64"}),
                                  want.astype({"turn_idx": "int64"}), check_dtype=False)
