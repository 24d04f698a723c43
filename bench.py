"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the engine's
primary metric — CDC apply throughput (change-events/sec) replaying a
deterministic synthetic binlog through the full pipeline
(normalize → LWW merge → idempotent snapshot commits).

Prints ONE JSON line:
  {"metric": "...", "value": <total headline seconds>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "cdc_events": N, "cdc_seconds": s, "cdc_events_per_sec": r}

Env knobs:
  SPARK_GRAFT_SF_DIR   sf directory (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[] parallelism (default 32)
  BENCH_CDC_EVENTS     logical binlog events (default 200000)
  BENCH_CDC_BATCHES    replay micro-batches (default 8)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as E
from hierarchical_to_relational_spark import datagen
from hierarchical_to_relational_spark.session import get_spark
from hierarchical_to_relational_spark.streaming.driver import CdcPipeline

HEADLINE = [
    "flatten_hier",
    "lww_latest",
    "merge_upsert",
    "normalize_roundtrip",
    "agg_pricing",
    "returned_items",
    "join_region_revenue",
    "window_top_orders",
    "sessionize",
    "asof_state",
    "interval_join",
    "minhash_lsh_docs",
    "simhash_docs",
    "simhash_docs_fast",
    "text_profile_docs",
    "text_profile_docs_fast",
    "ann_topk",
    "ann_ivf_topk",
    "ann_ivf_topk_arrow",
    "ann_lsh_topk",
    "merge_patch",
]

# The ann contract queries wrap the operator in a correctness harness
# (brute-force ground truth + recall/exactness checks) for the driver's
# oracle gate; the bench measures the PURE operator at the same settings
# so per-query times stay comparable round-over-round.
#
# Scale note: at sf0.1 the embeddings corpus is 2,000 × dim-64 vectors, so
# ivf_topk's wall time here is ~4 sequential tiny Spark jobs' driver
# constants (sample collect + two broadcast materializations + the main
# job), not compute — measured: the whole corpus is ~1 MB. The knob that
# matters at 10^10 scale is the assign="arrow" map-only path (zero corpus
# shuffle), which is also timed.
def _pure_ops():
    from pyspark.sql import functions as F
    from hierarchical_to_relational_spark.operators import dedup as dd
    from hierarchical_to_relational_spark.operators import similarity as sim
    from hierarchical_to_relational_spark.operators import text as tx

    # The _fast contract queries wrap the operator in a dup-consistency /
    # shape harness (full-width join + window over md5(text)) that
    # DOMINATES the wall time at bench scale — r3 measured the "~10x
    # cheaper" xxhash64 simhash slower than its md5 twin purely because of
    # the harness. Bench the bare operators so the md5-vs-xxhash64 design
    # claim is what actually gets measured.
    def simhash_fast(spark, sf_dir):
        docs = E._spread(E._t(spark, sf_dir, "documents"), spark)
        return dd.simhash_fingerprint(docs, "doc_id", "text", hash_fn="xxhash64")

    def profile_fast(spark, sf_dir):
        docs = E._spread(E._t(spark, sf_dir, "documents").select("doc_id", "text"), spark)
        return tx.profile_documents(docs)  # default = xxhash64 fingerprint

    def ivf(spark, sf_dir):
        emb = E._t(spark, sf_dir, "embeddings")
        q = emb.where(F.col("vec_id") < 5)
        return sim.ivf_topk(q, emb, k=10, n_cells=16, n_probe=6)

    def ivf_arrow(spark, sf_dir):
        emb = E._t(spark, sf_dir, "embeddings")
        q = emb.where(F.col("vec_id") < 5)
        return sim.ivf_topk(q, emb, k=10, n_cells=16, n_probe=6, assign="arrow")

    def lsh(spark, sf_dir):
        emb = E._t(spark, sf_dir, "embeddings")
        q = emb.where(F.col("vec_id") < 5)
        return sim.lsh_topk(q, emb, k=10, n_planes=4, probe_hamming=1)

    return {"ann_ivf_topk": ivf, "ann_ivf_topk_arrow": ivf_arrow, "ann_lsh_topk": lsh,
            "simhash_docs_fast": simhash_fast, "text_profile_docs_fast": profile_fast}

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")


def _binlog_dir(n_events: int, n_convs: int, seed: int = 42) -> tuple[str, int]:
    """Deterministic cached binlog (vectorized generator); returns
    (dir, physical event count)."""
    key = f"binlog-v2-{n_events}-{n_convs}-{seed}"
    d = os.path.join(CACHE, key)
    meta = os.path.join(d, "_meta.json")
    if os.path.exists(meta):
        with open(meta) as f:
            return d, json.load(f)["physical_events"]
    spec = datagen.BinlogSpec(
        n_events=n_events, n_convs=n_convs, seed=seed, max_turns_per_event=6, zipf_a=1.2
    )
    if os.path.exists(d):
        shutil.rmtree(d)
    _, physical = datagen.generate_binlog_fast(spec, d, n_segments=256)
    with open(meta, "w") as f:
        json.dump({"physical_events": physical}, f)
    return d, physical


def bench_cdc(spark, n_events: int, n_batches: int, work_dir: str) -> dict:
    binlog, physical = _binlog_dir(n_events, max(n_events // 100, 10))
    segs = sorted(
        os.path.join(binlog, p) for p in os.listdir(binlog) if p.endswith(".parquet")
    )
    # untimed warmup into a throwaway table: JIT/codegen compile + page
    # cache (a production replay amortizes this over hours; steady-state
    # throughput is the metric). Two FULL-SIZED batches — a single tiny
    # segment leaves the JIT cold and the first timed batches run 2-3x
    # slower than steady state (measured round 2).
    warm = CdcPipeline(spark, binlog, os.path.join(work_dir, "warm-t"),
                       os.path.join(work_dir, "warm-ck"), n_buckets=32, text_mode=os.environ.get("BENCH_TEXT_MODE", "arrow"))
    per_warm = max(len(segs) // n_batches, 1)
    warm.replay_batch(segs[:per_warm], "warmup-1")
    warm.replay_batch(segs[per_warm: 2 * per_warm], "warmup-2")

    pipe = CdcPipeline(
        spark,
        binlog,
        os.path.join(work_dir, "transcripts"),
        os.path.join(work_dir, "ck"),
        n_buckets=32,
        text_mode=os.environ.get("BENCH_TEXT_MODE", "arrow"),
    )
    per = max(len(segs) // n_batches, 1)
    t0 = time.monotonic()
    for b in range(0, len(segs), per):
        pipe.replay_batch(segs[b : b + per], f"bench-{b}")
    dt = time.monotonic() - t0

    # point-lookup latency on the replayed table (bucket pruning + file
    # min-max sidecar + bloom row-group skipping): compact to a
    # range-clustered base, stack one delta on top, then time
    # lookup_conversation — the r3 headline scale feature. min-of-2.
    from pyspark.sql import functions as F
    from hierarchical_to_relational_spark.operators.merge import (
        compact, lookup_conversation, lookup_conversations,
    )

    compact(spark, pipe.table, batch_id="bench-compact")
    pipe.replay_batch(segs[:1], "bench-post-compact-delta")
    convs = [r[0] for r in pipe.table.read(spark).where(
        F.col("conv_id").isNotNull()
    ).select("conv_id").distinct().limit(100).collect()]
    lk = lk100 = None
    for _ in range(2):
        t1 = time.monotonic()
        lookup_conversation(spark, pipe.table, convs[0]).collect()
        lk = min(lk or 9e9, time.monotonic() - t1)
        t1 = time.monotonic()
        lookup_conversations(spark, pipe.table, convs).collect()
        lk100 = min(lk100 or 9e9, time.monotonic() - t1)
    return {
        "cdc_events": physical,
        "cdc_seconds": round(dt, 3),
        "cdc_events_per_sec": round(physical / dt, 1),
        "cdc_point_lookup_seconds": round(lk, 3),
        # batched amortization: 100 keys in ONE plan (driver-side bucket
        # hashing + per-key sidecar file pruning) vs 100 sequential lookups
        "cdc_lookup100_seconds": round(lk100, 3),
        "cdc_lookup100_per_key_seconds": round(lk100 / len(convs), 4),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_events = int(os.environ.get("BENCH_CDC_EVENTS", "2000000"))
    n_batches = int(os.environ.get("BENCH_CDC_BATCHES", "8"))
    spark = get_spark(app_name="h2r-bench", master=f"local[{cpus}]")

    queries = {**E.queries(), **_pure_ops()}
    timings: dict[str, float] = {}
    headline = [] if os.environ.get("BENCH_CDC_ONLY") else HEADLINE
    passes = max(1, int(os.environ.get("BENCH_QUERY_PASSES", "2")))
    for name in headline:
        best = None
        for _ in range(passes):
            # fresh plan per pass (no cached DataFrame state); min-of-N
            # because this host's CPU steal swings single-shot timings 3-5x
            df = queries[name](spark, sf_dir)
            t0 = time.monotonic()
            # noop sink forces full materialization of every column
            df.write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    import tempfile

    work = tempfile.mkdtemp(prefix="h2r-bench-")
    cdc = bench_cdc(spark, n_events, n_batches, work)
    shutil.rmtree(work, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    out = {
        "metric": f"headline suite wall time ({len(timings)} queries) + CDC apply throughput",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": int(cpus),
        **cdc,
    }
    out.update(_pinned_pass())
    print(json.dumps(out))


def _pinned_pass() -> dict:
    """Round-5 protocol unification: re-run the suite once PINNED
    (taskset, fresh JVM, fixed core set) so BENCH_rN carries timings under
    the same noise-controlled protocol BENCH/BASELINE.md uses — unpinned
    local[32] numbers on this host swing with CPU steal and JVM helper
    threads borrowing cores, which made round-over-round per-query deltas
    a host-lottery read (VERDICT r4). Skipped inside the pinned child
    (BENCH_PINNED_PASS), when taskset is missing, or when BENCH_PINNED=0."""
    if (os.environ.get("BENCH_PINNED_PASS") or os.environ.get("BENCH_PINNED") == "0"
            or os.environ.get("BENCH_CDC_ONLY")):  # scaling_bench pins its own cores
        return {}
    if shutil.which("taskset") is None or os.cpu_count() is None or os.cpu_count() < 16:
        return {}
    import subprocess

    env = dict(os.environ, BENCH_PINNED_PASS="1", SPARK_GRAFT_CPUS="16")
    try:
        res = subprocess.run(
            ["taskset", "-c", "0-15", sys.executable,
             os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=1500,
        )
        line = res.stdout.strip().splitlines()[-1]
        p = json.loads(line)
    except Exception as e:  # the pinned pass is evidence, not a gate
        return {"pinned_error": str(e)[:200]}
    return {"pinned": {
        "cpus": 16, "taskset": "0-15",
        "queries": p.get("queries", {}),
        "value": p.get("value"),
        "cdc_events_per_sec": p.get("cdc_events_per_sec"),
        "cdc_lookup100_per_key_seconds": p.get("cdc_lookup100_per_key_seconds"),
    }}


if __name__ == "__main__":
    main()
