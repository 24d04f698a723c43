"""Key-partitioned MERGE: last-write-wins upsert + whole-key tombstone
deletes into a SnapshotTable, in two physical strategies:

- **copy-on-write** (``mode="cow"``): read affected buckets, resolve, and
  rewrite them per batch — reads stay resolution-free, but a batch touching
  every bucket rewrites the whole table (Iceberg CoW MERGE shape).
- **merge-on-read** (``mode="mor"``): append the batch as per-bucket delta
  files — O(batch) write cost independent of table size; readers resolve
  LWW over base+deltas; ``compact`` folds deltas down copy-on-write style.
  At 10^10-event scale with hot conversations spread across all buckets,
  this is the strategy that keeps apply throughput linear (the Iceberg MoR
  MERGE shape); compaction cost is amortized over many batches.

Resolution itself generalizes the reference's dedup idiom — its
groupBy(parent, child, level) + max/first aggregation
(HierarchyFlattener.java:322-342) — into the CDC core: group on the primary
key, keep the row with the maximum ``(lsn, commit_ts)`` via ``max_by`` (hash
aggregation: map-side partial combine makes it skew-tolerant, no sort,
unlike a row_number window). Resolution is order-insensitive and
idempotent: replaying events in any order, with duplicates, in any
batching, converges to the same final state — this is how out-of-order and
late binlog data is handled without event-time watermarks (SURVEY.md §2.2).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from hierarchical_to_relational_spark.operators.normalize import META_BUCKET, META_LSN, META_OP, META_TS
from hierarchical_to_relational_spark.table.snapshot_table import (
    ConcurrentOverwriteError,
    SnapshotTable,
)


def lww_latest(df: DataFrame, keys: list[str], order_cols: list[str]) -> DataFrame:
    """Keep, per key, the row with the maximum (order_cols) — via
    ``max_by(struct(payload), struct(order))`` two-phase aggregation.

    Preferred over ``row_number() OVER (PARTITION BY keys ORDER BY ...)``
    at scale because of the map-side partial combine: hot keys collapse
    BEFORE the exchange, so only one partial row per (key, input partition)
    shuffles — a window shuffles every input row and has no combine.
    (Spark physically plans the struct-buffered max_by as SortAggregate;
    the partial/final split is what matters.)
    """
    payload = [c for c in df.columns if c not in keys]
    packed = df.groupBy(*keys).agg(
        F.max_by(F.struct(*payload), F.struct(*order_cols)).alias("_r")
    )
    return packed.select(*keys, *[F.col(f"_r.{c}").alias(c) for c in payload])


def merge_lww(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    order_cols: list[str],
) -> DataFrame:
    """Standalone relational MERGE (no table layer): rows from source
    replace target rows with the same key iff their order columns are
    higher. Both inputs must share a schema containing keys + order_cols."""
    return lww_latest(target.unionByName(source, allowMissingColumns=True), keys, order_cols)


def table_schema_for(upsert_cols: list[T.StructField]) -> T.StructType:
    """Target physical schema = user columns + merge metadata
    (_lsn, _commit_ts, _op)."""
    fields = list(upsert_cols)
    fields += [
        T.StructField(META_LSN, T.LongType(), False),
        T.StructField(META_TS, T.TimestampType(), True),
        T.StructField(META_OP, T.StringType(), False),
    ]
    return T.StructType(fields)


def _tombstone_rows(deletes_b: DataFrame, schema: T.StructType) -> DataFrame:
    """(bucket, conv_id, _lsn) delete watermarks → storable tombstone rows
    (null payload, _op='d') matching the table schema. One select — a
    withColumn per field would re-run Catalyst analysis per column
    (measured tens of ms of per-batch driver constant)."""
    cols = [F.col(META_BUCKET)]
    for fld in schema.fields:
        if fld.name in ("conv_id", META_LSN):
            cols.append(F.col(fld.name))
        elif fld.name == META_OP:
            cols.append(F.lit("d").alias(META_OP))
        else:
            cols.append(F.lit(None).cast(fld.dataType).alias(fld.name))
    return deletes_b.select(*cols)


def resolve(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Collapse any pile of full-upsert rows (_op='u'), partial-upsert rows
    (_op='p', merge-patch: null column = keep previous) and tombstone rows
    (_op='d') to the canonical STORED state:

    - latest full upsert per (conv_id, turn_idx) — whole-row LWW;
    - every patch row NEWER than that full row, kept AS ROWS. Folding a
      patch into the full row would stamp its columns with one LSN and
      lose per-column provenance — a later-arriving patch with an
      in-between LSN would then resolve wrongly. Keeping (latest full +
      newer patches) is a join-semilattice: dominated patches (≤ the
      latest full, which resets every column) can never matter again, so
      dropping them is safe in ANY replay order;
    - one tombstone row per deleted conversation (kept to kill late
      arrivals); upserts AND patches below the delete LSN die.

    Idempotent and order-insensitive: resolve(resolve(x) ∪ y) ==
    resolve(x ∪ y). The per-column fold for USER-facing reads is
    ``collapse_patches``; ``compact(squash_patches_below=...)`` bounds the
    retained patch set under a binlog-retention watermark."""
    tomb = (
        df.where(F.col(META_OP) == "d")
        .groupBy(META_BUCKET, "conv_id")
        .agg(F.max(META_LSN).alias("_del_lsn"))
    )
    keys = [META_BUCKET, "conv_id", "turn_idx"]
    fulls = lww_latest(df.where(F.col(META_OP) == "u"), keys, [META_LSN, META_TS])
    # duplicate patch rows are verbatim re-emits (same key+LSN) → collapse
    patches = df.where(F.col(META_OP) == "p").dropDuplicates(keys + [META_LSN])
    live_patches = (
        patches.join(
            fulls.select(*keys, F.col(META_LSN).alias("_full_lsn")), keys, "left"
        )
        .where(F.col("_full_lsn").isNull() | (F.col(META_LSN) > F.col("_full_lsn")))
        .drop("_full_lsn")
    )
    ups = fulls.unionByName(live_patches.select(*fulls.columns))
    live = (
        ups.join(tomb, [META_BUCKET, "conv_id"], "left")
        .where(F.col("_del_lsn").isNull() | (F.col(META_LSN) > F.col("_del_lsn")))
        .drop("_del_lsn")
        .select(META_BUCKET, *schema.fieldNames())
    )
    tomb_rows = _tombstone_rows(tomb.withColumnRenamed("_del_lsn", META_LSN), schema)
    return live.unionByName(tomb_rows)


def collapse_patches(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Per-column LWW fold of resolved rows into ONE materialized row per
    (conv_id, turn_idx): each user column takes its value from the newest
    row that SET it — a full row ('u') sets every column (including to
    null), a patch row ('p') sets only its non-null columns. One hash
    aggregation (``max_by ... FILTER``, map-side combinable — no window);
    output rows carry _op='u' and _lsn/_commit_ts of the newest
    contributing row, so the fold composes with resolve. Tombstone rows
    must be excluded by the caller."""
    keys = [META_BUCKET, "conv_id", "turn_idx"]
    order = f"struct(`{META_LSN}`, `{META_TS}`)"
    folded_cols = [
        c for c in schema.fieldNames() if c not in keys and c not in (META_OP,)
    ]
    aggs = []
    for c in folded_cols:
        if c in (META_LSN, META_TS):
            aggs.append(F.expr(f"max_by(`{c}`, {order})").alias(c))
        else:
            aggs.append(
                F.expr(
                    f"max_by(`{c}`, {order}) "
                    f"FILTER (WHERE `{META_OP}` = 'u' OR `{c}` IS NOT NULL)"
                ).alias(c)
            )
    out = df.groupBy(*keys).agg(*aggs).withColumn(META_OP, F.lit("u"))
    return out.select(META_BUCKET, *schema.fieldNames())


def apply_cdc_batch(
    spark: SparkSession,
    table: SnapshotTable,
    upserts: DataFrame,
    deletes: DataFrame | None,
    batch_id: str,
    mode: str = "mor",
    collect_stats: bool = True,
) -> dict:
    """Apply one normalized change batch to the table, exactly-once.

    upserts: conv_id, <turn columns...>, _lsn, _commit_ts  (from normalize)
    deletes: conv_id, _lsn — one row per delete event; or ``None`` when
             ``upserts`` is the FUSED frame from
             ``normalize_envelopes_fused`` (r6): its _op='d' rows already
             carry the tombstone shape (null payload/_commit_ts), so the
             whole batch is one projection over one scan — no union of a
             second delete-leg scan of the same source.

    Widens the target schema first if the batch is additively wider; the
    commit (append or bucket-rewrite per ``mode``) is idempotent on
    ``batch_id``.
    """
    t0 = time.monotonic()
    schema = table.schema()

    # --- schema evolution (widen target before merge): additive new
    # columns AND lossless type widenings (int→long, float→double,
    # decimal precision up — real CDC feeds widen types routinely).
    # Metadata-only commit; old files are cast up at read. The check is
    # pure driver-side dict comparison — no Spark job, and the ::evolve
    # commit only happens when something actually changed.
    from hierarchical_to_relational_spark.table.snapshot_table import (
        _cast_equivalent,
        _widens,
    )

    have = {f.name: f.dataType for f in schema.fields}
    incoming = [f for f in upserts.schema.fields if f.name not in (META_LSN, META_TS, META_OP)]
    changed = False
    for f in incoming:
        cur = have.get(f.name)
        if cur is None or _widens(cur, f.dataType):
            changed = True
        elif (cur != f.dataType and not _widens(f.dataType, cur)
              and not _cast_equivalent(f.dataType, cur)):
            raise ValueError(
                f"incompatible type change for {f.name!r}: "
                f"{cur.simpleString()} -> {f.dataType.simpleString()}"
            )
    if changed:
        inc_by = {f.name: f for f in incoming}
        target = T.StructType(
            [
                T.StructField(f.name, inc_by[f.name].dataType, f.nullable)
                if f.name in inc_by and _widens(f.dataType, inc_by[f.name].dataType)
                else f
                for f in schema.fields
            ]
            + [T.StructField(f.name, f.dataType, True) for f in incoming if f.name not in have]
        )
        table.evolve_to(target, batch_id=f"{batch_id}::evolve")
        schema = table.schema()

    # single select (not chained withColumn — each one re-runs Catalyst
    # analysis and the sum is real per-micro-batch driver constant)
    bucket_of = table.bucket_col()
    have_cols = set(upserts.columns)
    ups_cols = [bucket_of(F.col("conv_id")).alias(META_BUCKET)]
    for fld in schema.fields:
        if fld.name in have_cols:
            # cast to the (possibly wider) table type; no-op casts fold away
            ups_cols.append(F.col(fld.name).cast(fld.dataType).alias(fld.name))
        elif fld.name == META_OP:  # pre-patch callers: everything full-row
            ups_cols.append(F.lit("u").alias(META_OP))
        else:  # older-schema batches: null-fill evolved cols
            ups_cols.append(F.lit(None).cast(fld.dataType).alias(fld.name))
    ups = upserts.select(*ups_cols)
    if deletes is None:
        batch = ups  # fused frame: tombstone rows are already inline
    else:
        dels = deletes.withColumn(META_BUCKET, bucket_of(F.col("conv_id")))
        batch = ups.unionByName(_tombstone_rows(dels, schema))

    # stats (rows, max applied LSN, tombstone/upsert counts) come from the
    # written files' parquet footers — no extra Spark job (collect_stats
    # retained in the signature for compatibility; footer stats are free)
    del collect_stats
    if mode == "mor":
        committed = table.commit_append(batch, batch_id=batch_id)
        buckets: list[int] = []
    elif mode == "cow":
        batch = batch.persist()
        buckets = sorted(r[0] for r in batch.select(META_BUCKET).distinct().collect())
        if buckets:
            committed = _overwrite_resolved(
                spark, table, schema, buckets, batch_id,
                lambda current: resolve(batch.unionByName(current, allowMissingColumns=True), schema),
            )
        else:
            committed = False
        batch.unpersist()
    else:
        raise ValueError(f"unknown merge mode {mode!r}")

    stats = (
        table.last_commit_stats
        if committed and getattr(table, "last_commit_stats", None)
        else {"rows_written": None, "upserts": None, "deletes": None, "max_lsn": None,
              "bucket_max_lsn": {}}
    )
    return {
        "batch_id": batch_id,
        "mode": mode,
        "committed": committed,
        "buckets": buckets,
        "duration_s": time.monotonic() - t0,
        **stats,
    }


def _overwrite_resolved(
    spark: SparkSession,
    table: SnapshotTable,
    schema: T.StructType,
    buckets: list[int],
    batch_id: str,
    resolve_fn,
    retries: int = 5,
    cluster_by: str | None = None,
    kind: str = "overwrite",
) -> bool:
    """Copy-on-write commit loop with concurrent-writer validation: read the
    listed buckets AT a pinned version, resolve via ``resolve_fn(current)``,
    and commit against that base version. Deltas appended meanwhile are
    merged into the new live entry by the table; a racing OVERWRITE raises
    ``ConcurrentOverwriteError`` and we re-read + re-resolve from the new
    state (the losing attempt's data files become unreferenced orphans)."""
    for _ in range(retries):
        base_v = table.current_version()
        current = table.read(spark, buckets=buckets, version=base_v)
        resolved = resolve_fn(current)
        try:
            return table.commit_overwrite_buckets(
                resolved, buckets, batch_id=batch_id, base_version=base_v,
                cluster_by=cluster_by, kind=kind,
            )
        except ConcurrentOverwriteError:
            continue
    raise ConcurrentOverwriteError(
        f"gave up overwriting buckets for {batch_id!r} after {retries} re-reads"
    )


def compact(
    spark: SparkSession,
    table: SnapshotTable,
    batch_id: str,
    expire_tombstones_below: int | None = None,
    squash_patches_below: int | None = None,
    zorder: list[str] | None = None,
    buckets: list[int] | None = None,
) -> bool:
    """Fold merge-on-read deltas down: read + resolve live buckets,
    rewrite copy-on-write. Amortized over many appends; idempotent on
    batch_id like any commit.

    ``buckets`` restricts the rewrite to a subset — PARTIAL compaction,
    the shape that matters at scale: zipf-hot buckets stack deltas far
    faster than cold ones, and folding every bucket on every trigger
    would be a full-table rewrite. ``compact_pressured`` picks the subset
    from manifest stats; default None folds everything (maintenance-job
    full compaction).

    ``expire_tombstones_below``: GC tombstone rows whose delete LSN is below
    this watermark — safe once the source guarantees no event with a lower
    LSN can still arrive (e.g. the binlog's retention horizon). Bounds the
    tombstone set over an unbounded stream; live rows are never touched.

    ``squash_patches_below``: fold patch rows with LSN below this watermark
    into their key's materialized full row (per-column LWW). Safe under the
    SAME retention contract — per-column provenance below the watermark can
    no longer matter because nothing older can arrive. Bounds the retained
    patch set for keys that receive patches forever without full rewrites.

    ``zorder``: cluster the rewrite by a Morton interleave of these columns
    instead of by ``conv_id`` alone (Delta/Iceberg OPTIMIZE ZORDER BY
    analog) — written files then carry tight-ish footer min-max bounds on
    EVERY listed column simultaneously, so the sidecar prunes point/range
    reads on any of them (e.g. ``["conv_id", "_lsn"]`` serves both key
    lookups and "changed since LSN" range scans from the same base)."""
    schema = table.schema()
    live_buckets = [int(b) for b in table.snapshot()["live"].keys()]
    if buckets is not None:
        live_buckets = sorted(set(buckets) & set(live_buckets))
    if not live_buckets:
        return False

    def resolve_fn(current: DataFrame) -> DataFrame:
        resolved = resolve(current, schema)
        if expire_tombstones_below is not None:
            resolved = resolved.where(
                (F.col(META_OP) != "d") | (F.col(META_LSN) >= F.lit(expire_tombstones_below))
            )
        if squash_patches_below is not None:
            is_young_patch = (F.col(META_OP) == "p") & (
                F.col(META_LSN) >= F.lit(squash_patches_below)
            )
            keep_raw = resolved.where((F.col(META_OP) == "d") | is_young_patch)
            foldable = resolved.where((F.col(META_OP) != "d") & ~is_young_patch)
            resolved = collapse_patches(foldable, schema).unionByName(keep_raw)
        return resolved

    # range-cluster the rewrite by conv_id: tight per-file key min-max →
    # point lookups prune to ~one file per bucket in the compacted base
    if zorder is not None:
        from hierarchical_to_relational_spark.functions.zorder import zorder_expr

        cluster = lambda out: zorder_expr(out, zorder)
    else:
        cluster = "conv_id"
    return _overwrite_resolved(
        spark, table, schema, live_buckets, batch_id, resolve_fn,
        cluster_by=cluster, kind="compact",
    )


def compact_pressured(
    spark: SparkSession,
    table: SnapshotTable,
    batch_id: str,
    depth_threshold: int,
    bytes_threshold: int | None = None,
    **compact_kwargs,
) -> list[int]:
    """Partial compaction driven by manifest pressure stats: fold ONLY the
    buckets whose delta stack is at least ``depth_threshold`` dirs deep
    (or ``bytes_threshold`` delta bytes heavy). Returns the buckets
    rewritten ([] = nothing exceeded a threshold). O(pressured buckets)
    rewrite cost instead of O(table) — on a zipf-skewed stream the hot
    buckets fold often while cold buckets keep shallow stacks untouched."""
    stats = table.delta_stats()
    pressured = sorted(
        b for b, s in stats.items()
        if s["depth"] >= depth_threshold
        or (bytes_threshold is not None and s["delta_bytes"] >= bytes_threshold)
    )
    if not pressured:
        return []
    compact(spark, table, batch_id=batch_id, buckets=pressured, **compact_kwargs)
    return pressured


def binpack_deltas(
    spark: SparkSession,
    table: SnapshotTable,
    batch_id: str,
    target_bytes: int = 64 << 20,
    min_dirs: int = 3,
    buckets: list[int] | None = None,
) -> list[int]:
    """Size-aware delta BIN-PACKING (round 5): per bucket, merge the
    smallest delta dirs below ``target_bytes`` into one packed dir —
    verbatim rows, no resolution shuffle, no base rewrite (see
    SnapshotTable.commit_binpack). This is the cheap first line of
    defense against the many-tiny-files problem a steady micro-batch
    stream creates: a real compaction folds state (resolve + rewrite of
    the whole bucket), bin-packing only reduces file/dir counts, so it
    can run far more often — the Iceberg rewrite_data_files bin-pack
    strategy vs its sort/cluster strategy, as two separate levers.

    Greedy per-bucket selection: smallest-first while the running sum
    stays under ``target_bytes`` (one packed output per bucket per call);
    buckets with fewer than ``min_dirs`` small dirs are left alone (the
    pack must actually reduce fan-in to pay for its write). Returns the
    buckets packed. Cold buckets — shallow stacks that never meet a
    compaction pressure threshold but accumulate dribble files forever —
    are exactly who this sweeps; schedule it wide (``buckets=None``) on a
    slow cadence beside pressure-driven partial compaction."""
    snap = table.snapshot()
    cb = snap.get("commit_bytes", {})
    want = None if buckets is None else {int(b) for b in buckets}
    picked: dict[str, list[str]] = {}
    for b, ds in snap["live"].items():
        if want is not None and int(b) not in want:
            continue
        sized = sorted(
            (cb.get(d, {}).get(b, 0), d) for d in ds
            if cb.get(d, {}).get(b) is not None and cb[d][b] < target_bytes
        )
        chosen, acc = [], 0
        for sz, d in sized:
            if acc + sz > target_bytes and chosen:
                break
            chosen.append(d)
            acc += sz
        if len(chosen) >= min_dirs:
            picked[b] = chosen
    if not picked:
        return []
    by_dir: dict[str, list[int]] = {}
    for b, ds in picked.items():
        for d in ds:
            by_dir.setdefault(d, []).append(int(b))
    parts = []
    for d, bs in sorted(by_dir.items()):
        df = spark.read.parquet(os.path.join(table.root, d))
        parts.append(df.where(F.col(META_BUCKET).isin(bs)))
    packed = parts[0]
    for p in parts[1:]:
        packed = packed.unionByName(p, allowMissingColumns=True)
    schema = table.schema()
    missing = [f for f in schema.fields if f.name not in packed.columns]
    if missing:  # dirs written before an additive evolution: null-fill
        packed = packed.select(
            "*", *[F.lit(None).cast(f.dataType).alias(f.name) for f in missing]
        )
    if table.commit_binpack(packed, picked, batch_id):
        return sorted(int(b) for b in picked)
    return []


def maintain_cycle(
    spark: SparkSession,
    table: SnapshotTable,
    batch_id: str,
    compact_depth: int = 16,
    compact_bytes: int | None = None,
    zorder: list[str] | None = None,
    expire_tombstones_below: int | None = None,
    binpack_target_bytes: int = 64 << 20,
    binpack_min_dirs: int = 3,
    expire_retain: int = 100,
    orphan_grace_seconds: float = 3600.0,
    expire_older_than_s: float | None = None,
) -> dict:
    """One scheduled maintenance pass combining the three background
    levers in their natural order (the single cadence policy a production
    stream runs from one cron/maintenance loop instead of three):

    1. **partial compaction** of pressure-exceeding buckets
       (``compact_pressured``) — hot, deep delta stacks fold first; their
       deltas vanish, so the next step never wastes a pack on them;
    2. **delta bin-packing** of everything still standing
       (``binpack_deltas``) — cold buckets' dribble files merge verbatim
       (no resolve shuffle), bounding file counts table-wide;
    3. **snapshot expiration + orphan GC** (``expire_snapshots``) —
       metadata and dead data dirs stay bounded for an unbounded stream.

    Each step is its own idempotent commit keyed off ``batch_id`` with a
    step suffix (``::compact`` / ``::binpack``), so a crashed cycle
    re-runs cleanly: finished steps no-op, the unfinished one retries —
    the same exactly-once contract as ingest. Steps that find nothing to
    do are metadata-only (no Spark job). Returns a per-step report.

    Cadence guidance (compaction_bench evidence, BENCH/BASELINE.md):
    run the cycle every ~N micro-batches with ``compact_depth`` ≈ N so
    pressure-folds amortize, and let bin-packing sweep at the same
    cadence — it is cheap enough (verbatim copy of small dirs only) that
    over-calling it costs one no-op snapshot read."""
    report: dict = {"batch_id": batch_id}
    folded = compact_pressured(
        spark, table, batch_id=f"{batch_id}::compact",
        depth_threshold=compact_depth, bytes_threshold=compact_bytes,
        zorder=zorder, expire_tombstones_below=expire_tombstones_below,
    )
    report["compacted_buckets"] = folded
    report["packed_buckets"] = binpack_deltas(
        spark, table, batch_id=f"{batch_id}::binpack",
        target_bytes=binpack_target_bytes, min_dirs=binpack_min_dirs,
    )
    report["expired"] = table.expire_snapshots(
        retain_last=expire_retain,
        orphan_grace_seconds=orphan_grace_seconds,
        older_than_s=expire_older_than_s,
    )
    report["table_version"] = table.current_version()
    return report


def evolve_buckets(
    spark: SparkSession,
    table: SnapshotTable,
    new_n_buckets: int,
    batch_id: str,
    retries: int = 5,
) -> bool:
    """Re-bucketing migration: read the full state at a pinned version,
    resolve it (the rewrite doubles as a compaction), recompute ``_bucket``
    under the new count, and commit the whole table with the flipped bucket
    spec. Subsequent writes and bucket-pruned reads use the new bucketing.
    One full-table shuffle+rewrite — the same cost Iceberg pays to rewrite
    into an evolved partition spec; amortized over the table's lifetime."""
    schema = table.schema()
    for _ in range(retries):
        base_v = table.current_version()
        resolved = resolve(table.read(spark, version=base_v), schema)
        rebucketed = resolved.withColumn(
            META_BUCKET, F.pmod(F.xxhash64(F.col("conv_id")), F.lit(new_n_buckets)).cast("int")
        )
        try:
            return table.commit_rebucket(
                rebucketed, new_n_buckets, batch_id,
                base_version=base_v, cluster_by="conv_id",
            )
        except ConcurrentOverwriteError:
            continue
    raise ConcurrentOverwriteError(
        f"gave up re-bucketing for {batch_id!r} after {retries} re-reads"
    )


def lookup_conversation(
    spark: SparkSession,
    table: SnapshotTable,
    conv_id: str,
    version: int | None = None,
) -> DataFrame:
    """Point lookup: the live turns of ONE conversation, touching the
    minimum of the table — bucket pruning (driver-side XXH64 of the key,
    NO Spark job) composed with file-level min-max pruning (per-commit
    sidecar stats), then LWW resolution over only the surviving files and
    an exact row filter on top (file pruning is superset semantics). At
    100 TB this reads ~one file from the range-clustered base plus only
    the delta files whose batches contained the key, instead of every
    file in the bucket."""
    return lookup_conversations(spark, table, [conv_id], version=version)


def lookup_conversations(
    spark: SparkSession,
    table: SnapshotTable,
    conv_ids: list[str],
    version: int | None = None,
) -> DataFrame:
    """Batched point lookup: live turns of MANY conversations in ONE plan.
    Buckets come from the driver-side XXH64 twin of the table's bucketing
    expression (functions.xxh64 — property-tested bit-equal to Spark's
    ``xxhash64``), so no per-key Spark job; files prune per key via the
    sidecar ``key_set`` bisect (a far-apart key pair keeps only its own
    files, not everything between); then one resolve over the survivors.
    Amortizes the whole lookup pipeline across keys — a 100-key lookup
    costs ~one pruned read, not 100 jobs."""
    from hierarchical_to_relational_spark.functions.xxh64 import bucket_of_key

    if not conv_ids:
        raise ValueError("lookup_conversations needs at least one conv_id")
    schema = table.schema(version)
    nb = table.snapshot(version)["n_buckets"]
    buckets = sorted({bucket_of_key(c, nb) for c in conv_ids})
    scan = table.read(
        spark, buckets=buckets, version=version, key_set=list(conv_ids)
    ).where(F.col("conv_id").isin(list(conv_ids)))
    df = resolve(scan, schema)
    folded = collapse_patches(df.where(F.col(META_OP) != "d"), schema)
    user_cols = [n for n in schema.fieldNames() if not n.startswith("_")]
    return folded.select(*user_cols)


def scan_range(
    spark: SparkSession,
    table: SnapshotTable,
    col: str,
    lo=None,
    hi=None,
    version: int | None = None,
    key_set_threshold: int = 8192,
) -> DataFrame:
    """Resolution-SAFE value-range query over any scalar user column
    (``ts`` windows, ``role`` equality via lo==hi, ``turn_idx`` bands —
    no secondary index): returns the CURRENT live rows whose ``col`` is in
    [lo, hi] (inclusive; None = open; SQL semantics — NULL never matches).

    Raw ``table.read(col_ranges=...)`` file pruning alone cannot answer
    this correctly: a pruned file may hold the tombstone or a NEWER
    version of a key whose stale in-range row survives in a kept file.
    Two phases close that hole at pruned-scan cost:

    1. candidate keys — scan ONLY the files whose sidecar ``col`` bounds
       overlap the range (plus files without bounds), row-filter exactly,
       and take the distinct key span. Every key whose CURRENT row matches
       is found here (its matching row physically lives in a kept file).
    2. resolution — read the candidates' keys back mask-completely
       (tombstones and patches carry conv_id/_lsn), resolve LWW +
       tombstones + patch folds, and re-apply the row filter so keys
       whose current value moved OUT of the range drop away. When the
       candidates are ≤ ``key_set_threshold`` distinct (bucket, key)
       pairs, the keys themselves are collected and drive ``key_set``
       bisect file pruning — two far-apart candidate keys read only
       their OWN files, not everything between them, where the previous
       single global (min, max) envelope pruned nothing once candidates
       spanned the keyspace (e.g. a 30-day window touching most
       conversations). Above the threshold, fall back to the envelope
       (an unbounded key collect would be a driver-side data read).

    At 100 TB on a time-ordered ingest this touches the delta/base files
    of the queried window plus the candidates' key neighborhoods — not
    the table. Driver collect is bounded: ≤ threshold (bucket, key)
    pairs in the key-set regime, 2 scalars + ≤ n_buckets ints in the
    envelope regime."""
    schema = table.schema(version)
    pred = None
    if lo is not None:
        pred = F.col(col) >= F.lit(lo)
    if hi is not None:
        p2 = F.col(col) <= F.lit(hi)
        pred = p2 if pred is None else pred & p2
    if pred is None:
        raise ValueError("scan_range needs at least one bound")
    user_cols = [n for n in schema.fieldNames() if not n.startswith("_")]
    # equality probe (lo == hi) additionally consults the table's Bloom
    # sidecar when the column is indexed (SnapshotTable index_cols):
    # hash-like high-cardinality columns — where every file's [min, max]
    # spans the probe value and bounds prune nothing — then skip at file
    # granularity with ~1% false-keeps
    eq = {col: lo} if (lo is not None and lo == hi) else None
    cand = (
        table.read(spark, version=version, col_ranges={col: (lo, hi)}, col_eq=eq)
        .where(pred)
        .select(META_BUCKET, "conv_id", "turn_idx")
        .distinct()
    )
    # bounded probe: ≤ threshold+1 distinct (bucket, key) pairs
    probe = (cand.select(META_BUCKET, "conv_id").distinct()
             .limit(key_set_threshold + 1).collect())
    if not probe:
        return spark.createDataFrame([], T.StructType([schema[c] for c in user_cols]))
    if len(probe) <= key_set_threshold:
        # key-set regime: per-key bisect file pruning; the candidate-turn
        # semi-join is replaced by an isin filter (equivalent: any turn
        # whose CURRENT row matches pred is a phase-1 candidate, and
        # non-matching turns drop at the final .where(pred)) — one fewer
        # join and one fewer phase-1 recompute.
        keys = sorted({r["conv_id"] for r in probe})
        buckets = sorted({r[META_BUCKET] for r in probe})
        full = table.read(spark, version=version, buckets=buckets, key_set=keys)
        resolved = resolve(full, schema)
        live = (resolved.where(F.col(META_OP) != "d")
                .where(F.col("conv_id").isin(keys)))
        folded = collapse_patches(live, schema).where(pred)
        return folded.select(*user_cols)
    span = cand.agg(
        F.min("conv_id"), F.max("conv_id"), F.collect_set(META_BUCKET)
    ).first()  # 2 scalars + ≤ n_buckets ints — bounded driver collect
    full = table.read(
        spark, version=version, buckets=sorted(span[2]), key_range=(span[0], span[1])
    )
    resolved = resolve(full, schema)
    live = resolved.where(F.col(META_OP) != "d")
    hits = live.join(cand, [META_BUCKET, "conv_id", "turn_idx"], "left_semi")
    folded = collapse_patches(hits, schema).where(pred)
    return folded.select(*user_cols)


def _diff_live_dirs(
    table: SnapshotTable, since_version: int, version: int
) -> tuple[dict[str, list[str]], set[str]]:
    """Walk the snapshot log from ``since_version`` to ``version`` and
    classify what changed per bucket:

    - ``added[bucket] = [commit dirs]`` — dirs APPENDED by logical-change
      commits (MoR deltas): scanning exactly these files surfaces every
      key that could have changed;
    - ``superset`` — buckets rewritten by a commit we cannot diff
      minimally (CoW overwrite, pre-``kind`` snapshots): every current
      key in them counts as changed. Safe because every commit kind except
      rollback preserves tombstones — rows never silently vanish, so
      re-emitting the bucket's current rows + tombstones is a correct
      (if non-minimal) net diff.

    Pure-rewrite commits (``kind`` compact / rebucket — and ``evolve``,
    whose live map is unchanged) are logical no-ops and are SKIPPED: their
    live-map churn folds rows that earlier appends already surfaced (or
    that predate ``since_version``). A bucket-count change makes bucket
    ids incomparable → everything is superset.

    A ``rollback`` in the window marks its changed buckets superset AND
    returns the dirs it un-referenced (``removed``): rolled-back rows
    vanish without tombstones, but they physically live in those dirs —
    still GC-protected while the pre-rollback snapshot is retained — so
    the caller scans them and emits SYNTHETIC conversation deletes,
    followed by the superset re-add of current rows. Only when a
    retracted dir has already expired does the diff become inexpressible
    (``ValueError`` from changes_since → full resync), the restriction
    Iceberg places on ALL incremental reads across history rewrites —
    this engine narrows it to the expired-journal case."""
    start = table.snapshot(since_version)  # raises if expired — by design
    added: dict[str, list[str]] = {}
    superset: set[str] = set()
    removed: dict[str, set[str] | None] = {}  # rollback-retracted dirs
    prev = start["live"]
    respec = False  # any rebucket → bucket labels incomparable across window
    for v in range(since_version + 1, version + 1):
        snap = table.snapshot(v)
        cur = snap["live"]
        kind = snap.get("kind")
        if kind == "rebucket" or snap["n_buckets"] != start["n_buckets"]:
            respec = True
        if kind is None and snap["batch_id"].endswith(("::compact", "::evolve")):
            kind = "compact"  # pre-kind snapshots from this engine's pipeline
        if kind is None and snap["batch_id"].startswith("maintenance-rollback-"):
            # pre-kind rollbacks from the maintenance CLI's derived ids:
            # superset emission would be WRONG (rollback removes rows
            # without tombstones), so sniff them into the raise below.
            # Pre-kind rollbacks under caller-chosen ids remain
            # undetectable — a legacy-table limitation.
            kind = "rollback"
        if kind == "rollback":
            # Round-5: emit THROUGH a rollback. Rolled-back rows vanish
            # without tombstones, but every such row physically lives in a
            # dir the rollback un-referenced — and those dirs stay
            # GC-protected while the PRE-rollback snapshot is retained. So
            # record (dir, buckets) for each un-referenced dir: the caller
            # scans them for the affected conversations and emits
            # SYNTHETIC deletes, and the affected buckets degrade to
            # superset re-emission ('d' then 'u' re-add of the current
            # rows — the standard consumer apply order converges).
            for b in set(prev) | set(cur):
                a, c = prev.get(b, []), cur.get(b, [])
                if a != c:
                    superset.add(b)
                    for d in set(a) - set(c):
                        removed.setdefault(d, set()).add(b)
            prev = cur
            continue
        if kind in ("compact", "rebucket", "evolve"):
            prev = cur
            continue
        for b in set(prev) | set(cur):
            a, c = prev.get(b, []), cur.get(b, [])
            if c[: len(a)] == a:
                added.setdefault(b, []).extend(c[len(a):])
            else:
                superset.add(b)
        prev = cur
    if respec:
        # bucket labels incomparable across the window: every bucket is
        # superset, and retracted dirs scan WITHOUT a bucket restriction
        return ({}, set(table.snapshot(version)["live"].keys()),
                {d: None for d in removed})
    return added, superset, removed


def changes_since(
    spark: SparkSession,
    table: SnapshotTable,
    since_version: int,
    version: int | None = None,
) -> DataFrame:
    """Incremental CDC egress (the Iceberg incremental-read / changelog
    analog): the NET state changes between two snapshot VERSIONS, for a
    downstream consumer that checkpointed ``since_version``. The cursor is
    the snapshot version, not a data LSN — the stream is out-of-order, so
    a late event with a LOW LSN still changes state; only the commit log
    orders what a consumer has and hasn't seen.

    Emits, against the state at ``version`` (default current):

    - ``change_op='u'``: one MATERIALIZED row per (conv_id, turn_idx)
      whose current resolved state a commit in the window could have
      touched, with ``change_lsn`` = newest contributing LSN.
      Intermediate overwrites collapse to the final row (net semantics);
      a re-delivered duplicate re-emits the current row (idempotent for
      the consumer). Conversations whose tombstone advanced also re-emit
      their surviving rows, so "apply all 'd', then all 'u'" is always a
      correct consumer apply order (emitted 'u' rows are post-resolution
      live state and supersede every emitted tombstone).
    - ``change_op='d'``: one row per conversation whose tombstone was
      (re-)written in the window (null payload columns, ``change_lsn`` =
      delete LSN). A late upsert that was dead on arrival (below a
      tombstone the consumer already saw) nets to nothing.

    Scale shape: the snapshot-log walk is driver-side metadata (bounded by
    the retention window). Phase 1 scans ONLY the delta dirs appended by
    logical-change commits in the window — on the MoR hot path that is
    exactly the new batches, independent of table size. Buckets rewritten
    by non-append commits (CoW merge, rollback) degrade to whole-bucket
    re-emission — correct, just not minimal — while pure rewrites
    (compaction, re-bucketing) are skipped entirely. A rollback in the
    window emits through (synthetic deletes from the retracted dirs +
    superset re-add; round 5) instead of forcing a resync. Phase 2
    materializes current rows reading only the affected buckets. Raising
    ``FileNotFoundError`` when ``since_version`` fell out of the retained
    snapshot window — or ``ValueError`` when a rollback's retracted dirs
    already expired — tells the consumer to fall back to a full
    re-sync."""
    v2 = table.current_version() if version is None else version
    schema = table.schema(v2)
    user_cols = [n for n in schema.fieldNames() if not n.startswith("_")]
    out_schema = T.StructType(
        [schema[c] for c in user_cols]
        + [
            T.StructField("change_lsn", T.LongType(), True),
            T.StructField("change_op", T.StringType(), False),
        ]
    )
    added, superset, removed = _diff_live_dirs(table, since_version, v2)
    added = {b: ds for b, ds in added.items() if b not in superset and ds}
    if not added and not superset and not removed:
        return spark.createDataFrame([], out_schema)

    keys = [META_BUCKET, "conv_id", "turn_idx"]
    # phase 1: scan exactly the appended delta files → candidate keys
    parts = []
    by_dir: dict[str, list[str]] = {}
    for b, ds in added.items():
        for d in ds:
            by_dir.setdefault(d, []).append(b)
    for d, bs in sorted(by_dir.items()):
        base = os.path.join(table.root, d)
        if os.path.isdir(base):
            # flat commit dirs: _bucket is a data column; restrict to the
            # buckets whose live entry actually gained this dir (parquet
            # row-group stats serve the IN-filter — writes sort by _bucket)
            df = spark.read.parquet(base).where(
                F.col(META_BUCKET).isin([int(b) for b in bs])
            )
            for c in ("conv_id", "turn_idx", META_OP, META_LSN):
                if c not in df.columns:  # dirs written before an evolve
                    df = df.withColumn(c, F.lit(None))
            parts.append(df.select(META_BUCKET, "conv_id", "turn_idx", META_OP, META_LSN))
    if parts:
        delta = parts[0]
        for p in parts[1:]:
            delta = delta.unionByName(p)
        changed_keys = delta.where(F.col(META_OP) != "d").select(*keys).distinct()
        tomb_added = (
            delta.where(F.col(META_OP) == "d")
            .groupBy(META_BUCKET, "conv_id")
            .agg(F.max(META_LSN).alias("change_lsn"))
        )
    else:
        empty_keys = T.StructType(
            [T.StructField(META_BUCKET, T.IntegerType()), schema["conv_id"], schema["turn_idx"]]
        )
        changed_keys = spark.createDataFrame([], empty_keys)
        tomb_added = spark.createDataFrame(
            [], T.StructType(
                [T.StructField(META_BUCKET, T.IntegerType()), schema["conv_id"],
                 T.StructField("change_lsn", T.LongType())]
            )
        )

    # rollback-retracted dirs → synthetic conversation deletes: any conv
    # with a row in a dir the rollback un-referenced may have lost state
    # with no tombstone to say so; emit 'd' (change_lsn = newest retracted
    # LSN) and let the superset re-emission re-add whatever survives.
    if removed:
        rparts = []
        for d, bs in sorted(removed.items()):
            base = os.path.join(table.root, d)
            if not os.path.isdir(base):
                raise ValueError(
                    f"rollback-retracted dir {d} expired before the window "
                    f"({since_version}, {v2}] was consumed — the synthetic "
                    "deletes are unrecoverable, full resync required"
                )
            rdf = spark.read.parquet(base)
            if bs is not None and META_BUCKET in rdf.columns:
                rdf = rdf.where(F.col(META_BUCKET).isin([int(b) for b in bs]))
            rparts.append(rdf.select(
                F.col(META_BUCKET).cast("int").alias(META_BUCKET)
                if META_BUCKET in rdf.columns else F.lit(-1).alias(META_BUCKET),
                "conv_id", META_LSN))
        rb = rparts[0]
        for p2 in rparts[1:]:
            rb = rb.unionByName(p2)
        tomb_rollback = (rb.groupBy(META_BUCKET, "conv_id")
                         .agg(F.max(META_LSN).alias("change_lsn")))
        tomb_added = tomb_added.unionByName(tomb_rollback)

    # phase 2: materialize current rows for affected buckets only
    buckets = sorted(int(b) for b in set(added) | superset)
    resolved = resolve(table.read(spark, buckets=buckets, version=v2), schema)
    live = resolved.where(F.col(META_OP) != "d")
    is_super = F.col(META_BUCKET).isin([int(b) for b in superset]) if superset else F.lit(False)
    marked = (
        live.join(changed_keys.withColumn("_mk", F.lit(1)), keys, "left")
        .join(
            tomb_added.select(META_BUCKET, "conv_id", F.lit(1).alias("_mc")).distinct(),
            [META_BUCKET, "conv_id"],
            "left",
        )
        .where(F.col("_mk").isNotNull() | F.col("_mc").isNotNull() | is_super)
        .drop("_mk", "_mc")
    )
    ups_out = collapse_patches(marked, schema).select(
        *user_cols, F.col(META_LSN).alias("change_lsn"), F.lit("u").alias("change_op")
    )
    # deletes: tombstones (re-)written in the window; superset buckets
    # re-emit every retained tombstone (idempotent re-drop for consumers)
    tomb_super = (
        resolved.where((F.col(META_OP) == "d") & is_super)
        .select(META_BUCKET, "conv_id", F.col(META_LSN).alias("change_lsn"))
    )
    dels = (
        tomb_added.unionByName(tomb_super)
        .groupBy("conv_id")
        .agg(F.max("change_lsn").alias("change_lsn"))
    )
    dels_out = dels.select(
        *[
            F.col(c) if c == "conv_id" else F.lit(None).cast(schema[c].dataType).alias(c)
            for c in user_cols
        ],
        F.col("change_lsn").cast("long").alias("change_lsn"),
        F.lit("d").alias("change_op"),
    )
    return ups_out.unionByName(dels_out)


def changes_between_timestamps(
    spark: SparkSession,
    table: SnapshotTable,
    since_ts: float,
    until_ts: float | None = None,
) -> DataFrame:
    """Timestamp-cursor incremental read (Iceberg
    ``FOR TIMESTAMP AS OF``-style CDF): the net state diff between the
    table states AS OF two wall-clock instants — what a human operator
    actually types. Pure composition: each timestamp resolves to the
    latest retained snapshot committed at or before it
    (``version_as_of``), then ``changes_since`` diffs the two versions
    with all its guarantees (net semantics, rollback emit-through,
    expired window → FileNotFoundError = resync)."""
    v1 = table.version_as_of(since_ts)
    v2 = table.current_version() if until_ts is None else table.version_as_of(until_ts)
    if v2 < v1:
        raise ValueError(f"until_ts resolves to v{v2} before since_ts's v{v1}")
    return changes_since(spark, table, v1, version=v2)


def read_transcripts(
    spark: SparkSession,
    table: SnapshotTable,
    version: int | None = None,
) -> DataFrame:
    """User-facing read: resolve LWW+tombstones over base+deltas (a no-op
    reshuffle on freshly-compacted tables), keep live rows, drop metadata.
    Stable (conv_id, turn_idx) ordering is left to the caller."""
    schema = table.schema(version)
    df = resolve(table.read(spark, version=version), schema)
    folded = collapse_patches(df.where(F.col(META_OP) != "d"), schema)
    user_cols = [n for n in schema.fieldNames() if not n.startswith("_")]
    return folded.select(*user_cols)
