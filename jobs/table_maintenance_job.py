"""spark-submit maintenance CLI for a transcripts SnapshotTable: the ops
surface for every table-lifecycle operation the engine supports.

    spark-submit --py-files /tmp/h2r.zip jobs/table_maintenance_job.py \\
        --table /data/transcripts <action> [options]

Actions:
  binpack    merge small delta dirs verbatim (no resolve, no base
             rewrite) — the cheap file-count lever for cold buckets
  maintain   ONE combined cadence pass: pressure-driven partial
             compaction, then table-wide delta bin-packing, then
             snapshot expiration + orphan GC — the single loop a
             production stream schedules instead of three
  compact    fold merge-on-read deltas copy-on-write (optionally expiring
             tombstones below an LSN watermark; --zorder for multi-column
             clustering)
  changes    incremental CDC egress: net state diff since a snapshot
             version (optionally written as parquet for a downstream
             consumer)
  expire     expire old snapshots + collect orphan data dirs (bounded
             metadata for unbounded streams)
  rebucket   migrate to a new bucket count (full rewrite, new bucket spec)
  rollback   roll the table back to a retained historical version
  lookup     batched point lookup (N conversations, one plan, jobless
             driver-side bucket hashing + per-key file pruning)
  scan-range value-range query on any scalar column through the non-key
             sidecar bounds (two-phase, LWW-resolution-safe)
  mview      refresh an incremental materialized aggregate view (default
             per-conversation profile; --window-days for per-(conv, day)
             event-time rollups; --full to force a rebuild)
  tag        pin a NAME to a snapshot version — tagged versions are
             exempt from expiration (audit/release pointers)
  drop-tag   remove a named ref (the version re-enters normal retention)
  branch     fork a writable branch at a version/tag (write-audit-publish:
             stage risky ingest on the branch, validate, merge). Pass the
             global --branch flag to point OTHER actions (status, history,
             changes, lookup, scan-range, compact, ...) at a branch ref.
  merge-branch  fold a branch back into main — bucket-granular three-way
             merge, one atomic idempotent commit (kind="merge")
  drop-branch   delete a branch's snapshot log; its exclusive data dirs
             become orphans for the next expire run
  history    print the snapshot log
  status     print current version / bucket spec / delta depth+bytes /
             lineage monitoring summary

Every mutating action is an idempotent commit keyed by --batch-id. The
DERIVED default ids embed the current table version, so a re-run after a
crash-before-commit retries cleanly, while a re-run after a successful
commit performs a fresh (state-preserving, hence safe) maintenance pass.
Pass an explicit --batch-id to make re-runs strict no-ops — the same
exactly-once contract as ingest.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="SnapshotTable maintenance")
    p.add_argument("--table", required=True)
    p.add_argument("--branch", default=None,
                   help="operate on this writable branch ref instead of "
                        "main (created with the `branch` action)")
    sub = p.add_subparsers(dest="action", required=True)

    c = sub.add_parser("compact")
    c.add_argument("--batch-id", default=None)
    c.add_argument("--expire-tombstones-below", type=int, default=None)
    c.add_argument("--squash-patches-below", type=int, default=None)
    c.add_argument("--zorder", default=None, metavar="COL[,COL...]",
                   help="cluster the rewrite by a Morton interleave of these "
                        "columns (e.g. conv_id,_lsn) instead of conv_id alone")

    bp = sub.add_parser("binpack")
    bp.add_argument("--batch-id", default=None)
    bp.add_argument("--target-bytes", type=int, default=64 << 20,
                    help="pack a bucket's smallest delta dirs while their "
                         "sum stays under this (one packed dir per bucket)")
    bp.add_argument("--min-dirs", type=int, default=3,
                    help="only pack buckets with at least this many small "
                         "dirs (the pack must reduce fan-in to pay for "
                         "itself)")

    mt = sub.add_parser("maintain")
    mt.add_argument("--batch-id", default=None)
    mt.add_argument("--compact-depth", type=int, default=16,
                    help="fold buckets whose delta stack is at least this "
                         "deep (partial compaction, step 1)")
    mt.add_argument("--compact-bytes", type=int, default=None,
                    help="also fold buckets with at least this many delta "
                         "bytes")
    mt.add_argument("--zorder", default=None, metavar="COL[,COL...]")
    mt.add_argument("--expire-tombstones-below", type=int, default=None)
    mt.add_argument("--target-bytes", type=int, default=64 << 20,
                    help="bin-pack small delta dirs under this sum (step 2)")
    mt.add_argument("--min-dirs", type=int, default=3)
    mt.add_argument("--retain-last", type=int, default=100,
                    help="snapshot expiration (step 3)")
    mt.add_argument("--orphan-grace-s", type=float, default=3600.0)
    mt.add_argument("--older-than-s", type=float, default=None)

    e = sub.add_parser("expire")
    e.add_argument("--retain-last", type=int, default=100)
    e.add_argument("--orphan-grace-s", type=float, default=3600.0)
    e.add_argument("--no-clean-orphans", action="store_true")
    e.add_argument("--older-than-s", type=float, default=None,
                   help="only expire snapshots older than this many seconds "
                        "(younger ones survive even beyond --retain-last)")

    rb = sub.add_parser("rebucket")
    rb.add_argument("--n-buckets", type=int, required=True)
    rb.add_argument("--batch-id", default=None)

    ro = sub.add_parser("rollback")
    ro.add_argument("--to-version", type=int, default=None)
    ro.add_argument("--to-ts", type=float, default=None,
                    help="epoch seconds: roll back to the latest snapshot "
                         "committed at or before this time")
    ro.add_argument("--batch-id", default=None)

    ch = sub.add_parser("changes")
    ch.add_argument("--since-version", type=int, default=None)
    ch.add_argument("--since-ts", type=float, default=None,
                    help="epoch seconds: diff from the latest snapshot "
                         "committed at or before this time (alternative "
                         "to --since-version)")
    ch.add_argument("--until-ts", type=float, default=None,
                    help="epoch seconds: diff up to the latest snapshot "
                         "at or before this time (default: current)")
    ch.add_argument("--out", default=None,
                    help="write the change rows as parquet here (otherwise "
                         "only counts are printed)")

    lk = sub.add_parser("lookup")
    lk.add_argument("--conv-ids", required=True, metavar="ID[,ID...]",
                    help="batched point lookup: live turns of these "
                         "conversations in ONE plan (driver-side bucket "
                         "hashing, per-key sidecar file pruning)")
    lk.add_argument("--out", default=None)

    sr = sub.add_parser("scan-range")
    sr.add_argument("--col", required=True,
                    help="any scalar user column (ts, role, turn_idx, ...)")
    sr.add_argument("--lo", default=None)
    sr.add_argument("--hi", default=None)
    sr.add_argument("--out", default=None)

    mv = sub.add_parser("mview")
    mv.add_argument("--root", required=True,
                    help="materialized-view directory (created on first "
                         "refresh; default per-conversation aggregate "
                         "profile — programmatic callers pass custom aggs "
                         "via operators.mview.ConvAggregateView)")
    mv.add_argument("--window-days", action="store_true",
                    help="event-time daily rollup: one row per "
                         "(conv_id, day) instead of per conversation")
    mv.add_argument("--full", action="store_true",
                    help="force a full rebuild instead of incremental")
    mv.add_argument("--agg", action="append", default=None,
                    metavar="NAME=SQL_EXPR",
                    help="declare the view's aggregates as SQL (repeatable): "
                         "--agg 'chars=sum(length(text))'. Overrides the "
                         "default profile; with --table pointed at another "
                         "MV's root this CHAINS views (aggregate over the "
                         "upstream MV's columns)")

    tg = sub.add_parser("tag")
    tg.add_argument("--name", required=True)
    tg.add_argument("--version", type=int, default=None,
                    help="snapshot version to pin (default: current). "
                         "Tagged versions are exempt from expiration.")
    dt = sub.add_parser("drop-tag")
    dt.add_argument("--name", required=True)

    bc = sub.add_parser("branch")
    bc.add_argument("--name", required=True)
    bc.add_argument("--from-version", default=None,
                    help="snapshot version (int) or tag name to fork at "
                         "(default: current)")
    mb = sub.add_parser("merge-branch")
    mb.add_argument("--name", required=True)
    mb.add_argument("--batch-id", default=None)
    db = sub.add_parser("drop-branch")
    db.add_argument("--name", required=True)

    sub.add_parser("history")
    sub.add_parser("status")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from hierarchical_to_relational_spark.lineage import LineageStore
    from hierarchical_to_relational_spark.operators.merge import compact, evolve_buckets
    from hierarchical_to_relational_spark.table.snapshot_table import SnapshotTable

    table = SnapshotTable(args.table, branch=args.branch)
    out: dict

    if args.action == "history":
        out = {"history": table.history()}
    elif args.action == "status":
        out = {
            "version": table.current_version(),
            "n_buckets": table.n_buckets,
            "delta_depth": table.delta_depth(),
            "delta_bytes_max_bucket": table.delta_bytes(),
            "refs": table.refs(),
            "branches": table.branches(),
            "branch": table.branch,
            "monitoring": LineageStore(args.table).monitoring_summary(),
        }
    elif args.action == "tag":
        out = {"name": args.name, "version": table.tag(args.name, args.version)}
    elif args.action == "drop-tag":
        out = {"name": args.name, "dropped": table.drop_tag(args.name)}
    elif args.action == "branch":
        fv = args.from_version
        if fv is not None:
            try:
                fv = int(fv)
            except ValueError:
                pass  # tag name — create_branch resolves it
        br = table.create_branch(args.name, from_version=fv)
        out = {"name": args.name, "forked_from": br.branch_meta()["forked_from"]}
    elif args.action == "merge-branch":
        bid = args.batch_id or f"merge-{args.name}-v{table.current_version()}"
        out = {"name": args.name, "batch_id": bid,
               "committed": table.merge_branch(args.name, batch_id=bid),
               "version": table.current_version()}
    elif args.action == "drop-branch":
        out = {"name": args.name, "dropped": table.drop_branch(args.name)}
    elif args.action == "expire":
        out = table.expire_snapshots(
            retain_last=args.retain_last,
            clean_orphans=not args.no_clean_orphans,
            orphan_grace_seconds=args.orphan_grace_s,
            older_than_s=args.older_than_s,
        )
    else:
        spark = SparkSession.builder.appName(f"h2r-maintenance-{args.action}").getOrCreate()
        spark.sparkContext.setLogLevel("WARN")
        if args.action == "mview":
            import pyspark.sql.functions as _F

            from hierarchical_to_relational_spark.operators.mview import (
                ConvAggregateView,
                default_aggs,
            )

            if args.agg:
                aggs = dict(a.split("=", 1) for a in args.agg)
            elif args.window_days:
                aggs = {"n_turns": _F.count(_F.lit(1)),
                        "chars": _F.sum(_F.length("text"))}
            else:
                aggs = default_aggs()
            view = ConvAggregateView(
                spark, table, args.root, aggs=aggs,
                window_col=(_F.datediff(_F.col("ts"), _F.lit("1970-01-01"))
                            if args.window_days else None),
            )
            rep = view.full_refresh() if args.full else view.refresh()
            out = {k: rep.get(k) for k in
                   ("mode", "from", "to", "changed_convs", "committed")}
            out["mv_version"] = view.table.current_version() if view.table else None
            print(json.dumps(out, default=str))
            return 0
        if args.action == "changes":
            from hierarchical_to_relational_spark.operators.merge import changes_since

            if (args.since_version is None) == (args.since_ts is None):
                p.error("changes: pass exactly one of --since-version / --since-ts")
            since_v = (args.since_version if args.since_version is not None
                       else table.version_as_of(args.since_ts))
            v2 = (table.current_version() if args.until_ts is None
                  else table.version_as_of(args.until_ts))
            df = changes_since(spark, table, since_v, version=v2)
            if args.out:
                df.write.mode("overwrite").parquet(args.out)
                df = spark.read.parquet(args.out)  # count what was written
            import pyspark.sql.functions as _F

            counts = {r["change_op"]: r["n"] for r in
                      df.groupBy("change_op").agg(_F.count("*").alias("n")).collect()}
            out = {"since_version": since_v, "version": v2,
                   "upserts": counts.get("u", 0), "deletes": counts.get("d", 0),
                   "out": args.out}
            print(json.dumps(out, default=str))
            return 0
        if args.action in ("lookup", "scan-range"):
            import pyspark.sql.functions as _F

            if args.action == "lookup":
                from hierarchical_to_relational_spark.operators.merge import (
                    lookup_conversations,
                )

                keys = [k for k in args.conv_ids.split(",") if k]
                df = lookup_conversations(spark, table, keys)
                meta = {"conv_ids": len(keys)}
            else:
                from hierarchical_to_relational_spark.operators.merge import scan_range

                # Coerce CLI string bounds by the COLUMN's type, resolved
                # from the table schema — a bare string reaching the
                # sidecar's epoch-micros bounds would either TypeError
                # (str vs int compare) or, as a numeric epoch-seconds
                # guess, silently prune every file (seconds vs micros).
                col_type = {f.name: f.dataType.typeName()
                            for f in table.schema().fields}.get(args.col)

                def _parse(v):
                    if v is None:
                        return None
                    if col_type in ("timestamp", "timestamp_ntz", "date"):
                        import datetime

                        dt = datetime.datetime.fromisoformat(v)
                        return dt.date() if col_type == "date" else dt
                    if col_type in ("byte", "short", "integer", "long"):
                        return int(v)
                    if col_type in ("float", "double", "decimal"):
                        return float(v)
                    for cast in (int, float):  # unknown column: best effort
                        try:
                            return cast(v)
                        except ValueError:
                            pass
                    return v

                df = scan_range(spark, table, args.col,
                                lo=_parse(args.lo), hi=_parse(args.hi))
                meta = {"col": args.col, "lo": args.lo, "hi": args.hi}
            if args.out:
                df.write.mode("overwrite").parquet(args.out)
                df = spark.read.parquet(args.out)
            out = {**meta, "rows": df.count(), "out": args.out}
            print(json.dumps(out, default=str))
            return 0
        if args.action == "binpack":
            from hierarchical_to_relational_spark.operators.merge import binpack_deltas

            bid = args.batch_id or f"maintenance-binpack-v{table.current_version()}"
            packed = binpack_deltas(spark, table, batch_id=bid,
                                    target_bytes=args.target_bytes,
                                    min_dirs=args.min_dirs)
            out = {"packed_buckets": packed, "batch_id": bid,
                   "table_version": table.current_version()}
            print(json.dumps(out, default=str))
            return 0
        if args.action == "maintain":
            from hierarchical_to_relational_spark.operators.merge import maintain_cycle

            bid = args.batch_id or f"maintenance-cycle-v{table.current_version()}"
            out = maintain_cycle(
                spark, table, batch_id=bid,
                compact_depth=args.compact_depth,
                compact_bytes=args.compact_bytes,
                zorder=args.zorder.split(",") if args.zorder else None,
                expire_tombstones_below=args.expire_tombstones_below,
                binpack_target_bytes=args.target_bytes,
                binpack_min_dirs=args.min_dirs,
                expire_retain=args.retain_last,
                orphan_grace_seconds=args.orphan_grace_s,
                expire_older_than_s=args.older_than_s,
            )
            print(json.dumps(out, default=str))
            return 0
        if args.action == "compact":
            bid = args.batch_id or f"maintenance-compact-v{table.current_version()}"
            out = {"committed": compact(spark, table, batch_id=bid,
                                        expire_tombstones_below=args.expire_tombstones_below,
                                        squash_patches_below=args.squash_patches_below,
                                        zorder=args.zorder.split(",") if args.zorder else None),
                   "batch_id": bid}
        elif args.action == "rebucket":
            bid = args.batch_id or f"maintenance-rebucket-{args.n_buckets}-v{table.current_version()}"
            out = {"committed": evolve_buckets(spark, table, args.n_buckets, batch_id=bid),
                   "batch_id": bid, "n_buckets": args.n_buckets}
        else:  # rollback
            if (args.to_version is None) == (args.to_ts is None):
                p.error("rollback needs exactly one of --to-version / --to-ts")
            to_version = (
                args.to_version if args.to_version is not None
                else table.version_as_of(args.to_ts)
            )
            # embed the CURRENT version too: rolling back to the same target
            # a second time (after new writes) must be a new commit, not a
            # silent no-op against the permanent batch-id ledger
            bid = args.batch_id or (
                f"maintenance-rollback-{to_version}-v{table.current_version()}"
            )
            out = {"committed": table.rollback(to_version, batch_id=bid),
                   "batch_id": bid, "to_version": to_version}
        out["table_version"] = table.current_version()

    print(json.dumps(out, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
