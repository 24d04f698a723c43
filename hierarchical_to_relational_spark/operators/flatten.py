"""Hierarchy → relational flattening (the reference's headline operator).

Semantics match ``HierarchyFlattener.flatten`` (reference
HierarchyFlattener.java:127-351), verified against the reference's golden
pipeline tests (HierarchyToRelationalTest.java): the input is an edge list
``(parent, child, payload...)``; the output re-emits every edge once per
distinct depth at which it is reachable from a seed edge, annotated with

- ``level``   — depth (seed edges are level 1),
- ``bottom``  — true iff the child has no outgoing edges (leaf),
- optional ``path`` — separator-joined ``path_field`` values from the seed
  down to this edge (minimum path chosen on multi-path duplicates,
  HierarchyFlattener.java:333),
- optional connect-by-root columns — frozen at the seed edge and carried
  verbatim to every descendant row (HierarchyFlattener.java:269-272).

Seeds are every edge (or the subset matching the ``start_with`` SQL
predicate — HierarchyFlattener.java:371-373); self-loop edges are dropped at
the seed stage only (:174-175). Expansion is a per-level left-outer
self-join on ``frontier.child == input.parent`` (:274-277); join misses mark
leaves and leave level unchanged; final duplicates collapse via a hash
aggregation on ``(parent, child, level)`` (:322-342).

Engine improvements over the reference (SURVEY.md §4):

- **Plan-lineage checkpointing**: the reference's driver loop grows an
  O(depth²) logical plan (no checkpoint anywhere). We ``localCheckpoint``
  the frontier every ``checkpoint_every`` levels and accumulate per-level
  results in a list, unioning once at the end — both keep analysis cost
  linear in depth.
- **Deterministic aggregation**: the reference uses ``first()`` (order
  dependent) for payload and root columns; within a ``(parent, child,
  level)`` group payload columns are constant (they come from the same
  input edge) but the root can differ across seeds. We pick the root
  belonging to the *minimum path* (``min_by``) so output is reproducible
  run-to-run — same answer as the reference wherever the reference is
  deterministic.
- **Broadcast option**: the per-level join's right side is the whole edge
  table; when it fits, ``broadcast_input=True`` makes every level a
  broadcast hash join (no shuffle per level — the difference between
  depth×shuffle and depth×map-only stages at scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from hierarchical_to_relational_spark.config import FlattenConfig


class MaxDepthExceededError(RuntimeError):
    """Raised when the hierarchy is deeper than ``max_depth`` (cycle guard —
    reference HierarchyFlattener.java:216-219)."""


def _seed(df: DataFrame, cfg: FlattenConfig) -> DataFrame:
    """Level-1 rows: every edge (or the start_with subset), minus
    self-loops, plus literal level/bottom and path/root initializers."""
    seeded = df.where(cfg.start_with) if cfg.start_with else df
    seeded = seeded.where(F.col(cfg.parent_field) != F.col(cfg.child_field))
    cols: list[Column] = [F.col(n) for n in df.columns]
    cols.append(F.lit(1).alias(cfg.level_field))
    cols.append(F.lit(0).alias(cfg.bottom_field))
    if cfg.has_path:
        # format_string, not concat: the reference renders a NULL path value
        # as the literal "null" (HierarchyFlattener.java:179-181 uses
        # String.format); concat would null the whole path instead.
        cols.append(
            F.format_string(
                "%s%s", F.lit(cfg.path_separator), F.col(cfg.path_field).cast("string")
            ).alias(cfg.path_alias_field)
        )
    for src, alias in cfg.connect_by_root_map.items():
        cols.append(F.col(src).alias(alias))
    return seeded.select(*cols)


def _advance(frontier: DataFrame, edges: DataFrame, cfg: FlattenConfig, data_fields: list[str]) -> DataFrame:
    """One expansion level: frontier ⋈(left outer) edges on
    frontier.child == edges.parent. Hit → step down one edge (level+1);
    miss → re-emit the frontier row leaf-marked at the same level."""
    cur, inp = frontier.alias("cur"), edges.alias("inp")
    hit = F.col(f"inp.{cfg.parent_field}").isNotNull()
    cols: list[Column] = [
        F.when(hit, F.col(f"cur.{cfg.child_field}")).otherwise(F.col(f"cur.{cfg.parent_field}")).alias(cfg.parent_field),
        F.when(hit, F.col(f"inp.{cfg.child_field}")).otherwise(F.col(f"cur.{cfg.child_field}")).alias(cfg.child_field),
        F.when(hit, F.col(f"cur.{cfg.level_field}") + 1).otherwise(F.col(f"cur.{cfg.level_field}")).alias(cfg.level_field),
        F.when(hit, F.lit(0)).otherwise(F.lit(1)).alias(cfg.bottom_field),
    ]
    for name in data_fields:
        cols.append(F.when(hit, F.col(f"inp.{name}")).otherwise(F.col(f"cur.{name}")).alias(name))
    if cfg.has_path:
        # format_string (not concat_ws, which SKIPS nulls): a NULL path value
        # must append the literal "null" to match the reference's
        # String.format-based path building (HierarchyFlattener.java:179-181).
        cols.append(
            F.when(
                hit,
                F.concat(
                    F.col(f"cur.{cfg.path_alias_field}"),
                    F.format_string(
                        "%s%s",
                        F.lit(cfg.path_separator),
                        F.col(f"inp.{cfg.path_field}").cast("string"),
                    ),
                ),
            )
            .otherwise(F.col(f"cur.{cfg.path_alias_field}"))
            .alias(cfg.path_alias_field)
        )
    for alias in cfg.connect_by_root_map.values():
        cols.append(F.col(f"cur.{alias}").alias(alias))
    joined = cur.join(
        inp,
        F.col(f"cur.{cfg.child_field}") == F.col(f"inp.{cfg.parent_field}"),
        "left_outer",
    )
    return joined.select(*cols)


def flatten(df: DataFrame, cfg: FlattenConfig) -> DataFrame:
    """Flatten an edge-list DataFrame per the reference semantics.

    Returns a DataFrame with the schema ``cfg.output_schema(df.schema)``
    (input columns + level + bottom [+ path alias] [+ root aliases]).

    Scale notes: the edge table is persisted once (the join's build side is
    re-read every level — reference :134-135 uses DISK_ONLY; we default to
    MEMORY_AND_DISK). ``cfg.broadcast_input=True`` pins a broadcast hash
    join per level. The frontier is localCheckpoint'ed every
    ``cfg.checkpoint_every`` levels so the logical plan stays shallow.
    """
    cfg.validate(df.schema)
    data_fields = [n for n in df.columns if n not in (cfg.parent_field, cfg.child_field)]

    edges = df.persist(StorageLevel.MEMORY_AND_DISK)
    join_side = F.broadcast(edges) if cfg.broadcast_input else edges

    try:
        frontier = _seed(df, cfg)
        levels: list[DataFrame] = [frontier]
        level = 1
        while not frontier.isEmpty():
            if level > cfg.max_depth:
                raise MaxDepthExceededError(
                    f"Exceeded maximum depth of {cfg.max_depth}. Ensure there are no "
                    "cycles in the hierarchy, or increase max_depth."
                )
            nxt = _advance(frontier, join_side, cfg, data_fields)
            if level % cfg.checkpoint_every == 0:
                # truncate lineage: without this, level k's plan nests k joins
                nxt = nxt.localCheckpoint(eager=True)
            levels.append(nxt)
            frontier = nxt.where(F.col(cfg.bottom_field) != 1)
            level += 1
    finally:
        # the fixpoint loop is the only consumer of the cache: with the
        # default checkpoint_every=1 every level is an eager localCheckpoint,
        # so the returned plan no longer references edges and repeated
        # flatten() calls in a long session don't accumulate cached RDDs.
        # (With checkpoint_every=k>1, up to k-1 trailing levels recompute
        # from the last checkpoint on final materialization — bounded cost,
        # correctness unaffected.)
        edges.unpersist(blocking=False)

    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)

    # collapse leaf-marker duplicates + multi-path same-level duplicates
    aggs: list[Column] = [(F.max(cfg.bottom_field) != 0).alias(cfg.bottom_field)]
    order_col = F.col(cfg.path_alias_field) if cfg.has_path else None
    for name in data_fields:
        # constant within group (both hit/miss rows carry the input edge's
        # payload), so min_by/first are equivalent; first() is cheapest
        aggs.append(F.first(name).alias(name))
    if cfg.has_path:
        aggs.append(F.min(cfg.path_alias_field).alias(cfg.path_alias_field))
    for alias in cfg.connect_by_root_map.values():
        if order_col is not None:
            aggs.append(F.min_by(alias, order_col).alias(alias))  # root of the min path: deterministic
        else:
            aggs.append(F.min(alias).alias(alias))
    out = out.groupBy(cfg.parent_field, cfg.child_field, cfg.level_field).agg(*aggs)

    ordered = cfg.output_schema(df.schema).fieldNames()
    return out.select(*ordered)
