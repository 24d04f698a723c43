"""Physical-plan assertions: the plans Catalyst produces for our operators
must have the properties the 100 TB design depends on — filter/column
pushdown into the parquet scan, broadcast joins for dimension tables,
partial (map-side) aggregation for the LWW core, and no Python (BatchEval)
on any hot path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import sys

sys.path.insert(0, "/root/repo")
import __spark_entry__ as E
from hierarchical_to_relational_spark.operators.merge import lww_latest

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_and_column_pushdown(spark):
    """A filtered 2-column projection must push both the predicate and the
    read schema into the parquet scan."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    df = li.where(F.col("l_shipdate") < "1996-01-01").select("l_orderkey", "l_quantity")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate" in plan
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double" in plan


def test_dimension_joins_are_broadcast(spark):
    plan = plan_of(E.queries()["join_region_revenue"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_lww_uses_two_phase_aggregation(spark):
    """The LWW core must be a two-phase aggregation with map-side partial
    combine (the skew/shuffle-volume defence): a partial_max_by BEFORE the
    exchange, exactly one exchange, and no Window operator. (Spark plans
    max_by with a struct buffer as SortAggregate — the partial combine is
    the property that matters, not the agg's internal sort.)"""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    df = lww_latest(ev, ["user_id", "event_type"], ["ts", "event_id"])
    plan = plan_of(df)
    assert "partial_max_by" in plan  # map-side combine before the shuffle
    assert plan.count("Exchange") == 1  # one shuffle, of partials only
    assert "Window" not in plan


def test_no_python_eval_on_hot_paths(spark):
    """Every contract query must stay JVM-side: no row-at-a-time Python
    (BatchEvalPython) anywhere; Arrow stages (ArrowEvalPython) only where
    a vectorized UDF is deliberate (none in the contract queries)."""
    for name, fn in E.queries().items():
        plan = plan_of(fn(spark, SF))
        assert "BatchEvalPython" not in plan, f"{name} has row-at-a-time Python"
        assert "ArrowEvalPython" not in plan, f"{name} unexpectedly uses a Python UDF"


def test_flatten_level_join_is_broadcast_when_hinted(spark):
    """With broadcast_input, every per-level expansion join is a broadcast
    hash join (no shuffle per level). checkpoint_every is raised so the
    join survives in the returned plan instead of being truncated by the
    per-level localCheckpoint."""
    from hierarchical_to_relational_spark import FlattenConfig, flatten

    df = spark.createDataFrame([(1, 2), (2, 3)], "parent int, child int")
    out = flatten(
        df,
        FlattenConfig(parent_field="parent", child_field="child",
                      broadcast_input=True, checkpoint_every=1000),
    )
    out.collect()  # finalize the adaptive plan
    plan = plan_of(out)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_whole_stage_codegen_on_scan_pipeline(spark):
    """The scan→project→aggregate pipeline runs inside whole-stage codegen
    stages (rendered as '*(n)' markers in the final adaptive plan)."""
    df = E.queries()["agg_pricing"](spark, SF)
    df.collect()  # finalize the adaptive plan
    plan = plan_of(df)
    assert "*(" in plan and "isFinalPlan=true" in plan
