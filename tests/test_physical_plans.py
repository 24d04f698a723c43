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


def test_lww_uses_partial_hash_aggregation(spark):
    """The LWW core must be a two-phase hash aggregation (map-side partial
    combine = the skew defence), not a window sort."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    df = lww_latest(ev, ["user_id", "event_type"], ["ts", "event_id"])
    plan = plan_of(df)
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert "Window" not in plan
    assert "Sort" not in plan.split("Exchange")[0]  # no sort on the final agg


def test_no_python_eval_on_hot_paths(spark):
    """Every contract query must stay JVM-side: no row-at-a-time Python
    (BatchEvalPython) anywhere; Arrow stages (ArrowEvalPython) only where
    a vectorized UDF is deliberate (none in the contract queries)."""
    for name, fn in E.queries().items():
        plan = plan_of(fn(spark, SF))
        assert "BatchEvalPython" not in plan, f"{name} has row-at-a-time Python"
        assert "ArrowEvalPython" not in plan, f"{name} unexpectedly uses a Python UDF"


def test_flatten_level_join_is_broadcast_when_hinted(spark):
    from hierarchical_to_relational_spark import FlattenConfig, flatten

    df = spark.createDataFrame([(1, 2), (2, 3)], "parent int, child int")
    out = flatten(df, FlattenConfig(parent_field="parent", child_field="child", broadcast_input=True))
    assert "BroadcastHashJoin" in plan_of(out)


def test_whole_stage_codegen_on_scan_pipeline(spark):
    df = E.queries()["agg_pricing"](spark, SF)
    assert "WholeStageCodegen" in plan_of(df)
