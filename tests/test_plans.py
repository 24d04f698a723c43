"""Design-time schema propagation (dry run, reference O25): schemas derived
without executing must equal what the runtime stages actually produce."""

from __future__ import annotations

from pyspark.sql import types as T

from hierarchical_to_relational_spark import FlattenConfig, flatten
from hierarchical_to_relational_spark.plans import (
    plan_cdc_table,
    plan_flatten,
    plan_normalize,
    plan_pipeline,
)
from hierarchical_to_relational_spark.operators.normalize import normalize_envelopes
from hierarchical_to_relational_spark.sources.binlog import envelope_schema


def _nullable(schema: T.StructType) -> list[str]:
    return schema.fieldNames()


def test_plan_flatten_matches_runtime(spark):
    df = spark.createDataFrame([(1, 2, "x")], "parent int, child int, category string")
    cfg = FlattenConfig(parent_field="parent", child_field="child",
                        path_field="category", path_alias_field="path",
                        connect_by_root="category=root")
    planned = plan_flatten(df.schema, cfg)
    actual = flatten(df, cfg).schema
    assert planned.fieldNames() == actual.fieldNames()
    assert [f.dataType for f in planned.fields] == [f.dataType for f in actual.fields]


def test_plan_normalize_matches_runtime(spark):
    env_schema = envelope_schema([T.StructField("model", T.StringType(), True)])
    env = spark.createDataFrame([], env_schema)
    ups, dels = normalize_envelopes(env, text_mode="none")
    p_ups, p_dels = plan_normalize(env_schema)
    assert ups.schema.fieldNames() == p_ups.fieldNames()
    assert dels.schema.fieldNames() == p_dels.fieldNames()
    assert [f.dataType for f in ups.schema.fields] == [f.dataType for f in p_ups.fields]


def test_plan_pipeline_surface():
    plans = plan_pipeline(envelope_schema())
    assert plans["read"].fieldNames() == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert plans["table"].fieldNames()[-3:] == ["_lsn", "_commit_ts", "_op"]
    assert plan_cdc_table(envelope_schema()).fieldNames() == plans["table"].fieldNames()
