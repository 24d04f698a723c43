"""Golden-output tests for the flatten operator.

Each test mirrors one reference pipeline test
(HierarchyToRelationalTest.java, cited per test); expected sets are the
reference's golden records verbatim, compared order-insensitively.
"""

from __future__ import annotations

import pytest

from hierarchical_to_relational_spark import FlattenConfig, flatten
from hierarchical_to_relational_spark.operators.flatten import MaxDepthExceededError
from hierarchical_to_relational_spark.config import ConfigValidationError

from tests.conftest import rows_as_set


GROCERY_ROWS = [
    (1, 2, "Groceries", "Produce", "A", 50),
    (1, 3, "Groceries", "Dairy", "B", 40),
    (2, 4, "Produce", "Vegetables", "C", 50),
    (4, 6, "Vegetables", "Onion", "E", 30),
    (2, 7, "Produce", "Fruits", "F", 40),
    (3, 8, "Dairy", "Milk", "D", 60),
]
GROCERY_COLS = ["ParentId", "ChildId", "ParentProduct", "ChildProduct", "Supplier", "Sales"]

# HierarchyToRelationalTest.java:126-151 (testDatasetWithoutRootElement golden)
GROCERY_EXPECTED = {
    (1, 3, "Groceries", "Dairy", "B", 40, 1, False, "/Groceries", "Groceries"),
    (1, 2, "Groceries", "Produce", "A", 50, 1, False, "/Groceries", "Groceries"),
    (2, 4, "Produce", "Vegetables", "C", 50, 1, False, "/Produce", "Produce"),
    (2, 7, "Produce", "Fruits", "F", 40, 1, True, "/Produce", "Produce"),
    (3, 8, "Dairy", "Milk", "D", 60, 1, True, "/Dairy", "Dairy"),
    (4, 6, "Vegetables", "Onion", "E", 30, 1, True, "/Vegetables", "Vegetables"),
    (3, 8, "Dairy", "Milk", "D", 60, 2, True, "/Groceries/Dairy", "Groceries"),
    (2, 4, "Produce", "Vegetables", "C", 50, 2, False, "/Groceries/Produce", "Groceries"),
    (2, 7, "Produce", "Fruits", "F", 40, 2, True, "/Groceries/Produce", "Groceries"),
    (4, 6, "Vegetables", "Onion", "E", 30, 2, True, "/Produce/Vegetables", "Produce"),
    (4, 6, "Vegetables", "Onion", "E", 30, 3, True, "/Groceries/Produce/Vegetables", "Groceries"),
}

GROCERY_CFG = dict(
    parent_field="ParentId",
    child_field="ChildId",
    level_field="levelField",
    bottom_field="bottomField",
    path_field="ParentProduct",
    path_alias_field="pathField",
    connect_by_root="ParentProduct=rootField",
)


def _grocery_df(spark, extra_rows=()):
    return spark.createDataFrame(
        list(GROCERY_ROWS) + list(extra_rows),
        schema="ParentId int, ChildId int, ParentProduct string, ChildProduct string, Supplier string, Sales int",
    )


def test_grocery_full_feature(spark):
    """testDatasetWithoutRootElement (:359-396): level/bottom/path/root."""
    out = flatten(_grocery_df(spark), FlattenConfig(**GROCERY_CFG))
    assert out.columns == GROCERY_COLS + ["levelField", "bottomField", "pathField", "rootField"]
    assert rows_as_set(out) == GROCERY_EXPECTED


def test_grocery_with_self_loop_root(spark):
    """testDatasetWithRootElement (:398-435): a self-loop root row 1→1 is
    dropped at the seed stage; output identical."""
    df = _grocery_df(spark, extra_rows=[(1, 1, "Groceries", "Groceries", None, 0)])
    out = flatten(df, FlattenConfig(**GROCERY_CFG))
    assert rows_as_set(out) == GROCERY_EXPECTED


def test_multiple_roots_dag(spark):
    """testMultipleRoots (:163-273): string keys, two paths to node 6,
    every edge seeds, connect-by-root child=root, path on child."""
    df = spark.createDataFrame(
        [("1", "2"), ("1", "4"), ("2", "3"), ("3", "6"), ("4", "6"), ("5", "6")],
        schema="parent string, child string",
    )
    cfg = FlattenConfig(
        parent_field="parent",
        child_field="child",
        path_field="child",
        path_alias_field="path",
        connect_by_root="child=root",
    )
    out = flatten(df, cfg)
    expected = {
        ("1", "2", 1, False, "/2", "2"),
        ("1", "4", 1, False, "/4", "4"),
        ("2", "3", 1, False, "/3", "3"),
        ("3", "6", 1, True, "/6", "6"),
        ("4", "6", 1, True, "/6", "6"),
        ("5", "6", 1, True, "/6", "6"),
        ("2", "3", 2, False, "/2/3", "2"),
        ("4", "6", 2, True, "/4/6", "4"),
        ("3", "6", 2, True, "/3/6", "3"),
        ("3", "6", 3, True, "/2/3/6", "2"),
    }
    assert rows_as_set(out) == expected


def test_start_with(spark):
    """testStartWith (:276-356): SQL-predicate seeding + custom separator."""
    df = spark.createDataFrame(
        [("1", "2"), ("1", "4"), ("2", "3"), ("3", "6"), ("4", "6"), ("5", "6")],
        schema="parent string, child string",
    )
    cfg = FlattenConfig(
        parent_field="parent",
        child_field="child",
        path_field="parent",
        path_alias_field="path",
        path_separator="|",
        start_with="parent == 2 OR parent == 5",
    )
    out = flatten(df, cfg)
    expected = {
        ("2", "3", 1, False, "|2"),
        ("5", "6", 1, True, "|5"),
        ("3", "6", 2, True, "|2|3"),
    }
    assert rows_as_set(out) == expected


def test_disjoint_hierarchies(spark):
    """testDisjointHierarchies (:437-530): forest components flatten
    independently; multi-parent node."""
    df = spark.createDataFrame(
        [
            (1, 2, "vegetable"),
            (1, 3, "dairy"),
            (2, 5, "lettuce"),
            (2, 6, "tomato"),
            (4, 6, "tomato"),
            (7, 8, "water"),
        ],
        schema="parent int, child int, category string",
    )
    cfg = FlattenConfig(
        parent_field="parent", child_field="child", path_field="category", path_alias_field="path"
    )
    out = flatten(df, cfg)
    expected = {
        (1, 2, "vegetable", 1, False, "/vegetable"),
        (1, 3, "dairy", 1, True, "/dairy"),
        (2, 5, "lettuce", 1, True, "/lettuce"),
        (2, 6, "tomato", 1, True, "/tomato"),
        (4, 6, "tomato", 1, True, "/tomato"),
        (7, 8, "water", 1, True, "/water"),
        (2, 5, "lettuce", 2, True, "/vegetable/lettuce"),
        (2, 6, "tomato", 2, True, "/vegetable/tomato"),
    }
    assert rows_as_set(out) == expected


def test_one_level_hierarchy(spark):
    """testOneLevelHierarchy (:532-578): single edge, maxDepth=1."""
    df = spark.createDataFrame([(1, 2)], schema="parent int, child int")
    out = flatten(df, FlattenConfig(parent_field="parent", child_field="child", max_depth=1))
    assert rows_as_set(out) == {(1, 2, 1, True)}


def test_multiple_connect_by_roots(spark):
    """testMultipleConnectByRoots (:580-638): chain 1→2→3, two root
    mappings frozen per seed."""
    df = spark.createDataFrame([(1, 2), (2, 3)], schema="parent int, child int")
    cfg = FlattenConfig(
        parent_field="parent", child_field="child", connect_by_root="parent=root1;child=root2"
    )
    out = flatten(df, cfg)
    expected = {
        (1, 2, 1, False, 1, 2),
        (2, 3, 1, True, 2, 3),
        (2, 3, 2, True, 1, 2),
    }
    assert rows_as_set(out) == expected


def test_cycle_raises_max_depth(spark):
    """Mid-tree cycle recurses until the guard throws
    (HierarchyFlattener.java:216-219; docs claim self-loops are ignored but
    that holds only at the seed stage — SURVEY.md §5.3)."""
    df = spark.createDataFrame([(1, 2), (2, 1)], schema="parent int, child int")
    with pytest.raises(MaxDepthExceededError):
        flatten(df, FlattenConfig(parent_field="parent", child_field="child", max_depth=5))


def test_checkpoint_cadence_equivalent(spark):
    """checkpoint_every must not change results, only plan depth."""
    df = _grocery_df(spark)
    out = flatten(df, FlattenConfig(**GROCERY_CFG, checkpoint_every=3))
    assert rows_as_set(out) == GROCERY_EXPECTED


def test_broadcast_input_equivalent(spark):
    """broadcast_input pins a broadcast hash join per level; same results."""
    df = _grocery_df(spark)
    out = flatten(df, FlattenConfig(**GROCERY_CFG, broadcast_input=True))
    assert rows_as_set(out) == GROCERY_EXPECTED


class TestConfigValidation:
    """Mirrors HierarchyConfigTest.java (117 LoC, SURVEY.md §5.2)."""

    def _schema(self, spark):
        return spark.createDataFrame([(1, 2, "x")], "parent int, child int, category string").schema

    def test_path_without_alias(self, spark):
        cfg = FlattenConfig(parent_field="parent", child_field="child", path_field="category")
        with pytest.raises(ConfigValidationError, match="together"):
            cfg.validate(self._schema(spark))

    def test_unknown_path_field(self, spark):
        cfg = FlattenConfig(
            parent_field="parent", child_field="child", path_field="nope", path_alias_field="path"
        )
        with pytest.raises(ConfigValidationError, match="nope"):
            cfg.validate(self._schema(spark))

    def test_alias_without_path(self, spark):
        cfg = FlattenConfig(parent_field="parent", child_field="child", path_alias_field="path")
        with pytest.raises(ConfigValidationError, match="together"):
            cfg.validate(self._schema(spark))

    def test_unknown_connect_by_root_field(self, spark):
        cfg = FlattenConfig(parent_field="parent", child_field="child", connect_by_root="nope=r")
        with pytest.raises(ConfigValidationError, match="nope"):
            cfg.validate(self._schema(spark))

    def test_parent_equals_child(self, spark):
        cfg = FlattenConfig(parent_field="parent", child_field="parent")
        with pytest.raises(ConfigValidationError, match="cannot be the same"):
            cfg.validate(self._schema(spark))

    def test_defaults_and_output_schema(self, spark):
        """Defaults Level/Bottom/50/'/' + derived schema
        (HierarchyConfigTest.java:93-116)."""
        cfg = FlattenConfig(parent_field="parent", child_field="child")
        assert cfg.level_field == "Level"
        assert cfg.bottom_field == "Bottom"
        assert cfg.max_depth == 50
        assert cfg.path_separator == "/"
        schema = cfg.output_schema(self._schema(spark))
        assert schema.fieldNames() == ["parent", "child", "category", "Level", "Bottom"]
        assert schema["Level"].dataType.simpleString() == "int"
        assert schema["Bottom"].dataType.simpleString() == "boolean"

    def test_multiple_failures_collected(self, spark):
        cfg = FlattenConfig(parent_field="nope1", child_field="nope2", max_depth=0)
        with pytest.raises(ConfigValidationError) as ei:
            cfg.validate(self._schema(spark))
        assert len(ei.value.failures) == 3


def test_null_path_value_renders_literal_null(spark):
    """A NULL path_field value renders as the literal "null" in the path —
    the reference builds paths with String.format (HierarchyFlattener.java:
    179-181), where %s of null is "null"; a naive concat would instead null
    out the whole path and corrupt min(path)/min_by(root) aggregation."""
    df = spark.createDataFrame(
        [(1, 2, None, "Produce", "A", 50), (2, 4, "Produce", "Vegetables", "C", 30)],
        schema="ParentId int, ChildId int, ParentProduct string, ChildProduct string, Supplier string, Sales int",
    )
    out = flatten(df, FlattenConfig(**GROCERY_CFG))
    paths = {(r["ParentId"], r["ChildId"], r["levelField"]): r["pathField"] for r in out.collect()}
    assert paths[(1, 2, 1)] == "/null"
    assert paths[(2, 4, 2)] == "/null/Produce"
    # root column is frozen at the seed: stays NULL (reference copies the
    # raw value, not the formatted path)
    roots = {(r["ParentId"], r["ChildId"], r["levelField"]): r["rootField"] for r in out.collect()}
    assert roots[(2, 4, 2)] is None
