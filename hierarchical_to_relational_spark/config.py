"""Flatten-operator configuration: validation + output-schema derivation.

Re-expresses the reference's config surface (HierarchyConfig.java:30-263):
parent/child fields, generated level/bottom column names (defaults
``Level``/``Bottom`` — HierarchyConfig.java:43-45), max depth (default 50,
:47), START WITH SQL predicate, ``field=alias;...`` connect-by-root spec
(:220-232), path field/alias/separator (default ``/``, :52-53).

Validation collects all failures before raising (mirrors the reference's
FailureCollector pattern, HierarchyConfig.java:127-173) so a caller sees
every config error in one pass, before any Spark job is launched.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pyspark.sql import types as T

LEVEL_DEFAULT = "Level"
BOTTOM_DEFAULT = "Bottom"
MAX_DEPTH_DEFAULT = 50
PATH_SEPARATOR_DEFAULT = "/"


class ConfigValidationError(ValueError):
    """All config failures, collected (not thrown one at a time)."""

    def __init__(self, failures: list[str]):
        self.failures = failures
        super().__init__("; ".join(failures))


def parse_key_value_list(spec: str | None, pair_sep: str = ";", kv_sep: str = "=") -> dict[str, str]:
    """``"f1=alias1;f2=alias2"`` → ordered dict (reference O23,
    HierarchyConfig.java:220-232). Empty/None → {}."""
    out: dict[str, str] = {}
    if not spec:
        return out
    for pair in spec.split(pair_sep):
        pair = pair.strip()
        if not pair:
            continue
        if kv_sep not in pair:
            raise ConfigValidationError([f"Malformed key-value pair '{pair}' (expected key{kv_sep}value)"])
        k, v = pair.split(kv_sep, 1)
        out[k.strip()] = v.strip()
    return out


@dataclass
class FlattenConfig:
    """Configuration for :func:`operators.flatten.flatten`."""

    parent_field: str
    child_field: str
    level_field: str = LEVEL_DEFAULT
    bottom_field: str = BOTTOM_DEFAULT
    max_depth: int = MAX_DEPTH_DEFAULT
    start_with: str | None = None          # SQL predicate string, Catalyst-parsed
    connect_by_root: str | None = None     # "srcField=alias;..."
    path_field: str | None = None
    path_alias_field: str | None = None
    path_separator: str = PATH_SEPARATOR_DEFAULT
    # engine extensions (not in reference):
    checkpoint_every: int = 1              # truncate plan lineage every k levels
    broadcast_input: bool | None = None    # None = let Catalyst/AQE decide

    connect_by_root_map: dict[str, str] = field(init=False, default_factory=dict)

    def __post_init__(self) -> None:
        self.connect_by_root_map = parse_key_value_list(self.connect_by_root)

    @property
    def has_path(self) -> bool:
        return bool(self.path_field) and bool(self.path_alias_field)

    def validate(self, input_schema: T.StructType) -> None:
        """Collect every failure, then raise once (reference
        HierarchyConfig.java:127-173 semantics)."""
        failures: list[str] = []
        names = set(input_schema.fieldNames())

        for label, f in (("parent_field", self.parent_field), ("child_field", self.child_field)):
            if not f:
                failures.append(f"{label} must be specified")
            elif f not in names:
                failures.append(f"{label} '{f}' not found in the input schema")
        if self.parent_field and self.parent_field == self.child_field:
            failures.append("parent_field and child_field cannot be the same")
        if self.max_depth < 1:
            failures.append(f"max_depth must be at least 1, got {self.max_depth}")
        if bool(self.path_field) != bool(self.path_alias_field):
            failures.append("path_field and path_alias_field must be specified together")
        if self.path_field and self.path_field not in names:
            failures.append(f"path_field '{self.path_field}' not found in the input schema")
        for src in self.connect_by_root_map:
            if src not in names:
                failures.append(f"connect_by_root field '{src}' not found in the input schema")
        generated = [self.level_field, self.bottom_field]
        if self.has_path:
            generated.append(self.path_alias_field)
        generated += list(self.connect_by_root_map.values())
        if len(set(generated)) != len(generated):
            failures.append(f"generated column names collide: {generated}")
        for g in generated:
            if g in names:
                failures.append(f"generated column '{g}' already exists in the input schema")
        if failures:
            raise ConfigValidationError(failures)

    def output_schema(self, input_schema: T.StructType) -> T.StructType:
        """Derive output schema = input fields + appended generated columns
        (reference O21/O25, HierarchyConfig.java:239-253): level INT,
        bottom BOOLEAN, optional path-alias STRING, one copy-typed column
        per connect-by-root mapping. This is the engine's design-time
        'analyze' — no job runs."""
        fields = list(input_schema.fields)
        fields.append(T.StructField(self.level_field, T.IntegerType(), False))
        fields.append(T.StructField(self.bottom_field, T.BooleanType(), False))
        if self.has_path:
            fields.append(T.StructField(self.path_alias_field, T.StringType(), True))
        for src, alias in self.connect_by_root_map.items():
            src_field = input_schema[src]
            fields.append(T.StructField(alias, src_field.dataType, src_field.nullable))
        return T.StructType(fields)
