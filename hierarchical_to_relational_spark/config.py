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

import re
from dataclasses import dataclass, field, replace
from pyspark.sql import types as T

# Runtime-macro placeholder (reference: CDAP @Macro fields,
# HierarchyConfig.java:121-125 — validation of a macro-valued field is
# DEFERRED at design time and re-run after substitution at runtime).
MACRO_RE = re.compile(r"\$\{([^}]+)\}")


def is_macro(value) -> bool:
    return isinstance(value, str) and bool(MACRO_RE.search(value))

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
        # a macro-valued connect_by_root spec can't be parsed until runtime
        self.connect_by_root_map = (
            {} if is_macro(self.connect_by_root) else parse_key_value_list(self.connect_by_root)
        )

    @property
    def has_path(self) -> bool:
        return bool(self.path_field) and bool(self.path_alias_field)

    @property
    def macro_fields(self) -> list[str]:
        """Names of string config fields still holding ``${...}`` runtime
        macros (reference @Macro semantics: design-time validation defers
        these; they must be resolved before execution)."""
        candidates = {
            "parent_field": self.parent_field,
            "child_field": self.child_field,
            "level_field": self.level_field,
            "bottom_field": self.bottom_field,
            "start_with": self.start_with,
            "connect_by_root": self.connect_by_root,
            "path_field": self.path_field,
            "path_alias_field": self.path_alias_field,
            "path_separator": self.path_separator,
        }
        return [k for k, v in candidates.items() if is_macro(v)]

    def resolve_macros(self, values: dict[str, str]) -> "FlattenConfig":
        """Substitute ``${name}`` placeholders from ``values`` across every
        string field and return the resolved config (runtime step; callers
        validate the result). Unknown macros are left intact so a second
        resolution pass — or validate() — can flag them."""

        def sub(v):
            if not isinstance(v, str):
                return v
            return MACRO_RE.sub(lambda m: str(values.get(m.group(1), m.group(0))), v)

        return replace(
            self,
            **{
                f: sub(getattr(self, f))
                for f in ("parent_field", "child_field", "level_field", "bottom_field",
                          "start_with", "connect_by_root", "path_field",
                          "path_alias_field", "path_separator")
            },
        )

    def validate(self, input_schema: T.StructType | None = None, runtime: bool = True) -> None:
        """Collect every failure, then raise once (reference
        HierarchyConfig.java:127-173 semantics).

        Macro handling mirrors the reference's @Macro contract: with
        ``runtime=False`` (design-time/deploy-time), checks on macro-valued
        fields are DEFERRED — only macro-free fields are validated, and
        ``input_schema=None`` additionally defers all schema-dependent
        checks. At runtime (default) an unresolved macro is itself a
        failure: execution requires concrete values."""
        failures: list[str] = []
        macros = set(self.macro_fields)
        if runtime and macros:
            failures.append(
                f"unresolved runtime macros in: {sorted(macros)} (call resolve_macros first)"
            )
        names = set(input_schema.fieldNames()) if input_schema is not None else None

        def deferred(*fields_: str) -> bool:
            return bool(macros & set(fields_))

        if not deferred("parent_field"):
            if not self.parent_field:
                failures.append("parent_field must be specified")
            elif names is not None and self.parent_field not in names:
                failures.append(f"parent_field '{self.parent_field}' not found in the input schema")
        if not deferred("child_field"):
            if not self.child_field:
                failures.append("child_field must be specified")
            elif names is not None and self.child_field not in names:
                failures.append(f"child_field '{self.child_field}' not found in the input schema")
        if self.parent_field and not deferred("parent_field", "child_field") \
                and self.parent_field == self.child_field:
            failures.append("parent_field and child_field cannot be the same")
        if self.max_depth < 1:
            failures.append(f"max_depth must be at least 1, got {self.max_depth}")
        if not deferred("path_field", "path_alias_field"):
            if bool(self.path_field) != bool(self.path_alias_field):
                failures.append("path_field and path_alias_field must be specified together")
            if self.path_field and names is not None and self.path_field not in names:
                failures.append(f"path_field '{self.path_field}' not found in the input schema")
        if names is not None and not deferred("connect_by_root"):
            for src in self.connect_by_root_map:
                if src not in names:
                    failures.append(f"connect_by_root field '{src}' not found in the input schema")
        if not deferred("level_field", "bottom_field", "path_alias_field", "connect_by_root"):
            generated = [self.level_field, self.bottom_field]
            if self.has_path:
                generated.append(self.path_alias_field)
            generated += list(self.connect_by_root_map.values())
            if len(set(generated)) != len(generated):
                failures.append(f"generated column names collide: {generated}")
            if names is not None:
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
        'analyze' — no job runs. With unresolved macros the schema is
        unknown until runtime → None (reference returns a null schema when
        @Macro fields are set, HierarchyToRelational.java configurePipeline
        pattern)."""
        if self.macro_fields:
            return None
        fields = list(input_schema.fields)
        fields.append(T.StructField(self.level_field, T.IntegerType(), False))
        fields.append(T.StructField(self.bottom_field, T.BooleanType(), False))
        if self.has_path:
            fields.append(T.StructField(self.path_alias_field, T.StringType(), True))
        for src, alias in self.connect_by_root_map.items():
            src_field = input_schema[src]
            fields.append(T.StructField(alias, src_field.dataType, src_field.nullable))
        return T.StructType(fields)
