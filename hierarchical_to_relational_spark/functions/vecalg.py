"""Codegen-able fixed-dimension vector arithmetic.

Catalyst evaluates higher-order functions (``zip_with`` / ``aggregate`` /
``transform``) on the interpreted path — they are excluded from whole-stage
codegen, costing roughly a microsecond per element, and a single-split
input (one parquet row group) runs that cost on ONE core. For a known
dimension ``d`` the same fold unrolls into a flat arithmetic expression
over ``GetArrayItem`` which codegens to straight-line JVM bytecode
(guide §4.2 applied inside the JVM: vectorize the per-row work without
crossing into Python).

Bit-identity contract: the flat form replays the exact left-associative
fold order of the HOF form — ``((0 + x0·y0) + x1·y1) + ...`` — including
the explicit zero init, so doubles accumulate identically and the DuckDB
oracles (which replay the same order) stay hash-equal. Rows whose array
size differs from ``dim`` fall back to the dynamic HOF form via a size
guard, preserving the null/padding semantics of ``zip_with`` for ragged
data; conditional branches are evaluated lazily so the guarded index
accesses are safe under ANSI mode.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _fold(init: Column, terms: list[Column]) -> Column:
    out = init
    for t in terms:
        out = out + t
    return out


def dot(a: Column, b: Column, dim: int | None = None, acc: str = "double") -> Column:
    """Dot product of two array columns. With ``dim``: unrolled, codegen-able,
    guarded on both sizes; without: the dynamic HOF fold (previous form)."""
    zero = F.lit(0).cast(acc)
    dyn = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), zero, lambda s, x: s + x)
    if dim is None:
        return dyn
    flat = _fold(zero, [a[i] * b[i] for i in range(dim)])
    return F.when((F.size(a) == dim) & (F.size(b) == dim), flat).otherwise(dyn)


def sq_norm(a: Column, dim: int | None = None, acc: str = "double") -> Column:
    """Sum of squares of an array column (same unroll/guard contract)."""
    zero = F.lit(0).cast(acc)
    dyn = F.aggregate(a, zero, lambda s, x: s + x * x)
    if dim is None:
        return dyn
    flat = _fold(zero, [a[i] * a[i] for i in range(dim)])
    return F.when(F.size(a) == dim, flat).otherwise(dyn)


def vec_dim(df, vec_col: str) -> int | None:
    """Best-effort dimension probe: size of the column on one row (None for
    an empty input). One tiny job at plan-construction time; callers use the
    result only to pick the unrolled fast path — the size guard keeps
    results identical even if other rows differ."""
    row = df.select(F.size(F.col(vec_col).cast("array<double>")).alias("d")).first()
    if row is None or row["d"] is None or row["d"] <= 0:
        return None
    return int(row["d"])
