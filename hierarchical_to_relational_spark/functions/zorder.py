"""Z-order (Morton-interleave) clustering expression for multi-column
file skipping.

Range-clustering a rewrite on ONE column (``repartitionByRange(bucket,
col)``) gives every written file a tight min-max for that column and a
useless full-range bound for every other. Z-ordering interleaves the bits
of several columns' rank indexes so a contiguous z range is a small
hyper-rectangle in ALL of them — each written file then carries tight-ish
footer bounds on every z column simultaneously, and the min-max sidecar
(snapshot_table._footer_stats) prunes point/range reads on any of them.
Same mechanism as Delta Lake / Iceberg ``OPTIMIZE ZORDER BY``.

Shape for scale: one ``approx_count_distinct`` pass + one deterministic
hash-threshold sample per column to pick ≤256 range boundaries (driver
holds ≤ ~20k sampled values per column, independent of table size); the
z-value itself is pure JVM Column algebra (array binary-search via
``size(filter(...))`` + shift/OR bit interleave) — no UDF, no extra
shuffle beyond the rewrite's own ``repartitionByRange``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

ZBITS = 8  # 256 rank buckets per column → 2*ZBITS-bit z for two columns


def _boundaries(df: DataFrame, col: str, n_ranges: int = 1 << ZBITS) -> list:
    """≤ ``n_ranges - 1`` sorted range boundaries for ``col``, from a
    deterministic hash-threshold sample (same sample for the same data —
    xxhash64, no RNG). Cheap relative to the rewrite this clusters."""
    n = df.select(F.approx_count_distinct(col).alias("n")).first()["n"]
    if n == 0:
        return []
    p = max(1, n // 20_000)  # expected ≤ ~20k sampled distinct values
    sample = (
        df.select(col)
        .where(F.col(col).isNotNull())
        .where(F.pmod(F.xxhash64(F.col(col)), F.lit(p)) == 0)
        .distinct()
        .collect()
    )
    vals = sorted(r[0] for r in sample)
    if len(vals) <= 1:
        return vals
    step = len(vals) / n_ranges
    picks = {int(step * i) for i in range(1, n_ranges)}
    return [vals[i] for i in sorted(picks) if 0 < i < len(vals)]


def _rank_index(col: str, bounds: list) -> Column:
    """Rank bucket of ``col`` among ``bounds``: count boundaries ≤ value
    (binary-search semantics via a filtered literal array — JVM-side,
    no UDF). Nulls rank first (index 0)."""
    if not bounds:
        return F.lit(0)
    arr = F.array(*[F.lit(b) for b in bounds])
    return F.when(F.col(col).isNull(), F.lit(0)).otherwise(
        F.size(F.filter(arr, lambda b: b <= F.col(col)))
    )


def zorder_expr(df: DataFrame, cols: list[str], bits: int = ZBITS) -> Column:
    """Morton z-value Column over ``cols`` for ``df``'s data distribution:
    per-column rank index (sampled range boundaries), bits interleaved
    round-robin (column 0 owns the most-significant position in each
    round). Use as the range-partitioning key of a clustering rewrite::

        out.repartitionByRange(F.col("_bucket"), zorder_expr(out, cols))
    """
    if not cols:
        raise ValueError("zorder_expr needs at least one column")
    idx = [_rank_index(c, _boundaries(df, c, 1 << bits)).cast("long") for c in cols]
    z = F.lit(0).cast("long")
    for bit in range(bits - 1, -1, -1):
        for c_i, ix in enumerate(idx):
            pos = bit * len(idx) + (len(idx) - 1 - c_i)
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(ix, bit).bitwiseAND(F.lit(1)), pos)
            )
    return z
