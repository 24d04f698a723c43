"""Similarity search over embedding columns: brute-force cosine top-k
(exact baseline) and an LSH-bucketed approximate variant (the scale path).

Brute force is a blocked cross join + per-query top-k — exact, O(Q×N),
fine when Q is small (re-ranking, evaluation). The scale path hashes
vectors into random-hyperplane sign buckets (hyperplanes derived
deterministically from xxhash64 of (plane, dim) — replay-stable, no RNG
state) and only scores within matching buckets: with p planes the
candidate set shrinks ~2^p while preserving high-cosine neighbors with
known probability. All arithmetic is JVM higher-order functions; no
Python on the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from hierarchical_to_relational_spark.operators.dedup import cosine


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k neighbors per query (query_id, neighbor_id, rank).

    Deterministic: ties broken by neighbor id. The corpus side is the big
    side; queries are broadcast (small dim table pattern)."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("cv"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cos"))
    )


def hyperplane_bucket(vec_col, n_planes: int = 8, seed: int = 0):
    """Sign-bucket id in [0, 2^n_planes): bit j = sign of <v, h_j>, where
    h_j[d] = ±1 from xxhash64(seed, j, d) — deterministic pseudo-random
    hyperplanes, identical across runs and cluster sizes."""
    v = vec_col
    bits = []
    for j in range(n_planes):
        # ±1 per dimension via parity of a per-(plane, dim) hash
        dot = F.aggregate(
            F.zip_with(
                v,
                F.transform(F.sequence(F.lit(0), F.size(v) - 1),
                            lambda d: (F.pmod(F.xxhash64(F.lit(seed), F.lit(j), d), F.lit(2)) * 2 - 1).cast("double")),
                lambda x, s: x * s,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(2 ** j))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 4,
    seed: int = 0,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's
    hyperplane sign bucket. Recall < 1.0 by construction; used as the
    candidate generator at scale (multi-probe/repeat with different seeds
    to raise recall)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("bucket", hyperplane_bucket(F.col("qv"), n_planes, seed))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("bucket", hyperplane_bucket(F.col("cv"), n_planes, seed))
    scored = (
        c.join(F.broadcast(q), (F.col("query_id") != F.col("neighbor_id")) & (q["bucket"] == c["bucket"]))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cos"))
    )
