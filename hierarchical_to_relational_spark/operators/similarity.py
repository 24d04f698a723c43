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
    probe_hamming: int = 0,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's
    hyperplane sign bucket. Recall < 1.0 by construction; used as the
    candidate generator at scale.

    ``probe_hamming`` is the recall/cost knob (multi-probe LSH): 0 probes
    the exact bucket only; 1 additionally probes every bucket one bit-flip
    away (n_planes+1 buckets per query — candidates grow ~linearly in
    n_planes while recall recovers the neighbors that fell just across one
    hyperplane, the dominant LSH failure mode)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("bucket", hyperplane_bucket(F.col("qv"), n_planes, seed))
    if probe_hamming >= 1:
        probes = F.array(F.col("bucket"), *[
            F.col("bucket").bitwiseXOR(F.lit(2 ** j)) for j in range(n_planes)
        ])
        q = q.withColumn("bucket", F.explode(probes))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("bucket", hyperplane_bucket(F.col("cv"), n_planes, seed))
    scored = (
        c.join(F.broadcast(q), (F.col("query_id") != F.col("neighbor_id")) & (q["bucket"] == c["bucket"]))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos"))
    )
    if probe_hamming >= 1:
        # a neighbor can match several probe buckets; single-probe pairs
        # are already unique — don't pay the dedup exchange there
        scored = scored.distinct()
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cos"))
    )


# ---------- IVF (inverted-file) ANN ----------

def _unit(v):
    n = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    return F.when(n > 0, F.transform(v, lambda x: x / n))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def ivf_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_iters: int = 4,
    seed: int = 0,
) -> DataFrame:
    """Deterministic spherical k-means centroids ``(cell, cvec)``.

    Init: the ``n_cells`` corpus vectors with the smallest
    ``xxhash64(seed, id)`` — a replay-stable pseudo-random sample (no RNG
    state, same result at any parallelism). Each Lloyd iteration is one
    broadcast-join assignment plus one (cell, dim) hash aggregation —
    centroid recomputation shuffles n_cells×dim partial means, never
    vectors. All JVM column algebra; no Python on the hot path."""
    spark = corpus.sparkSession
    v = corpus.select(
        F.col(id_col).alias("_id"),
        _unit(F.col(vec_col).cast("array<double>")).alias("v"),
    ).where(F.col("v").isNotNull()).persist()

    def materialize(df: DataFrame) -> DataFrame:
        # Centroids are n_cells×dim doubles — METADATA, not data: collect
        # and rebuild as literals so each Lloyd iteration's plan starts
        # fresh. Leaving them lazy nests the whole iteration chain and
        # re-executes it at every downstream reference (plan blow-up).
        # a cell of antipodal vectors can have a zero-norm mean (_unit ->
        # NULL): drop it — k-means simply proceeds with fewer cells
        rows = [(int(r["cell"]), [float(x) for x in r["cvec"]])
                for r in df.collect() if r["cvec"] is not None]
        return spark.createDataFrame(rows, "cell int, cvec array<double>")

    w = Window.orderBy("_h")
    cent = materialize(
        v.withColumn("_h", F.xxhash64(F.lit(seed), F.col("_id")))
        .orderBy("_h").limit(n_cells)
        .withColumn("cell", F.row_number().over(w) - 1)
        .select("cell", F.col("v").alias("cvec"))
    )
    for _ in range(n_iters):
        assigned = _assign_cells(v, cent)
        by_dim = assigned.select("cell", F.posexplode("v").alias("pos", "x"))
        means = by_dim.groupBy("cell", "pos").agg(F.avg("x").alias("x"))
        cent = materialize(
            means.groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "x"))).alias("s"))
            .select("cell", _unit(F.transform("s", lambda t: t["x"])).alias("cvec"))
        )
    v.unpersist(blocking=False)
    return cent


def _assign_cells(v: DataFrame, cent: DataFrame) -> DataFrame:
    """(id, v) × broadcast(centroids) → nearest cell per vector (max dot on
    unit vectors == max cosine). max_by hash agg, no window."""
    j = v.crossJoin(F.broadcast(cent)).withColumn("_d", _dot(F.col("v"), F.col("cvec")))
    packed = j.groupBy("_id").agg(
        F.max_by(F.struct("cell", "v"), F.struct(F.col("_d"), (-F.col("cell")).alias("_t"))).alias("_r")
    )
    return packed.select("_id", F.col("_r.cell").alias("cell"), F.col("_r.v").alias("v"))


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    n_iters: int = 4,
    seed: int = 0,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors are indexed into ``n_cells``
    k-means cells; each query scores only the ``n_probe`` nearest cells.
    Candidate work drops ~n_probe/n_cells vs brute force with a measured
    recall/cost knob (raise n_probe → recall→1, cost→brute force).
    Cosine on unit vectors, ties broken by neighbor id (deterministic)."""
    cent = ivf_centroids(corpus, id_col, vec_col, n_cells, n_iters, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _unit(F.col(vec_col).cast("array<double>")).alias("cv"),
    ).where(F.col("cv").isNotNull())
    c_cells = _assign_cells(c.withColumnRenamed("neighbor_id", "_id").withColumnRenamed("cv", "v"), cent) \
        .select(F.col("_id").alias("neighbor_id"), "cell", F.col("v").alias("cv"))

    q = queries.select(
        F.col(id_col).alias("query_id"),
        _unit(F.col(vec_col).cast("array<double>")).alias("qv"),
    ).where(F.col("qv").isNotNull())
    qc = q.crossJoin(F.broadcast(cent)).withColumn("_d", _dot(F.col("qv"), F.col("cvec")))
    wq = Window.partitionBy("query_id").orderBy(F.col("_d").desc(), F.col("cell"))
    probes = (
        qc.withColumn("_r", F.row_number().over(wq))
        .where(F.col("_r") <= n_probe)
        .select("query_id", "qv", "cell")
    )
    scored = (
        c_cells.join(F.broadcast(probes), "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", _dot(F.col("qv"), F.col("cv")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cos"))
    )


def recall_at_k(approx: DataFrame, exact: DataFrame, k: int) -> float:
    """Measured recall@k: |approx∩exact| / |exact| over (query_id,
    neighbor_id) pairs with rank ≤ k. The contract number an ANN variant
    must publish against brute_force_topk."""
    a = approx.where(F.col("rank") <= k).select("query_id", "neighbor_id")
    e = exact.where(F.col("rank") <= k).select("query_id", "neighbor_id")
    denom = e.count()
    return (a.intersect(e).count() / denom) if denom else 1.0
