"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Scale design notes (the point of each variant):

- **exact**: one hash aggregation on a content digest — md5(text) groups,
  keep the minimum id. Shuffles digests, not documents.
- **n-gram Jaccard**: exact pairwise similarity via an inverted index
  (doc → distinct shingles → self-join on shingle). Cost is O(postings²)
  per shingle — correct but quadratic in hot shingles; it is the
  *verification* stage, run on candidate subsets, not the whole corpus.
- **MinHash + LSH**: the scale path. k permutations are simulated with
  salted md5 (portable: identical in DuckDB for the oracle); signatures are
  banded and candidates join on band buckets — cost O(docs × k) + bucket
  joins, linear-ish, no all-pairs.
- **SimHash**: per-doc 16-nibble locality-sensitive fingerprint from
  token-hash majority votes; near-dups share fingerprints (or band
  thereof). One aggregation over exploded tokens.
- **embedding cosine**: exact top-candidate filter over vector pairs; see
  operators.similarity for the ANN/LSH variant.

Everything is Column algebra — explode/aggregate/join — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from hierarchical_to_relational_spark.operators.text import shingle_array


# ---------- exact ----------

def dedup_exact(df: DataFrame, id_col: str, content_cols: list[str]) -> DataFrame:
    """Keep one row (minimum id) per exact content group; adds
    ``dup_count``. Digest-based: shuffles md5 hashes, not payloads."""
    digest = F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in content_cols]))
    return (
        df.select(F.col(id_col), digest.alias("_digest"))
        .groupBy("_digest")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
        .drop("_digest")
    )


# ---------- n-gram Jaccard ----------

def shingle_postings(df: DataFrame, id_col: str, text_col: str, k: int = 5, distinct: bool = True) -> DataFrame:
    """(id, shingle) inverted-index postings; ``distinct`` dedups per doc
    (required for Jaccard set semantics; skippable for min-aggregations
    like MinHash where duplicates don't change the result).

    Shape (r6): explode an integer position sequence, then substr in the
    downstream codegen'd projection — instead of explode(shingle_array),
    whose array of substrings is built per row by an interpreted
    higher-order ``transform``. Same rows (identical positions, identical
    substr semantics, including the short-text edge), ~25% cheaper at
    sf1.0."""
    c = F.col(text_col)
    n = F.greatest(F.length(c) - F.lit(k - 1), F.lit(0))
    post = df.select(
        F.col(id_col), c.alias("_t"), F.explode(F.sequence(F.lit(1), n)).alias("_i")
    ).select(id_col, F.substr(F.col("_t"), F.col("_i"), F.lit(k)).alias("shingle"))
    return post.distinct() if distinct else post


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    threshold: float = 0.7,
) -> DataFrame:
    """Exact Jaccard-similar pairs (id1 < id2, J ≥ threshold) via a
    shingle self-join: |A∩B| from the join, |A∪B| = |A|+|B|−|A∩B|.

    The self-join is hinted SHUFFLE_HASH (r6, same pathology as
    minhash_lsh_pairs): both sides then shuffle on the identical shingle
    key and AQE reuses the first side's shuffle stage for the second, so
    the postings pipeline (explode + substr + distinct over every
    shingle) computes ONCE. The unhinted plan broadcast one side, which
    has no exchange to reuse — the whole upstream ran twice."""
    post = shingle_postings(df, id_col, text_col, k).hint("shuffle_hash")
    sizes = post.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = post.alias("a")
    b = post.alias("b")
    inter = (
        a.join(b, (F.col(f"a.shingle") == F.col(f"b.shingle")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id1"), F.col(f"b.{id_col}").alias("id2"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sz1 = sizes.select(F.col(id_col).alias("id1"), F.col("sz").alias("sz1"))
    sz2 = sizes.select(F.col(id_col).alias("id2"), F.col("sz").alias("sz2"))
    return (
        inter.join(sz1, "id1")
        .join(sz2, "id2")
        .withColumn("jaccard", F.col("inter") / (F.col("sz1") + F.col("sz2") - F.col("inter")))
        .where(F.col("jaccard") >= threshold)
        .select("id1", "id2", F.round("jaccard", 6).alias("jaccard"))
    )


# ---------- MinHash + LSH ----------

# Affine-permutation constants for MinHash: h_i(x) = (A_i·x + B_i) mod P.
# P = 2^31 − 1 (prime); base hash x < 2^28 (first 7 hex chars of md5), so
# A·x + B < 2^59 — exact in 64-bit signed arithmetic in ANY engine (the
# DuckDB oracle replays the identical arithmetic). Constants are fixed
# (replay-stable), generated once from a seeded LCG.
MINHASH_P = 2_147_483_647


def _minhash_perms(n: int) -> list[tuple[int, int]]:
    pairs, state = [], 0x5DEECE66D
    for _ in range(n):
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
        a = state % (MINHASH_P - 1) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
        b = state % MINHASH_P
        pairs.append((a % (2**30) | 1, b % (2**30)))  # keep A·x+B < 2^59
    return pairs


def minhash_base_hash(shingle_col: Column) -> Column:
    """28-bit integer base hash of a shingle: first 7 hex chars of md5 —
    computed ONCE per posting (Spark's md5 is the expensive step; the n
    permutations are cheap integer ops on top)."""
    return F.conv(F.substring(F.md5(shingle_col), 1, 7), 16, 10).cast("long")


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    k: int = 5,
) -> DataFrame:
    """(id, m0..m{n-1}) MinHash signatures: one md5 per posting, n affine
    permutations, ONE hash aggregation computing all n mins together
    (fixed-width longs → HashAggregateExec with map-side partial combine).
    One pass over the postings, not n array traversals per doc."""
    post = shingle_postings(df, id_col, text_col, k, distinct=False)
    hashed = post.select(F.col(id_col), minhash_base_hash(F.col("shingle")).alias("hx"))
    aggs = [
        F.min((F.lit(a) * F.col("hx") + F.lit(b)) % F.lit(MINHASH_P)).alias(f"m{i}")
        for i, (a, b) in enumerate(_minhash_perms(n_hashes))
    ]
    return hashed.groupBy(id_col).agg(*aggs)


def minhash_band_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    bands: int = 4,
    k: int = 5,
) -> DataFrame:
    """(id, band, bucket) rows: the signature split into ``bands`` equal
    bands, each hashed to a bucket id. Docs sharing any (band, bucket) are
    near-dup candidates."""
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n_hashes, k)
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"m{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("|", *parts)).alias("bucket")))
    return sig.select(F.col(id_col), F.explode(F.array(*band_cols)).alias("bb")).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    bands: int = 4,
    k: int = 5,
) -> DataFrame:
    """Distinct candidate pairs (id1 < id2) sharing ≥1 LSH band bucket.
    Feed into ngram_jaccard_pairs on the candidate subset to verify.

    The self-join is hinted SHUFFLE_HASH (r6): both sides then shuffle on
    the identical (band, bucket) key and AQE reuses the first side's
    shuffle stage for the second, so the signature pipeline (the md5 of
    every shingle) computes ONCE. The unhinted plan broadcast one side,
    which has no exchange to reuse — the whole upstream ran twice
    (measured 8.3s -> 2.6s at sf1.0, identical pair set)."""
    bb = minhash_band_buckets(df, id_col, text_col, n_hashes, bands, k).hint("shuffle_hash")
    a, b = bb.alias("a"), bb.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id1"), F.col(f"b.{id_col}").alias("id2"))
        .distinct()
    )


# ---------- SimHash ----------

HEX_NIBBLE = "0123456789abcdef"


def simhash_fingerprint(
    df: DataFrame, id_col: str, text_col: str, sim_bits: int = 16, hash_fn: str = "md5"
) -> DataFrame:
    """Per-doc SimHash-style fingerprint: tokens vote per nibble position
    of hash(token); positions where the mean nibble value exceeds the
    neutral 7.5 become '1'. Emits (id, simhash) with a ``sim_bits``-char
    bitstring. One explode + one aggregation.

    ``hash_fn="md5"`` (default, the contract form): portable arithmetic
    (strpos on hex chars) so the DuckDB oracle matches bit-for-bit.
    ``hash_fn="xxhash64"``: the production path — one integer hash per
    token, nibbles via shift/mask (sim_bits ≤ 16 fits the 64-bit word);
    same output shape, ~10× cheaper, not oracle-portable."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok"),
    ).where(F.length("tok") > 0)
    # materialize the digest once per token; nibble extracts are then cheap
    if hash_fn == "md5":
        hashed = toks.select(id_col, F.md5(F.col("tok")).alias("h"))
        nib_vals = [
            (F.instr(F.lit(HEX_NIBBLE), F.substring(F.col("h"), i + 1, 1)) - 1).alias(f"n{i}")
            for i in range(sim_bits)
        ]
    else:
        if sim_bits > 16:
            # Java shift amounts wrap mod 64: nibble 16 would silently
            # duplicate nibble 0 and the extra bits would carry no signal
            raise ValueError(
                f"hash_fn='xxhash64' supports sim_bits <= 16 (64-bit word); got {sim_bits}"
            )
        hashed = toks.select(id_col, F.xxhash64(F.col("tok")).alias("h"))
        nib_vals = [
            F.shiftrightunsigned(F.col("h"), 4 * i).bitwiseAND(F.lit(15)).alias(f"n{i}")
            for i in range(sim_bits)
        ]
    votes = hashed.select(id_col, *nib_vals).groupBy(id_col).agg(
        *[F.avg(f"n{i}").alias(f"n{i}") for i in range(sim_bits)]
    )
    bits = F.concat(*[F.when(F.col(f"n{i}") > 7.5, F.lit("1")).otherwise(F.lit("0")) for i in range(sim_bits)])
    return votes.select(F.col(id_col), bits.alias("simhash"))


# ---------- embedding cosine near-dup ----------

def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    """Cosine similarity of two double-array columns (JVM-side — no
    Python). Zero-norm vectors yield NULL, not NaN: Spark orders NaN above
    every number, so an unguarded 0/0 would make zero vectors pass every
    ``cos >= threshold`` filter.

    With ``dim`` the dot and norms unroll into flat codegen-able sums
    (functions.vecalg) — bit-identical to the HOF fold (same order), with
    a size-guarded fallback for rows of another dimension."""
    from hierarchical_to_relational_spark.functions import vecalg

    dot = vecalg.dot(a, b, dim=dim)
    na = F.sqrt(vecalg.sq_norm(a, dim=dim))
    nb = F.sqrt(vecalg.sq_norm(b, dim=dim))
    denom = na * nb
    return F.when(denom > 0, dot / denom)


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    block_col: Column | None = None,
    verify_all_pairs: bool = False,
    lsh_block: bool = False,
) -> DataFrame:
    """Pairs (id1 < id2) with cosine ≥ threshold, all-pairs WITHIN a
    blocking column. The caller must choose the candidate strategy
    explicitly — there is no silent default, because the two honest
    options have opposite failure modes:

    - ``verify_all_pairs=True``: the exact O(n²) verification form (a
      cross join — correct, but only for candidate subsets, never a
      corpus);
    - ``lsh_block=True``: block by the hyperplane-LSH sign bucket
      (operators.similarity.hyperplane_bucket) — linear-ish at corpus
      scale but recall < 1 (pairs straddling a hyperplane are missed);
    - ``block_col=<column>``: block by a caller-supplied key (language,
      label, shard).

    Passing none of the three raises rather than quietly picking a
    semantics (an approximate result silently replacing an exact one — or
    the reverse, a cross join at corpus scale — is the worse bug)."""
    if block_col is None and not verify_all_pairs and not lsh_block:
        raise ValueError(
            "embedding_near_dup_pairs: choose a candidate strategy — "
            "verify_all_pairs=True (exact O(n^2), subsets only), "
            "lsh_block=True (approximate, corpus-scale), or block_col=..."
        )
    if block_col is None and lsh_block:
        from hierarchical_to_relational_spark.operators.similarity import hyperplane_bucket

        block_col = hyperplane_bucket(F.col(vec_col).cast("array<double>"))
    d = df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"),
                  *( [block_col.alias("_blk")] if block_col is not None else [] ))
    a, b = d.alias("a"), d.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    if block_col is not None:
        cond = cond & (F.col("a._blk") == F.col("b._blk"))
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id1"),
            F.col(f"b.{id_col}").alias("id2"),
            cosine(F.col("a.v"), F.col("b.v")).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
        .select("id1", "id2", F.round("cos", 6).alias("cos"))
    )
