"""Simulated binlog/WAL source: schemas + batch/stream readers.

The binlog is a directory of parquet segment files, each holding nested
change-event envelopes (FIXTURES.md F6):

    lsn        int64      -- total order; duplicates + out-of-order injected
    commit_ts  timestamp  -- LWW tiebreak after lsn
    op         string     -- insert | update | delete
    conv_id    string     -- skewed (a few hot conversations)
    payload    struct<turns: array<struct<turn_idx:int, role:string,
               text:string, tool:string, ts:timestamp [, ...additive]>>>
               -- null for delete-whole-conversation events

Batch reads use ``spark.read.parquet``; streaming reads use
``spark.readStream`` with ``maxFilesPerTrigger`` so each micro-batch tails a
bounded slice of the WAL — the same shape a Kafka/binlog connector produces.
An explicit schema is always supplied (streaming requires it; batch gets
consistent types). The hierarchical envelope→relational flattening that the
reference performs on edge lists (HierarchyFlattener.java:127-351) happens
downstream in ``operators.normalize``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

# turn_idx is the merge key (always required); the payload columns are
# nullable because PATCH envelopes (op="patch") carry null for columns
# they leave unchanged (merge-patch), and tombstone rows store nulls.
TURN_FIELDS = [
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), True),
]


def turn_struct(extra_fields: list[T.StructField] | None = None) -> T.StructType:
    return T.StructType(TURN_FIELDS + list(extra_fields or []))


def envelope_schema(extra_turn_fields: list[T.StructField] | None = None) -> T.StructType:
    return T.StructType(
        [
            T.StructField("lsn", T.LongType(), False),
            T.StructField("commit_ts", T.TimestampType(), False),
            T.StructField("op", T.StringType(), False),
            T.StructField("conv_id", T.StringType(), False),
            T.StructField(
                "payload",
                T.StructType([T.StructField("turns", T.ArrayType(turn_struct(extra_turn_fields)), True)]),
                True,
            ),
        ]
    )


# Relational transcript schema (the target table's user-visible columns,
# BASELINE.json:input_hint).
TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), True),  # null on tombstone rows
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)


def flat_envelope_schema(env_schema: T.StructType | None = None) -> T.StructType:
    """CSV-portable flat envelope derived from a nested envelope schema:
    one row per (event, turn) with the turn-struct fields inlined; delete
    events carry null turn fields. This is the shape a CSV export of the
    same binlog produces (CSV cannot hold the nested turns array — the
    reference's own example pipelines ingest exactly such flat CSV change
    rows, hirerachy_to_relational_pipeline-cdap-data-pipeline.json File
    source ``format: csv``)."""
    env = env_schema or envelope_schema()
    turn = env["payload"].dataType["turns"].dataType.elementType
    return T.StructType(
        [
            T.StructField("lsn", T.LongType(), False),
            T.StructField("commit_ts", T.TimestampType(), False),
            T.StructField("op", T.StringType(), False),
            T.StructField("conv_id", T.StringType(), False),
        ]
        + [T.StructField(f.name, f.dataType, True) for f in turn.fields]
    )


def nest_flat_envelopes(flat: DataFrame, env_schema: T.StructType | None = None) -> DataFrame:
    """Flat one-row-per-turn change rows → nested envelope shape (each row
    becomes a single-turn envelope; deletes get a null payload). A pure
    per-row projection — no shuffle, no state — so it composes with both
    batch and Structured Streaming reads. Downstream per-turn LWW
    resolution (operators.merge.resolve) is insensitive to how turns are
    grouped into envelopes, so a flat export replays to the identical
    final state as the nested WAL."""
    env = env_schema or envelope_schema()
    # nullability-relaxed payload type: CSV flat columns are all nullable
    # (delete rows), and Spark refuses nullable→non-null struct casts;
    # downstream discovers turn fields by name, nullability is irrelevant
    ptype = _relax_nullability(env["payload"].dataType)
    turn = ptype["turns"].dataType.elementType
    turn_expr = F.struct(*[F.col(f.name).alias(f.name) for f in turn.fields])
    payload = (
        F.when(F.col("op") == "delete", F.lit(None).cast(ptype))
        .otherwise(F.struct(F.array(turn_expr).alias("turns")).cast(ptype))
    )
    return flat.select("lsn", "commit_ts", "op", "conv_id", payload.alias("payload"))


def _relax_nullability(dt: T.DataType) -> T.DataType:
    if isinstance(dt, T.StructType):
        return T.StructType(
            [T.StructField(f.name, _relax_nullability(f.dataType), True) for f in dt.fields]
        )
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_relax_nullability(dt.elementType), True)
    return dt


# Spark CSV options for the flat envelope: RFC-4180 quoting (pandas/Excel
# style '"' escape, not Spark's backslash default), multiLine so quoted
# fields containing EMBEDDED NEWLINES (routine in chat transcript text)
# parse as one record instead of two silently-malformed fragments, and
# microsecond ISO timestamps — so fields with commas/quotes/newlines and
# sub-second commit times round-trip exactly. multiLine makes a CSV file
# a single input split, which is fine: binlog segments are many small
# files, so parallelism comes from the file count.
_CSV_OPTIONS = {
    "header": "true",
    "escape": '"',
    "multiLine": "true",
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
}


def read_binlog(
    spark: SparkSession,
    path: str | list[str],
    schema: T.StructType | None = None,
    fmt: str = "parquet",
) -> DataFrame:
    """Batch scan of binlog directories/segments (parquet, json, or csv
    segments — a JSON/CSV WAL is what e.g. a Debezium file sink or a
    flat CSV export produces). ``schema`` is always the NESTED envelope
    schema; csv segments hold the flat per-turn projection and are
    re-nested on read."""
    if fmt == "csv":
        flat = (
            spark.read.schema(flat_envelope_schema(schema))
            .options(**_CSV_OPTIONS)
            .csv(path)
        )
        return nest_flat_envelopes(flat, schema)
    return spark.read.schema(schema or envelope_schema()).format(fmt).load(path)


def stream_binlog(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    max_files_per_trigger: int | None = None,
    fmt: str = "parquet",
) -> DataFrame:
    """Structured Streaming tail of the binlog directory (file source,
    parquet, json, or csv segments; csv is re-nested per-row — see
    ``nest_flat_envelopes``).

    New segment files appended by the producer become new micro-batches;
    exactly-once downstream comes from the idempotent batch-id-keyed table
    commit, not from the source.

    Producer contract (standard Spark file-source assumption): segments
    must APPEAR atomically — write to a staging path and rename into the
    tailed directory. A file written in place can be catalogued mid-write
    and its tail silently missed.
    """
    if fmt == "csv":
        reader = spark.readStream.schema(flat_envelope_schema(schema)).options(**_CSV_OPTIONS)
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
        return nest_flat_envelopes(reader.csv(path), schema)
    reader = spark.readStream.schema(schema or envelope_schema()).format(fmt)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)
