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

from pyspark.sql import DataFrame, SparkSession, types as T

TURN_FIELDS = [
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), False),
    T.StructField("text", T.StringType(), False),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), False),
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


def read_binlog(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    fmt: str = "parquet",
) -> DataFrame:
    """Batch scan of the whole binlog directory (parquet or json segments —
    a JSON WAL is what e.g. a Debezium file sink produces)."""
    return spark.read.schema(schema or envelope_schema()).format(fmt).load(path)


def stream_binlog(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    max_files_per_trigger: int | None = None,
    fmt: str = "parquet",
) -> DataFrame:
    """Structured Streaming tail of the binlog directory (file source,
    parquet or json segments).

    New segment files appended by the producer become new micro-batches;
    exactly-once downstream comes from the idempotent batch-id-keyed table
    commit, not from the source.

    Producer contract (standard Spark file-source assumption): segments
    must APPEAR atomically — write to a staging path and rename into the
    tailed directory. A file written in place can be catalogued mid-write
    and its tail silently missed.
    """
    reader = spark.readStream.schema(schema or envelope_schema()).format(fmt)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)
