"""Custom stateful streaming operator: per-conversation progress tracking
via ``applyInPandasWithState`` (SURVEY.md §2.2 — the engine's example of a
stateful op Spark's built-ins can't express declaratively).

Tracks, per conversation, across micro-batches: highest LSN applied,
cumulative event and turn counts, and delete count — the streaming-side
materialization of the lineage watermarks the merge records per batch.
State is Arrow-batched per group (no per-row Python); Spark checkpoints the
state store, so the tracker resumes with the stream.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PROGRESS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("max_lsn", T.LongType(), True),
        T.StructField("n_events", T.LongType(), True),
        T.StructField("n_turns", T.LongType(), True),
        T.StructField("n_deletes", T.LongType(), True),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("max_lsn", T.LongType(), True),
        T.StructField("n_events", T.LongType(), True),
        T.StructField("n_turns", T.LongType(), True),
        T.StructField("n_deletes", T.LongType(), True),
    ]
)


def _track(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    max_lsn, n_events, n_turns, n_deletes = (
        state.get if state.exists else (0, 0, 0, 0)
    )
    for pdf in pdfs:
        max_lsn = max(max_lsn, int(pdf["lsn"].max()))
        n_events += len(pdf)
        n_turns += int(pdf["n_turns"].sum())
        n_deletes += int((pdf["op"] == "delete").sum())
    state.update((max_lsn, n_events, n_turns, n_deletes))
    yield pd.DataFrame(
        {
            "conv_id": [key[0]],
            "max_lsn": [max_lsn],
            "n_events": [n_events],
            "n_turns": [n_turns],
            "n_deletes": [n_deletes],
        }
    )


def conversation_progress(envelopes: DataFrame) -> DataFrame:
    """Streaming envelopes → per-conversation running progress (one updated
    row per conversation per micro-batch it appears in)."""
    compact = envelopes.select(
        "conv_id",
        "lsn",
        "op",
        F.coalesce(F.size("payload.turns"), F.lit(0)).cast("long").alias("n_turns"),
    )
    return compact.groupBy("conv_id").applyInPandasWithState(
        _track,
        outputStructType=PROGRESS_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
