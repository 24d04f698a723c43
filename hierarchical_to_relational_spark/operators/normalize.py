"""Normalize stage: nested CDC envelopes → flat relational turn rows.

This is the engine's echo of the reference's hierarchical→relational
flattening (HierarchyFlattener.java:127-351): a nested structure (change
envelopes carrying arrays of turn structs) becomes flat relational rows,
purely via Column algebra — ``explode`` + struct projection, zero per-row
Python (the reference's zero-UDF discipline, SURVEY.md §2.1). The optional
text-normalization step is a **vectorized Arrow pandas_udf** (batch
transfer, no per-row Python), the only permitted Python on the hot path.

Turn-struct columns are discovered from the schema, so additively-evolved
envelopes (extra turn fields, FIXTURES.md F6b) flow through without code
changes — the schema-evolution path (operators.merge) widens the target
before applying them.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.functions import pandas_udf

META_LSN = "_lsn"
META_TS = "_commit_ts"
META_OP = "_op"
META_BUCKET = "_bucket"


@pandas_udf(T.StringType())
def normalize_text_arrow(texts: pd.Series) -> pd.Series:
    """Vectorized text cleanup: Unicode NFC, strip control chars, collapse
    whitespace. Arrow-batched (10-100× a row-at-a-time Python UDF).

    Round-4 note: a fully C++ variant via ``pyarrow.compute`` was built
    and fuzz-compared — rejected because this pyarrow's
    ``utf8_normalize`` returns DECOMPOSED output for every form (NFC
    requests included), breaking NFC parity, and the measured end-to-end
    win of the RE2 passes was only ~1.3× (the regex work, not the NFC
    map, dominates). ``unicodedata.normalize`` is a C call; only the map
    dispatch is per-row Python."""
    import unicodedata

    s = texts.map(lambda t: unicodedata.normalize("NFC", t) if t is not None else None)
    s = s.str.replace(r"[\x00-\x08\x0b\x0c\x0e-\x1f]", "", regex=True)
    return s.str.replace(r"\s+", " ", regex=True).str.strip()


def normalize_text_builtin(col):
    """Whitespace-collapse + trim via JVM-side regexp (whole-stage codegen);
    the default hot path when full Unicode normalization isn't required."""
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def turn_fields(envelope_df: DataFrame) -> list[T.StructField]:
    payload = envelope_df.schema["payload"].dataType
    return list(payload["turns"].dataType.elementType.fields)


def normalize_envelopes(
    envelopes: DataFrame,
    text_mode: str = "builtin",  # "builtin" | "arrow" | "none"
) -> tuple[DataFrame, DataFrame]:
    """Split an envelope batch into (upsert turn rows, delete watermarks).

    Returns:
      upserts — one row per (event, turn): all turn-struct columns +
                ``_lsn``/``_commit_ts``/``_op`` metadata, plus ``conv_id``.
                ``_op`` is 'u' for full-row upserts (op insert/update) and
                'p' for PARTIAL upserts (op ``patch``): a patch turn sets
                only its non-null columns, null columns mean "keep the
                previous value" (merge-patch, the shape real CDC feeds send
                for column-subset updates). Resolution semantics live in
                operators.merge.resolve / collapse_patches.
      deletes — ``(conv_id, _lsn)``: max delete LSN per conversation
                (whole-conversation tombstone watermark).
    """
    tfields = turn_fields(envelopes)
    upserts = (
        envelopes.where(F.col("op") != "delete")
        .select(
            F.col("conv_id"),
            F.col("lsn").alias(META_LSN),
            F.col("commit_ts").alias(META_TS),
            F.when(F.col("op") == "patch", F.lit("p")).otherwise(F.lit("u")).alias(META_OP),
            F.explode("payload.turns").alias("t"),
        )
        .select("conv_id", META_LSN, META_TS, META_OP, "t.*")
    )
    if text_mode == "arrow":
        upserts = upserts.withColumn("text", normalize_text_arrow(F.col("text")))
    elif text_mode == "builtin":
        upserts = upserts.withColumn("text", normalize_text_builtin(F.col("text")))
    elif text_mode != "none":
        raise ValueError(f"unknown text_mode {text_mode!r}")
    # stable column order: conv_id, turn columns, metadata
    out_cols = ["conv_id"] + [f.name for f in tfields] + [META_LSN, META_TS, META_OP]
    upserts = upserts.select(*out_cols)

    deletes = (
        envelopes.where(F.col("op") == "delete")
        .groupBy("conv_id")
        .agg(F.max("lsn").alias(META_LSN))
    )
    return upserts, deletes
