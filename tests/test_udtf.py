"""Python UDTF (Spark 4) checklist cell: table-valued chunker registered
and used via LATERAL; output equals the production explode-based chunker."""

from __future__ import annotations

from hierarchical_to_relational_spark.functions.udtf_chunker import ChunkTextUDTF, register
from hierarchical_to_relational_spark.operators.text import chunk_documents


def _docs(spark):
    return spark.createDataFrame(
        [(1, "x" * 450), (2, "short doc"), (3, "y" * 200)],
        "doc_id int, text string",
    )


def test_udtf_matches_production_chunker(spark):
    docs = _docs(spark)
    register(spark, "chunk_text")
    docs.createOrReplaceTempView("udtf_docs")
    via_udtf = spark.sql(
        "SELECT doc_id, c.chunk_idx, c.chunk "
        "FROM udtf_docs, LATERAL chunk_text(text, 200, 50) c"
    )
    via_operator = chunk_documents(docs, chunk_chars=200, overlap=50)
    got = {tuple(r) for r in via_udtf.collect()}
    want = {tuple(r) for r in via_operator.collect()}
    assert got == want and len(got) > 3


def test_udtf_direct_call(spark):
    from pyspark.sql.functions import lit
    out = ChunkTextUDTF(lit("abcdefghij"), lit(4), lit(2)).collect()
    # ceil((10-2)/2) = 4 windows fully cover the string (same count formula
    # as the production chunker)
    assert [r["chunk"] for r in out] == ["abcd", "cdef", "efgh", "ghij"]
