"""Python UDTF (Spark 4) demo: a table-valued document chunker.

Closes the UDTF cell of the engine checklist (SURVEY.md §2.2). The
PRODUCTION chunker is ``operators.text.chunk_documents`` — pure
sequence+explode column algebra, JVM-side, no Python; this UDTF form exists
for user-defined table functions whose row-expansion logic genuinely can't
be expressed in column algebra (and as the registration/demo path for
``spark.udtf.register`` + ``LATERAL``). Same output contract as the
operator: overlapping character windows, one row per (chunk_idx, chunk).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx int, chunk string")
class ChunkTextUDTF:
    """SELECT ... FROM docs, LATERAL chunk_text(text, 200, 50)"""

    def eval(self, text: str, chunk_chars: int = 200, overlap: int = 50):
        if text is None:
            return
        stride = chunk_chars - overlap
        if stride <= 0:
            raise ValueError("chunk_chars must exceed overlap")
        n = max(-(-(len(text) - overlap) // stride), 1)
        for i in range(n):
            yield i, text[i * stride: i * stride + chunk_chars]


def register(spark, name: str = "chunk_text"):
    spark.udtf.register(name, ChunkTextUDTF)
    return name
