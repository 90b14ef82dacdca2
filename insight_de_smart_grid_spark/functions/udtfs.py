"""Python UDTF surface (SURVEY §2.9): the table-function extension point.

The reference defines no UDTF (its one UDF-like construct was a Spark 2.4
from_avro workaround); this module exists so a user who NEEDS a bespoke
table function has a worked, tested example of the Spark 4 Python UDTF API
— including the Arrow-optimized form — with oracle-level proof that the
UDTF path computes exactly what the expression-based twin computes.

``ChunkDocsUDTF`` mirrors ``operators/pipeline.py::chunk_documents``
(overlapping fixed-width chunking). The expression form is the production
path — JVM codegen, no Python in the row path; the UDTF is the template
for logic that genuinely cannot be expressed in columns (external parsers,
stateful tokenizers). Both produce byte-identical rows (tested).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx int, chunk string, n_chunk_chars int",
      useArrow=True)
class ChunkDocsUDTF:
    """Lateral table function: one input (text, width, stride) row ->
    overlapping chunks. Chunk i covers chars [i*stride+1, +width); the last
    chunk keeps the remainder — identical to chunk_documents."""

    def eval(self, text: str, width: int = 256, stride: int = 192):
        if text is None:
            return
        n = len(text)
        n_chunks = max(-(-(n - width) // stride) + 1, 1)
        for i in range(n_chunks):
            chunk = text[i * stride: i * stride + width]
            yield i, chunk, len(chunk)


def register_udtfs(spark) -> None:
    spark.udtf.register("chunk_docs", ChunkDocsUDTF)
