"""Python UDTF surface (SURVEY §2.11) — Spark ≥3.5 table function.

Policy: built-in generators (explode/posexplode, demonstrated in
explode_tokens_positional) cover row explosion without Python; the UDTF
exists as the arbitrary-table-function extension point. The demo splits
a document into fixed-size chunks with overlap — the standard
LLM-context chunking shape that genuinely needs imperative logic.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from rpa_etl_investing_spark.catalog import tbl


@udtf(returnType="chunk_no: int, start: int, chunk: string")
class ChunkDocument:
    """Overlapping character chunks: size 40, stride 30."""

    def eval(self, text: str):  # noqa: A002
        if text is None:
            return
        size, stride = 40, 30
        for no, start in enumerate(range(0, max(len(text) - size + stride, 1), stride)):
            yield no, start, text[start : start + size]


def test_udtf_chunks_documents(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 5)
    rows = (
        docs.lateralJoin(ChunkDocument(F.col("text").outer()))
        .select("doc_id", "chunk_no", "start", "chunk")
        .collect()
    )
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    src = {r.doc_id: r.text for r in docs.collect()}
    assert set(by_doc) == set(src)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_no)
        # chunks reconstruct the document: each starts at stride offsets
        for r in chunks:
            assert src[doc_id][r.start : r.start + 40] == r.chunk
        assert [r.start for r in chunks] == [i * 30 for i in range(len(chunks))]
