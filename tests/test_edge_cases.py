"""Operator edge cases: degenerate inputs that a corpus at scale WILL
contain somewhere (empty partitions, sub-shingle documents, more
centroids than vectors) must degrade gracefully, not throw."""

from __future__ import annotations

from pyspark.sql import functions as F

from rpa_etl_investing_spark.operators.dedup import (
    exact_dedup,
    minhash_signatures,
)
from rpa_etl_investing_spark.operators.similarity import ivf_topk


def test_minhash_drops_sub_shingle_docs(spark):
    """Documents with fewer than 3 tokens have no 3-shingles and must
    drop out of the signature relation (matching the oracle's UNNEST
    of an empty list), not produce NULL signatures."""
    docs = spark.createDataFrame(
        [(1, "one two"), (2, "a b c d"), (3, "x")], ["doc_id", "text"]
    )
    sigs = minhash_signatures(docs).collect()
    assert {r.doc_id for r in sigs} == {2}
    assert all(v is not None for v in sigs[0].asDict().values())


def test_exact_dedup_empty_input_keeps_schema(spark):
    docs = spark.createDataFrame([], "doc_id bigint, text string")
    out = exact_dedup(docs)
    assert out.columns == ["content_hash", "canonical_id", "n_copies"]
    assert out.count() == 0


def test_ivf_with_fewer_vectors_than_centroids(spark):
    """A cell index built over fewer vectors than requested centroids
    must still answer queries (every vector seeds its own cell)."""
    rows = [(i, [float(i == j) for j in range(4)]) for i in range(3)]
    vecs = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = ivf_topk(
        vecs.filter(F.col("vec_id") == 0),
        vecs,
        n_centroids=8,
        k=2,
        queries_in_corpus=True,
    ).collect()
    assert {r.neighbor_id for r in out}.issubset({1, 2})
    assert all(r.query_id == 0 for r in out)
