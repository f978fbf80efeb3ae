"""Count-Min sketch: one-sided guarantee, accuracy, boundedness, merge."""

from __future__ import annotations

import pyspark.sql.functions as F

from rpa_etl_investing_spark.catalog import tbl
from rpa_etl_investing_spark.operators.cms import (
    CMS_DEPTH,
    CMS_WIDTH,
    cms_build,
    cms_estimate,
)


def _toks(spark, sf_dir):
    return tbl(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("token")
    )


def test_estimate_never_undercounts_any_token(spark, sf_dir):
    """The one-sided guarantee must hold for EVERY token, not just the
    heavy hitters: collisions only ever add."""
    toks = _toks(spark, sf_dir)
    sketch = cms_build(toks)
    exact = toks.groupBy("token").agg(F.count("*").cast("long").alias("cnt"))
    est = cms_estimate(sketch, exact)
    bad = est.filter(F.col("est") < F.col("cnt")).count()
    assert bad == 0


def test_sketch_is_bounded_and_row_sums_equal_stream_length(spark, sf_dir):
    toks = _toks(spark, sf_dir)
    sketch = cms_build(toks).collect()
    assert len(sketch) <= CMS_DEPTH * CMS_WIDTH
    n = toks.count()
    sums = {}
    for r in sketch:
        sums[r.row] = sums.get(r.row, 0) + r.c
    # every row of the table sees every occurrence exactly once
    assert sums == {j: n for j in range(CMS_DEPTH)}


def test_merge_of_split_corpora_equals_whole(spark, sf_dir):
    """Mergeability: sketches of two disjoint halves, added bucket-wise,
    must equal the whole corpus's sketch — the property that lets 100
    partial sketches combine without revisiting data."""
    docs = tbl(spark, sf_dir, "documents")
    tok = lambda df: df.select(F.explode(F.split("text", " ")).alias("token"))  # noqa: E731
    whole = {(r.row, r.bucket): r.c for r in cms_build(tok(docs)).collect()}
    a = cms_build(tok(docs.filter(F.col("doc_id") % 2 == 0)))
    b = cms_build(tok(docs.filter(F.col("doc_id") % 2 == 1)))
    merged = {}
    for r in a.collect() + b.collect():
        merged[(r.row, r.bucket)] = merged.get((r.row, r.bucket), 0) + r.c
    assert merged == whole
