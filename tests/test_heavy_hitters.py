"""Two-pass Misra-Gries heavy hitters: candidate superset + exact recount.

The operator's contract (operators/heavy_hitters.py) is that the final
output is EXACTLY the naive full-vocabulary scan's answer, for any
partitioning of the input — the MG pass may only widen the candidate
set, never lose a true heavy hitter.  These tests force several
partitionings and thresholds and compare against the naive plan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from rpa_etl_investing_spark.catalog import tbl
from rpa_etl_investing_spark.operators.heavy_hitters import heavy_hitters


def _naive(docs, threshold_ppm):
    toks = docs.select(F.explode(F.split("text", " ")).alias("token"))
    tot = toks.agg(F.count("*").cast("long").alias("total_tokens"))
    return (
        toks.groupBy("token")
        .agg(F.count("*").cast("long").alias("cnt"))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("cnt") * 1_000_000 >= threshold_ppm * F.col("total_tokens"))
        .select("token", "cnt", "total_tokens")
    )


@pytest.mark.parametrize("threshold_ppm", [2500, 10000, 50000])
def test_matches_naive_scan(spark, sf_dir, threshold_ppm):
    docs = tbl(spark, sf_dir, "documents")
    got = {
        (r.token, r.cnt, r.total_tokens)
        for r in heavy_hitters(docs, threshold_ppm).collect()
    }
    want = {
        (r.token, r.cnt, r.total_tokens)
        for r in _naive(docs, threshold_ppm).collect()
    }
    assert got == want
    if threshold_ppm <= 10000:
        assert want, "fixture should produce at least one heavy hitter"


def test_partitioning_invariant(spark, sf_dir):
    """Exactness must hold no matter how the MG pass sees the rows:
    1 partition (pure streaming MG) and a many-partition split must
    both reproduce the naive answer."""
    docs = tbl(spark, sf_dir, "documents")
    want = sorted(
        (r.token, r.cnt) for r in _naive(docs, 10000).collect()
    )
    for n in (1, 16):
        got = sorted(
            (r.token, r.cnt)
            for r in heavy_hitters(docs.repartition(n), 10000).collect()
        )
        assert got == want, f"mismatch at {n} partitions"


def test_candidate_set_is_bounded_superset(spark):
    """Adversarial skew: one token at 40%, a long tail of singletons.
    The MG candidate pass must retain the heavy token and the final
    filter must drop every tail token; candidate count stays ≤ P*k."""
    rows = [("hot " * 4).strip() for _ in range(100)] + [
        f"tail{i} tail{i + 1000}" for i in range(300)
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    ).repartition(8)
    out = heavy_hitters(docs, threshold_ppm=100_000)  # θ = 10%
    got = {(r.token, r.cnt) for r in out.collect()}
    assert got == {("hot", 400)}


def test_empty_and_degenerate_inputs(spark):
    """Empty corpus → empty result (no division-by-zero on the total);
    single-token corpus → that token at 100%."""
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert heavy_hitters(empty, 1000).count() == 0
    one = spark.createDataFrame([(0, "solo")], "doc_id long, text string")
    got = [(r.token, r.cnt, r.total_tokens) for r in heavy_hitters(one, 1000).collect()]
    assert got == [("solo", 1, 1)]
