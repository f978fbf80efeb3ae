"""Training-data curation operators: deterministic splits, weighted
source mixing, connected-components cluster resolution."""

from __future__ import annotations

from pyspark.sql import functions as F

from rpa_etl_investing_spark.catalog import tbl
from rpa_etl_investing_spark.operators.components import connected_components
from rpa_etl_investing_spark.operators.sampling import (
    deterministic_split,
    frac_to_hex,
    weighted_source_mix,
)


def test_frac_to_hex_thresholds():
    assert frac_to_hex(0.0) == "0000"
    assert frac_to_hex(0.5) == "8000"
    assert frac_to_hex(1.0) == "g"  # lexicographically above every bucket
    assert frac_to_hex(0.8) == "cccd"


def test_split_partitions_exactly(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    split = deterministic_split(docs, "doc_id")
    counts = {r["split"]: r["n"] for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == docs.count()
    # 80/10/10 within loose tolerance at fixture scale
    assert counts["train"] > counts.get("val", 0)
    assert counts["train"] > counts.get("test", 0)


def test_split_is_stable_under_repartition(spark, sf_dir):
    """The property that justifies hash splits: physical layout must not
    affect assignment."""
    docs = tbl(spark, sf_dir, "documents")
    a = {r["doc_id"]: r["split"] for r in deterministic_split(docs, "doc_id").select("doc_id", "split").collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in deterministic_split(docs.repartition(13), "doc_id").select("doc_id", "split").collect()
    }
    assert a == b


def test_weighted_mix_rates(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    kept = weighted_source_mix(docs, "doc_id", "source", {"src0": 1.0, "src1": 0.0})
    per_src = {r["source"]: r["n"] for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    n_src0 = docs.filter(F.col("source") == "src0").count()
    assert per_src.get("src0") == n_src0  # weight 1.0 keeps everything
    assert "src1" not in per_src  # weight 0.0 keeps nothing
    assert set(per_src) == {"src0"}  # unlisted sources dropped


def test_connected_components_chain_and_triangle(spark):
    """Chain 1-2-3-4 (transitive, needs >1 round), triangle 10-11-12,
    isolated pair (20,21)."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        ["doc_a", "doc_b"],
    )
    got = {
        r["doc_id"]: r["cluster_id"] for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
