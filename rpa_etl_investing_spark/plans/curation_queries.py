"""Training-data curation queries: deterministic splits, source
mixing, and duplicate-cluster resolution (SURVEY §2.10 extensions).

These are the steps between "pairs/scores computed" and "training set
written": assign stable train/val/test splits, down-sample sources to
mixture weights, and collapse near-dup pairs into canonical clusters.
All assignments are content-keyed md5 so the DuckDB oracle reproduces
them bit-for-bit (operators/sampling.py docstring has the mechanism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rpa_etl_investing_spark.catalog import tbl
from rpa_etl_investing_spark.operators.components import connected_components
from rpa_etl_investing_spark.operators.dedup import ngram_jaccard_pairs
from rpa_etl_investing_spark.operators.sampling import (
    deterministic_split,
    frac_to_hex,
    weighted_source_mix,
)
from rpa_etl_investing_spark.plans.llm_queries import _SH_CTE, _TOK_CTE
from rpa_etl_investing_spark.plans.registry import register

_BUCKET_SQL = "substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)"


@register(
    "curation_deterministic_split",
    oracle=f"""
    WITH assigned AS (
      SELECT CASE WHEN {_BUCKET_SQL} < '{frac_to_hex(0.8)}' THEN 'train'
                  WHEN {_BUCKET_SQL} < '{frac_to_hex(0.9)}' THEN 'val'
                  ELSE 'test' END AS split,
             n_chars
      FROM documents)
    SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM assigned GROUP BY split ORDER BY split
    """,
)
def curation_deterministic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable 80/10/10 train/val/test assignment keyed on ``doc_id``:
    a pure per-row hash, so re-runs, engine changes, and late-arriving
    data never move a document across the held-out boundary. Shuffles
    only for the 3-group audit count; the assignment itself is
    shuffle-free."""
    docs = deterministic_split(tbl(spark, sf_dir, "documents"), "doc_id")
    return (
        docs.groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("split")
    )


_MIX_WEIGHTS = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.1}


@register(
    "curation_weighted_mix",
    oracle=f"""
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept
    FROM documents
    WHERE {_BUCKET_SQL} <
      CASE source {" ".join(f"WHEN '{s}' THEN '{frac_to_hex(w)}'" for s, w in sorted(_MIX_WEIGHTS.items()))}
           ELSE '0000' END
    GROUP BY source ORDER BY source
    """,
)
def curation_weighted_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Down-sample each source to its mixture weight in ONE shuffle-free
    filter pass (books at 100%, web tiers at 50/25/10%, the rest
    dropped) — the curation step that shapes a 100 TB crawl into a
    training mixture without N per-source jobs."""
    kept = weighted_source_mix(
        tbl(spark, sf_dir, "documents"), "doc_id", "source", _MIX_WEIGHTS
    )
    return (
        kept.groupBy("source").agg(F.count("*").alias("n_kept")).orderBy("source")
    )


@register(
    "curation_dup_clusters",
    oracle=f"""
    WITH RECURSIVE {_TOK_CTE}, {_SH_CTE},
    ex AS (SELECT DISTINCT doc_id, sh FROM shx),
    keep AS (SELECT sh FROM ex GROUP BY sh HAVING COUNT(*) <= 1000),
    exf AS (SELECT ex.* FROM ex JOIN keep USING (sh)),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM exf GROUP BY doc_id),
    shared AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
      FROM exf a JOIN exf b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id),
    pairs AS (
      SELECT doc_a, doc_b
      FROM shared
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE n_shared / (sa.n_sh + sb.n_sh - n_shared) >= 0.05),
    edges AS (
      SELECT doc_a AS v, doc_b AS u FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs),
    reach(v, u) AS (
      SELECT v, v FROM (SELECT DISTINCT v FROM edges) AS verts
      UNION
      SELECT r.v, e.u FROM reach r JOIN edges e ON r.u = e.v)
    SELECT v AS doc_id, MIN(u) AS cluster_id
    FROM reach GROUP BY v
    """,
)
def curation_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → duplicate clusters: connected components over
    the 3-gram-Jaccard pair graph, labeling every clustered doc with
    its component's min doc_id (the canonical survivor). The oracle
    recomputes the same components as a recursive-CTE transitive
    closure — feasible at oracle scale, while the Spark side uses
    O(diameter) label-propagation rounds (operators/components.py)."""
    docs = tbl(spark, sf_dir, "documents")
    return connected_components(ngram_jaccard_pairs(docs))
