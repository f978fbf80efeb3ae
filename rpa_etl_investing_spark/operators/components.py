"""Connected components over a pair graph — duplicate-cluster resolution.

Near-dup detection (MinHash/SimHash/n-gram Jaccard, operators/dedup.py)
emits *pairs*; an actual dedup pipeline must then group pairs into
clusters and keep one canonical document per cluster — pairs (a,b) and
(b,c) mean {a,b,c} are one duplicate set even though (a,c) never
collided. That grouping is connected components on the pair graph.

Algorithm: iterative min-label propagation (each vertex repeatedly
adopts the smallest label among itself and its neighbors) — converges
in O(graph diameter) rounds, each round one shuffle-join + grouped min.
Near-dup cluster graphs are small-diameter (dups of a doc are dups of
each other), so rounds stay in single digits; for adversarial
long-chain graphs at 100 TB the known fix is the large-star/small-star
doubling variant (Kiveris et al., "Connected Components in MapReduce",
SoCC'14), which this loop structure accommodates without API change.

Driver-loop safety: per-round lineage is truncated with
``localCheckpoint`` (otherwise the plan tree doubles every round) and
convergence is detected by a *monotone scalar* — labels only ever
decrease, so the label-sum stabilizing exactly means a fixpoint; this
costs one tiny aggregate per round instead of a change-count join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 50,
) -> DataFrame:
    """Resolve ``(src, dst)`` pairs into ``(doc_id, cluster_id)`` rows,
    where ``cluster_id`` is the minimum vertex id in the component —
    a deterministic canonical representative (same min-survivor rule as
    ``exact_dedup``).

    Only vertices that appear in an edge are returned; callers union in
    singletons if they need every document labeled.
    """
    sym = edges.select(
        F.col(src).alias("v"), F.col(dst).alias("u")
    ).unionByName(edges.select(F.col(dst).alias("v"), F.col(src).alias("u")))
    # distinct column names throughout (v/u vs lv/label vs nv/nmin): the
    # loop self-joins frames that share lineage, and qualified-name
    # resolution across a shared subtree is ambiguous otherwise
    sym = sym.distinct().localCheckpoint(eager=False)

    labels = (
        sym.select(F.col("v").alias("lv")).distinct().withColumn("label", F.col("lv"))
    )
    prev_sum = None
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, F.col("u") == F.col("lv"))
            .groupBy(F.col("v").alias("nv"))
            .agg(F.min("label").alias("nmin"))
        )
        labels = (
            labels.join(neighbor_min, F.col("lv") == F.col("nv"), "left")
            .select(
                F.col("lv"),
                F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias(
                    "label"
                ),
            )
            .localCheckpoint()  # truncate lineage; materializes this round
        )
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select(
        F.col("lv").alias("doc_id"), F.col("label").alias("cluster_id")
    )
