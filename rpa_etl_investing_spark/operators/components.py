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
    #
    # EAGER checkpoint (r7, sf1 stress finding): with eager=False the
    # edge pipeline materializes lazily inside round 0's much larger
    # join plan, where AQE coalesces the upstream pair-join's
    # post-shuffle partitions for THAT plan's statistics — at sf1 the
    # n-gram pair generator's hot-shingle partition then lands on one
    # coalesced task and the first round straggles >10 min (measured;
    # the identical pair plan executed standalone takes 38 s). Eager
    # materialization runs the generator as its own job with its own
    # adaptive plan, and every label round touches only the compact
    # checkpointed edge list.
    sym = sym.distinct().localCheckpoint()

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
        # DECIMAL(38,0) accumulation: a bigint label-sum could overflow at
        # ~1e12 vertices × 1e12-range ids; the monotone-scalar argument
        # needs the sum to be exact
        cur_sum = labels.agg(F.sum(F.col("label").cast("decimal(38,0)"))).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        # Tripwire (r9, ADVICE item #3): returning the last labels on a
        # non-converged loop would be PLAUSIBLE BUT WRONG components with
        # no signal — the DuckDB oracle twin empties its result in this
        # case, and the engine must be at least as loud.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(graph diameter exceeds the round budget; raise max_iter or "
            "use pointer_jumping_components)"
        )
    return labels.select(
        F.col("lv").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def large_small_star_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components via alternating large-star / small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — same contract as :func:`connected_components` (vertices →
    min-id-in-component), different convergence behavior: O(log² n)
    rounds on ANY graph, vs O(diameter) for plain label propagation, so
    adversarial long-chain graphs (the 100 TB worst case) can't stall the
    driver loop.

    Round shapes (each a groupBy-min + join, all key-partitioned):
    - large-star: every vertex's larger neighbors re-point to the min of
      its closed neighborhood;
    - small-star: with edges directed max→min, all smaller neighbors
      (and the vertex) re-point to the neighborhood min.
    Unlike the label frame (pointwise monotone, so a stable sum IS a
    fixpoint), the edge SET mutates — rows appear and vanish — so the
    (endpoint-sum, count) scalar is used only as a cheap candidate
    signal and the stop is confirmed by an exact set compare."""
    ecols = edges.select(
        F.col(src).cast("long").alias("eu"), F.col(dst).cast("long").alias("ev")
    ).filter(F.col("eu") != F.col("ev"))
    cur = ecols.distinct().localCheckpoint()
    # verts reads the CHECKPOINTED edges, not ecols: deriving it from the
    # raw edge pipeline would re-run the (possibly expensive) generator
    # when the lazy checkpoint materializes inside a later join plan —
    # the same straggler class the sf1 stress caught in plain label
    # propagation (see connected_components above).
    verts = (
        cur.select(F.col("eu").alias("vid"))
        .unionByName(cur.select(F.col("ev").alias("vid")))
        .distinct()
        .localCheckpoint(eager=False)
    )

    def large_star(e: DataFrame) -> DataFrame:
        sym = e.select("eu", "ev").unionByName(
            e.select(F.col("ev").alias("eu"), F.col("eu").alias("ev"))
        )
        mins = (
            sym.groupBy("eu")
            .agg(F.min("ev").alias("mn"))
            .select(
                F.col("eu").alias("mu"),
                F.least(F.col("mn"), F.col("eu")).alias("m"),
            )
        )
        return (
            sym.filter(F.col("ev") > F.col("eu"))
            .join(mins, F.col("eu") == F.col("mu"))
            .select(F.col("ev").alias("eu"), F.col("m").alias("ev"))
            .filter(F.col("eu") != F.col("ev"))
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        d = e.select(
            F.greatest("eu", "ev").alias("du"), F.least("eu", "ev").alias("dv")
        )
        mins = d.groupBy(F.col("du").alias("mu")).agg(F.min("dv").alias("m"))
        joined = d.join(mins, F.col("du") == F.col("mu"))
        re_pointed = joined.select(F.col("dv").alias("eu"), F.col("m").alias("ev"))
        self_edge = joined.select(F.col("du").alias("eu"), F.col("m").alias("ev"))
        return (
            re_pointed.unionByName(self_edge)
            .filter(F.col("eu") != F.col("ev"))
            .distinct()
        )

    prev_sum = None
    for _ in range(max_iter):
        nxt = small_star(large_star(cur)).localCheckpoint()
        row = nxt.agg(
            (
                F.sum(F.col("eu").cast("decimal(38,0)"))
                + F.sum(F.col("ev").cast("decimal(38,0)"))
            ).alias("s"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        cur_sum = (row.s, row.n)
        # scalar repeat is only a convergence CANDIDATE: two different
        # edge sets can share (sum, count) — e.g. {(4,1),(3,2)} vs
        # {(3,1),(4,2)} — so confirm with a set compare before stopping.
        # Both frames are distinct with equal counts, so one-directional
        # exceptAll emptiness is set equality; it runs only on the
        # candidate round, not per iteration.
        converged = cur_sum == prev_sum and nxt.exceptAll(cur).isEmpty()
        prev_sum = cur_sum
        cur = nxt
        if converged:
            break
    else:
        raise RuntimeError(  # see connected_components tripwire (r9)
            f"large_small_star_components did not converge in {max_iter} "
            "rounds (O(log² n) bound exceeded — raise max_iter)"
        )

    # converged edge set is a union of stars pointing at component minima
    parents = cur.select(F.col("eu").alias("vid"), F.col("ev").alias("p")).groupBy(
        "vid"
    ).agg(F.min("p").alias("p"))
    return verts.join(parents, "vid", "left").select(
        F.col("vid").alias("doc_id"),
        F.coalesce(F.col("p"), F.col("vid")).alias("cluster_id"),
    )


def pointer_jumping_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 40,
) -> DataFrame:
    """Connected components via Shiloach–Vishkin-style HOOK + JUMP
    rounds — the third algorithm behind the shared contract (vertices →
    min-id-in-component): each round a vertex's label becomes the min
    of (its label [self], its neighbors' labels [hook], its label's
    label [jump]). The jump term composes label chains, so measured
    reach DOUBLES per round (the r8 oracle prototype: a 301-vertex
    chain converges in 9 rounds vs 300 for plain propagation) —
    O(log diameter) rounds of linear work, vs O(diameter) for
    :func:`connected_components` and O(log² n) for
    :func:`large_small_star_components`.

    This is the exact engine twin of the pointer-doubling ORACLE
    (plans/curation_queries.py ``_pd_cc_ctes``), so the DuckDB check
    exercises the same recurrence it verifies.

    Round shape at 100 TB: one edge⋈label join (hook) + one
    label⋈label self-join (jump), both key-partitioned shuffles over
    n-row frames — never Σ cluster² rows; per-round lineage truncated
    with ``localCheckpoint`` and convergence detected by the monotone
    label-sum scalar (labels only decrease, so a stable exact sum is a
    fixpoint — same argument as ``connected_components``)."""
    sym = edges.select(
        F.col(src).alias("v"), F.col(dst).alias("u")
    ).unionByName(edges.select(F.col(dst).alias("v"), F.col(src).alias("u")))
    sym = sym.distinct().localCheckpoint()  # eager: see connected_components

    labels = (
        sym.select(F.col("v").alias("lv"))
        .distinct()
        .withColumn("label", F.col("lv"))
    )
    prev_sum = None
    for _ in range(max_iter):
        hook = (
            sym.join(labels, F.col("u") == F.col("lv"))
            .groupBy(F.col("v").alias("hv"))
            .agg(F.min("label").alias("hmin"))
        )
        jump = labels.select(
            F.col("lv").alias("jv"), F.col("label").alias("jl")
        )
        labels = (
            labels.join(hook, F.col("lv") == F.col("hv"), "left")
            .join(jump, F.col("label") == F.col("jv"), "left")
            .select(
                F.col("lv"),
                F.least(
                    F.col("label"),
                    F.coalesce(F.col("hmin"), F.col("label")),
                    F.coalesce(F.col("jl"), F.col("label")),
                ).alias("label"),
            )
            .localCheckpoint()
        )
        cur_sum = labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)"))
        ).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(  # see connected_components tripwire (r9)
            f"pointer_jumping_components did not converge in {max_iter} "
            "rounds (needs ~log2(diameter) rounds — raise max_iter)"
        )
    return labels.select(
        F.col("lv").alias("doc_id"), F.col("label").alias("cluster_id")
    )
