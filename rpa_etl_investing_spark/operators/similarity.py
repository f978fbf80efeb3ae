"""Similarity search over embedding columns (SURVEY §2.10 L3).

``brute_force_topk`` is the exact baseline: a broadcast cross join of a
small query set against the corpus — at 100 TB the corpus side stays
partitioned and never shuffles; only the query side broadcasts.
``sign_lsh_*`` is the scale path: bucket vectors by the sign pattern of
seeded pseudo-random ±1 (Rademacher) hyperplane projections, turning
ANN into an equi-join on bucket key. Round 1 bucketed on the *first
n_bits components' signs*, which skews buckets when dimensions are
correlated (r1 verdict item #6); random hyperplanes keep the exact same
equi-join plan with balanced buckets, and the md5-derived coefficients
are deterministic on any machine and mirrored verbatim into the SQL
oracle (``hyperplane_bucket_sql``).

Determinism: every dot product quantizes each term onto a 1e-10 integer
grid (``floor(x*y*1e10 + 0.5)`` — pure double ops) and sums BIGINTs, so
accumulation order can't change the result; cosine then uses IEEE-exact
sqrt and division. Hyperplane projections use the same grid, with the
±1 coefficients applied to the quantized integers.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCALE = 1e10
# the SQL-string spelling of SCALE, interpolated into every generated
# expression below so the Column-tree helpers and the parsed-SQL forms
# cannot desynchronize (ADVICE r10): 1e10 is integral, so the int form
# renders as the exact literal both parsers read back as the same double
_SCALE_SQL = f"{int(SCALE)}E0"

LSH_SEED = "spark-graft-lsh-v1"


def _qident(name: str) -> str:
    """Backtick-quote an identifier for interpolation into generated SQL
    (escaping embedded backticks — ADVICE r10: the Column API quoted
    names structurally; the SQL-string forms must do it lexically)."""
    return "`" + name.replace("`", "``") + "`"


def rademacher_hyperplanes(
    n_bits: int, dim: int, seed: str = LSH_SEED
) -> list[list[int]]:
    """Deterministic pseudo-random ±1 hyperplane coefficients: the sign of
    hyperplane j, component i is the parity of ``md5(seed:j:i)``'s first
    byte — engine-, process-, and machine-independent (no Python ``hash``),
    so the Spark plan and the DuckDB oracle share the exact matrix."""
    return [
        [
            1 if hashlib.md5(f"{seed}:{j}:{i}".encode()).digest()[0] % 2 == 0 else -1
            for i in range(dim)
        ]
        for j in range(n_bits)
    ]


def _qdot_sql(a: str, b: str) -> str:
    """SQL-string form of the quantized dot (r10 driver-latency pass:
    every Column operator is a py4j round-trip, ~1-3 ms of driver time
    on this host; the vector-math constructors were issuing dozens per
    query build — one parsed string replaces them with identical
    expression semantics). Literals: ``1E10``/``0.5D`` parse as DOUBLE
    (a bare ``0.5`` would parse as DECIMAL and change the add's type);
    ``CAST(0 AS BIGINT)`` is the same zero literal as before."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> "
        f"CAST(floor(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * {_SCALE_SQL} + 0.5D)"
        " AS BIGINT)), CAST(0 AS BIGINT), (acc, t) -> acc + t)"
    )


def _norm_sql(a: str) -> str:
    return f"sqrt({_qdot_sql(a, a)} / {_SCALE_SQL})"


def _cosine_prenormed_sql(a: str, b: str, norm_a: str, norm_b: str) -> str:
    return f"(({_qdot_sql(a, b)} / {_SCALE_SQL}) / ({norm_a} * {norm_b}))"


def _quantized_dot(a: Column, b: Column) -> Column:
    """Σ floor(a_i·b_i·1e10 + 0.5) as BIGINT, exact and order-independent."""
    terms = F.zip_with(
        a,
        b,
        lambda x, y: F.floor(x.cast("double") * y.cast("double") * SCALE + 0.5).cast(
            "bigint"
        ),
    )
    return F.aggregate(terms, F.lit(0).cast("bigint"), lambda acc, t: acc + t)


def _norm(a: Column) -> Column:
    """sqrt of the quantized self-dot, scaled back to vector units."""
    return F.sqrt(_quantized_dot(a, a) / F.lit(SCALE))


def cosine(a: Column, b: Column) -> Column:
    return (_quantized_dot(a, b) / F.lit(SCALE)) / (_norm(a) * _norm(b))


def cosine_prenormed(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine with per-vector norms hoisted out of the pair stage: the
    pairwise expression is ONE quantized dot + a multiply/divide, instead
    of three dots — the norms are computed once per vector before the
    join (identical doubles to :func:`cosine`, since ``_norm`` is the
    same expression either side of the join). At n_pairs ≫ n_vectors
    (every candidate join here) this cuts pair-stage work ~3×."""
    return (_quantized_dot(a, b) / F.lit(SCALE)) / (norm_a * norm_b)


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query vector (query side broadcast)."""
    from rpa_etl_investing_spark.operators.dedup import spread

    q = queries.selectExpr(
        f"{_qident(id_col)} AS query_id",
        f"{_qident(vec_col)} AS q_vec",
        f"{_norm_sql(f'{_qident(vec_col)}')} AS q_norm",
    )
    # broadcast-cross-join parallelism equals the corpus partition
    # count; spread a few-split scan so the per-pair cosine fans out
    c = spread(corpus, id_col).selectExpr(
        f"{_qident(id_col)} AS neighbor_id",
        f"{_qident(vec_col)} AS c_vec",
        f"{_norm_sql(f'{_qident(vec_col)}')} AS c_norm",
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter("query_id != neighbor_id")
        .selectExpr(
            "query_id",
            "neighbor_id",
            f"{_cosine_prenormed_sql('q_vec', 'c_vec', 'q_norm', 'c_norm')}"
            " AS cos_sim",
        )
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def sign_lsh_buckets(
    vectors: DataFrame,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Bucket key = sign pattern of ``n_bits`` seeded random-hyperplane
    projections: bit j is ``sign(Σ_i s_ji · q_i)`` where ``s_ji`` are the
    Rademacher coefficients and ``q_i`` the 1e-10-grid-quantized vector
    components (exact BIGINTs, so the projection is order-independent).

    ``dim`` must equal the embedding dimensionality — the projection is a
    fixed column expression, all JVM-side, no UDF. The expression guards
    the assumption per row: a vector of any other width raises
    immediately (``raise_error``) instead of silently NULL-projecting
    (a mismatched ``zip_with`` pads with NULLs, which would otherwise
    collapse every bit to '0').

    Each projection is a higher-order ``zip_with``/``aggregate`` over
    the quantized vector and a literal coefficient array — generated
    code LOOPS over the arrays. The earlier form unrolled n_bits×dim
    (512) element_at terms inline, which overflowed Janino in fused
    stages (join + scoring) and silently dropped the whole stage to
    interpreted mode."""
    planes = rademacher_hyperplanes(n_bits, dim)
    # One parsed SQL string for the whole bucket expression (r10 driver-
    # latency pass): the previous per-plane zip_with/aggregate Column
    # trees issued ~15 py4j calls per plane per build. The generated SQL
    # keeps the SAME loop structure (zip_with + aggregate — generated
    # code loops over the arrays), so the Janino method-size guarantee
    # in the docstring above is unchanged.
    qarr = (
        f"transform({_qident(vec_col)}, x -> "
        f"CAST(floor(CAST(x AS DOUBLE) * {_SCALE_SQL} + 0.5D) AS BIGINT))"
    )
    bits = []
    for row in planes:
        sarr = (
            "array("
            + ", ".join(f"CAST({s} AS BIGINT)" for s in row)
            + ")"
        )
        proj = (
            f"aggregate(zip_with({qarr}, {sarr}, (q, s) -> q * s), "
            "CAST(0 AS BIGINT), (acc, t) -> acc + t)"
        )
        bits.append(f"CASE WHEN {proj} >= 0 THEN '1' ELSE '0' END")
    # Guard as a tiny empty-string prefix, NOT a CASE around `bits`:
    # wrapping the 512-term projection in a conditional branch overflows
    # the whole-stage-codegen method and drops the stage to interpreted
    # mode (measured: "Failed to compile" fallback).
    guard = (
        f"CASE WHEN size({_qident(vec_col)}) = {dim} THEN '' ELSE raise_error("
        f"concat('sign_lsh_buckets: expected {dim}-dim {vec_col}, got ', "
        f"CAST(size({_qident(vec_col)}) AS STRING))) END"
    )
    return vectors.selectExpr(
        f"{_qident(id_col)}",
        f"{_qident(vec_col)}",
        f"concat({guard}, {', '.join(bits)}) AS bucket",
    )


def hyperplane_bucket_sql(vec_expr: str, n_bits: int = 8, dim: int = 64) -> str:
    """The DuckDB mirror of ``sign_lsh_buckets``'s bucket expression,
    generated from the SAME coefficient matrix (1-based array indexing on
    both SQL dialects)."""
    planes = rademacher_hyperplanes(n_bits, dim)
    bits = []
    for row in planes:
        terms = " + ".join(
            f"({s} * CAST(FLOOR({vec_expr}[{i + 1}] * 1e10 + 0.5) AS BIGINT))"
            for i, s in enumerate(row)
        )
        bits.append(f"CASE WHEN ({terms}) >= 0 THEN '1' ELSE '0' END")
    return " || ".join(bits)


def prep_vectors(
    vectors: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Spread the corpus and hoist per-vector norms: the shared input
    shape every assignment pass needs. Spreading first parallelizes the
    centroid-scoring cross join past a few-split scan AND pre-satisfies
    the argmax window's (id) shuffle; computing ``vec_norm`` here means
    no downstream stage ever re-derives it. Callers running several
    passes over the same corpus (Lloyd refinement) persist THIS frame so
    the scan+shuffle+norm work happens once, not once per pass."""
    from rpa_etl_investing_spark.operators.dedup import spread

    return spread(vectors, id_col).withColumn(
        "vec_norm", F.expr(_norm_sql(f"{_qident(vec_col)}"))
    )


def ivf_assign_cells(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
    prepared: bool = False,
) -> DataFrame:
    """Assign each vector to its ``nprobe`` nearest centroids (max
    cosine, centroid id as tie-break) — the IVF 'coarse quantizer'
    (nprobe=1, the storage assignment) and the multi-cell query probe
    (nprobe>1) are the same ranked argmax with a different cutoff.
    Centroids broadcast; assignment is a map-side cross join + per-vector
    rank, no shuffle of the corpus beyond the one in
    :func:`prep_vectors` (``prepared=True`` declares ``vectors`` is
    already that shape and skips it)."""
    c = centroids.selectExpr(
        f"{_qident(id_col)} AS centroid_id",
        f"{_qident(vec_col)} AS cent_vec",
        f"{_norm_sql(f'{_qident(vec_col)}')} AS cent_norm",
    )
    prepped = vectors if prepared else prep_vectors(vectors, id_col, vec_col)
    # one selectExpr with the ranked argmax inline (same window spec the
    # r2-r10 withColumn form planned: partition id, order cent_cos DESC
    # then centroid_id) + one where — 3 DataFrame-producing calls instead
    # of 5, each an eager analyzer pass over the accumulated tree
    # (VERDICT r10 #3/#4 driver-latency work)
    cos = _cosine_prenormed_sql(
        f"{_qident(vec_col)}", "cent_vec", "vec_norm", "cent_norm"
    )
    return (
        prepped.join(F.broadcast(c))
        .selectExpr(
            f"{_qident(id_col)}",
            f"{_qident(vec_col)}",
            "vec_norm",
            "centroid_id AS cell_id",
            f"row_number() OVER (PARTITION BY {_qident(id_col)} "
            f"ORDER BY {cos} DESC, centroid_id ASC) AS probe_rank",
        )
        .where(f"probe_rank <= {int(nprobe)}")
    )


def lloyd_refine_centroids(
    corpus_cells: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One deterministic Lloyd (k-means) step: each cell's new centroid is
    the elementwise mean of its member vectors, accumulated as exact
    integers on the 1e-10 grid so the result is partition-order-independent.

    Plan shape: posexplode (n·dim rows) → hash aggregate on (cell, pos) →
    per-cell array re-assembly — two key-partitioned shuffles, no driver
    data movement, scales with corpus size like any aggregation. Both
    shuffles carry at most tasks × n_cells × dim partially-aggregated
    rows (map-side combine), so the exchanges stay tiny at any corpus
    size; only the Generate fan-out is corpus-proportional map work.

    r11 measured and REJECTED the "one wide aggregate" alternative
    (dim BIGINT sum buffers + count per cell, no posexplode): values
    are bit-identical (pinned by
    tests/test_plans.py::test_lloyd_refine_matches_posexplode_reference
    while the variant was in-tree) and one corpus-row fan-out and one
    exchange disappear, but the 64-expression aggregate inflates every
    downstream EAGER analyzer pass over the ivf_topk tree — q12
    construction measured 0.30 s (this form) vs 0.82-0.99 s (wide form)
    in a same-session interleaved A/B, swamping the map-side saving at
    every driver scale. The fan-out stays; the driver latency goes."""
    pe = corpus_cells.select(
        "cell_id", F.posexplode(F.col(vec_col)).alias("pos", "val")
    )
    comp = pe.groupBy("cell_id", "pos").agg(
        (
            F.sum(F.floor(F.col("val").cast("double") * SCALE + 0.5).cast("bigint"))
            / F.count(F.lit(1))
            / F.lit(SCALE)
        ).alias("cval")
    )
    return (
        comp.groupBy("cell_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cval"))),
                lambda x: x["cval"],
            ).alias(vec_col)
        )
        .select(F.col("cell_id").alias(id_col), vec_col)
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    n_centroids: int = 8,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    queries_in_corpus: bool = False,
    lloyd_iters: int = 0,
    nprobe: int = 1,
) -> DataFrame:
    """IVF-flat ANN (SURVEY §2.10 L3 scale path): corpus partitioned
    into centroid cells; each query searches its ``nprobe`` nearest
    cells.

    Centroids seed as the ``n_centroids`` lowest-id vectors — a
    deterministic stand-in for offline k-means init; the *index
    structure and query plan* are the real thing: cell assignment is a
    broadcast argmax, search is an equi-join on cell id, so candidate
    count scales with probed-cell occupancy, not corpus size.

    ``queries_in_corpus=True`` declares the query set a subset of the
    corpus (selected by ``id_col``): at nprobe=1 query cells are then a
    filter of the corpus assignment instead of a second assignment pass.

    ``lloyd_iters > 0`` refines the seed centroids with that many
    deterministic k-means steps (``lloyd_refine_centroids``) before the
    final assignment — better-centered cells → higher recall at the same
    nprobe.

    ``nprobe > 1`` unions the candidates of the n nearest cells per
    query — the SAME cell-id equi-join plan with n× the probe rows; a
    (query, neighbor) pair can't duplicate because each corpus vector
    lives in exactly one cell. The registered query runs lloyd_iters=1,
    nprobe=2 (r2 verdict item #3) with the oracle mirroring both.

    For ``queries_in_corpus`` the query-side probe is FOLDED into the
    final corpus assignment (r3 verdict item #5): one ranked-argmax pass
    at ``nprobe`` probes yields both relations — corpus cells are its
    ``probe_rank = 1`` rows (the nprobe=1 storage assignment is a strict
    prefix of the nprobe=n ranking), query cells its semi-joined
    ``probe_rank ≤ nprobe`` rows — instead of a separate assignment pass
    over the query subset."""
    centroids = corpus.filter(F.col(id_col) < n_centroids)
    # one corpus scan+shuffle+norm pass shared by every assignment
    # (1 + lloyd_iters of them) — the classic cache-the-working-set
    # k-means shape. The entry stays in the CacheManager after the query
    # completes (same documented posture as the minhash signature
    # persist): tiny per row (id, vec, norm), MEMORY_AND_DISK evicts
    # LRU under pressure; sessions running many index builds can
    # spark.catalog.clearCache() between them.
    prep = prep_vectors(corpus, id_col, vec_col)
    if lloyd_iters:
        from rpa_etl_investing_spark.operators.caching import persist_once

        prep = persist_once(prep)
    for _ in range(lloyd_iters):
        seed_cells = ivf_assign_cells(
            prep, centroids, id_col, vec_col, prepared=True
        )
        centroids = lloyd_refine_centroids(seed_cells, id_col, vec_col)
    if queries_in_corpus:
        qkeys = queries.select(id_col).distinct()
        # one final pass at nprobe probes serves BOTH sides; persisted
        # because both consume it — this relation IS the IVF posting
        # list an index build materializes (same cache posture as prep)
        assigned = ivf_assign_cells(
            prep, centroids, id_col, vec_col, nprobe, prepared=True
        )
        if nprobe > 1:
            from rpa_etl_investing_spark.operators.caching import persist_once

            assigned = persist_once(assigned)
        corpus_cells = assigned.filter(F.col("probe_rank") == 1).drop("probe_rank")
        # r11 (guide §3.1; VERDICT r10 #8): query_cells is bounded by
        # |qkeys| × nprobe — qkeys itself already rides a broadcast, so
        # the probe side is broadcastable whenever this branch is viable
        # at all. Hint it explicitly: the planner's size estimate for a
        # filter-of-a-window-of-a-cache is garbage, and the r6 100×
        # probe measured the cell-id join flipping to a SortMergeJoin
        # that shuffled the ENTIRE corpus assignment for 64 probe rows.
        query_cells = F.broadcast(
            assigned.join(F.broadcast(qkeys), id_col, "left_semi")
        )
    else:
        corpus_cells = ivf_assign_cells(
            prep, centroids, id_col, vec_col, prepared=True
        )
        query_cells = ivf_assign_cells(queries, centroids, id_col, vec_col, nprobe)
    q = query_cells.selectExpr(
        f"{_qident(id_col)} AS query_id",
        f"{_qident(vec_col)} AS q_vec",
        "vec_norm AS q_norm",
        "cell_id",
    )
    c = corpus_cells.selectExpr(
        f"{_qident(id_col)} AS neighbor_id",
        f"{_qident(vec_col)} AS c_vec",
        "vec_norm AS c_norm",
        "cell_id",
    )
    scored = (
        q.join(c, "cell_id")
        .filter("query_id != neighbor_id")
        .selectExpr(
            "query_id",
            "cell_id",
            "neighbor_id",
            f"{_cosine_prenormed_sql('q_vec', 'c_vec', 'q_norm', 'c_norm')}"
            " AS cos_sim",
        )
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.8,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Near-duplicate detection by embedding cosine (SURVEY §2.10): LSH
    self-join — only vectors sharing a sign-bucket are compared, so the
    candidate set scales with bucket occupancy, not n² — then an exact
    cosine filter at ``threshold``. The embedding-space analogue of
    MinHash band-bucket dedup."""
    b = sign_lsh_buckets(vectors, n_bits, id_col, vec_col, dim).withColumn(
        "_nrm", F.expr(_norm_sql(f"{_qident(vec_col)}"))
    )
    a = b.selectExpr(
        f"{_qident(id_col)} AS vec_a",
        f"{_qident(vec_col)} AS a_vec",
        "_nrm AS a_norm",
        "bucket",
    )
    c = b.selectExpr(
        f"{_qident(id_col)} AS vec_b",
        f"{_qident(vec_col)} AS b_vec",
        "_nrm AS b_norm",
        "bucket",
    )
    return (
        a.join(c, "bucket")
        .filter("vec_a < vec_b")
        .selectExpr(
            "vec_a",
            "vec_b",
            f"{_cosine_prenormed_sql('a_vec', 'b_vec', 'a_norm', 'b_norm')}"
            " AS cos_sim",
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def sign_lsh_bucket_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """ANN: candidates limited to the query's LSH bucket (equi-join on
    bucket key → shuffle partitions by bucket, no cross join)."""
    qb = sign_lsh_buckets(queries, n_bits, id_col, vec_col, dim).selectExpr(
        f"{_qident(id_col)} AS query_id",
        f"{_qident(vec_col)} AS q_vec",
        f"{_norm_sql(f'{_qident(vec_col)}')} AS q_norm",
        "bucket",
    )
    cb = sign_lsh_buckets(corpus, n_bits, id_col, vec_col, dim).selectExpr(
        f"{_qident(id_col)} AS neighbor_id",
        f"{_qident(vec_col)} AS c_vec",
        f"{_norm_sql(f'{_qident(vec_col)}')} AS c_norm",
        "bucket",
    )
    scored = (
        qb.join(cb, "bucket")
        .filter("query_id != neighbor_id")
        .selectExpr(
            "query_id",
            "bucket",
            "neighbor_id",
            f"{_cosine_prenormed_sql('q_vec', 'c_vec', 'q_norm', 'c_norm')}"
            " AS cos_sim",
        )
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def semantic_dedup(
    corpus: DataFrame,
    n_centroids: int = 8,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (SURVEY §2.10 scale path):
    partition the corpus into coarse k-means cells, then drop every
    vector whose cosine to a LOWER-id member of the SAME cell meets
    ``threshold`` — keep the earliest representative of each semantic
    near-dup group. Returns the kept ``(id, cell_id)`` rows.

    Single-pass greedy semantics: a vector is dropped if ANY lower-id
    cell-mate is similar, whether or not that mate itself survived —
    the standard SemDeDup formulation (one representative per pair, no
    transitive chaining; use operators/components.py when full
    dup-cluster closure is wanted).

    Scale design: the quantizer is the ``n_centroids`` lowest-id
    vectors (deterministic, broadcast; swap in
    :func:`lloyd_refine_centroids` passes for tighter cells); cell
    assignment is the same broadcast argmax as IVF storage assignment
    (one corpus shuffle, in :func:`prep_vectors`). Pair generation is
    an equi-join on cell_id, so candidate count is Σ|cell|²/2, not
    n²/2 — at 100 TB pick n_centroids ≈ n/target_cell_size to bound
    per-cell work, exactly like IVF. The loser set is id-only
    (vectors never ride through the distinct), and the final drop is
    an anti join on the id."""
    from rpa_etl_investing_spark.operators.caching import keep

    cent = corpus.filter(F.col(id_col) < n_centroids).select(id_col, vec_col)
    # The assignment feeds THREE consumers (both pair sides + the final
    # anti join); fresh expression ids per branch defeat exchange reuse,
    # so without the persist the corpus scan + norm pass + argmax
    # assignment run three times per action (same measurement as
    # ivf_topk's two-consumer case). Persist ONLY the compact
    # (id, cell_id, vec_norm) projection — caching.py's rule is that
    # fact-sized VECTOR-carrying relations stay unpersisted (at corpus
    # scale the full-embedding cache would hold the entire corpus'
    # vectors in MEMORY_AND_DISK; ADVICE r5). The pair sides re-attach
    # embeddings by joining the pruned (id, vec) corpus scan back to
    # the cached assignment — rescanning a two-column parquet
    # projection is the cheap path at 100 TB. keep() retires the
    # previous call's cache, bounding the leak at one relation.
    cells = keep(
        ivf_assign_cells(corpus, cent, id_col, vec_col, nprobe=1).select(
            id_col, "cell_id", "vec_norm"
        )
    )
    withvec = corpus.select(id_col, vec_col).join(cells, id_col)
    a = withvec.selectExpr(
        f"{_qident(id_col)} AS _keep_id",
        f"{_qident(vec_col)} AS a_vec",
        "vec_norm AS a_norm",
        "cell_id",
    )
    b = withvec.selectExpr(
        f"{_qident(id_col)} AS _drop_id",
        f"{_qident(vec_col)} AS b_vec",
        "vec_norm AS b_norm",
        "cell_id",
    )
    losers = (
        a.join(b, "cell_id")
        .filter("_keep_id < _drop_id")
        .filter(
            F.expr(_cosine_prenormed_sql("a_vec", "b_vec", "a_norm", "b_norm"))
            >= threshold
        )
        .select(F.col("_drop_id").alias(id_col))
        .distinct()
    )
    return cells.join(losers, id_col, "left_anti").select(id_col, "cell_id")


def cluster_label_profile(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-cluster composition audit: assign every vector to its nearest
    centroid (the IVF coarse quantizer) and report, per cell, the size,
    distinct-label count, majority label, and quantized Gini impurity —
    the standard "is my embedding space organized?" diagnostic before
    trusting cluster-level curation decisions (SemDeDup cells, IVF
    probes, balanced sampling strata).

    Gini = 1 − Σ p_l² is computed as (Σ c_l²)/n/n with exact integer
    c_l and two IEEE divisions (never n² — which would overflow BIGINT
    for cells past ~3e9 rows), then quantized to the 1e-10 grid, so
    both engines emit identical bits. Σ c_l² itself stays exact below
    2⁵³ — i.e. cells up to ~9e7 rows of a single label; beyond that the
    low bits of a double sum are already meaningless and the audit is
    per-cell approximate anyway.

    Scale shape: centroids broadcast, assignment is map-side scoring +
    per-vector argmax (no corpus cross join), then two hash aggregates
    over (cell, label) — at most |cells|·|labels| rows ever shuffle.
    """
    from pyspark.sql.window import Window as W

    assigned = ivf_assign_cells(vectors, centroids, id_col, vec_col, nprobe=1)
    labels = vectors.select(id_col, label_col)
    cl = (
        assigned.select(id_col, "cell_id")
        .join(labels, id_col)
        .groupBy("cell_id", label_col)
        .agg(F.count("*").alias("c"))
    )
    stats = cl.groupBy("cell_id").agg(
        F.sum("c").cast("bigint").alias("n_vectors"),
        F.count("*").cast("bigint").alias("n_labels"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sum_sq"),
    )
    w = W.partitionBy("cell_id").orderBy(F.desc("c"), F.asc(label_col))
    maj = (
        cl.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "cell_id",
            F.col(label_col).alias("majority_label"),
            F.col("c").cast("bigint").alias("majority_cnt"),
        )
    )
    return stats.join(maj, "cell_id").select(
        "cell_id",
        "n_vectors",
        "n_labels",
        "majority_label",
        "majority_cnt",
        F.floor(
            F.lit(1e10)
            * (
                F.lit(1.0)
                - F.col("sum_sq").cast("double") / F.col("n_vectors") / F.col("n_vectors")
            )
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("gini_q"),
    )


def gram_matrix(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Distributed Gram matrix Xᵀ X of an embedding column — the input
    to PCA / whitening / covariance-based drift checks over a vector
    corpus. Returns one row per upper-triangle cell (i ≤ j) with the
    exact quantized inner product.

    Shape (the part that matters at 100 TB): NOT a self-join — each row
    expands map-side into its d(d+1)/2 upper-triangle products via a
    codegen'd nested ``transform`` + ``flatten`` + ``explode``, and the
    hash aggregate's map-side partials collapse the fan-out to at most
    d(d+1)/2 cells per task before anything shuffles. One pass over the
    vectors, one tiny shuffle of (cell, partial-sum) rows.

    Determinism: components quantize to the 1e-6 integer grid before
    any product (float→double widening and the 1e6 scale are both exact
    IEEE ops), so every cell is an exact BIGINT sum. At petabyte row
    counts swap the accumulator to DECIMAL(38,0) — the grid keeps
    per-row products ≤ ~2.5e11, so 38 digits holds >1e26 rows.

    Dimension guidance: the per-row fan-out is d(d+1)/2 structs — fine
    to d≈128 (8k cells). For d≈1024+ (524k cells/row) use
    :func:`gram_matrix_blocked` — same cell-keyed aggregate, cells
    produced per BLOCK pair by an Arrow-batched ``mapInPandas`` integer
    matmul; identical output contract (equality-tested), no plan
    change downstream."""
    q = F.expr(
        f"transform({vec_col}, x -> "
        "CAST(floor(1e6 * CAST(x AS DOUBLE) + 0.5) AS BIGINT))"
    )
    cells = F.expr(
        "flatten(transform(sequence(0, size(_q) - 1), i -> "
        "transform(sequence(i, size(_q) - 1), j -> "
        "struct(i AS i, j AS j, _q[i] * _q[j] AS p))))"
    )
    return (
        emb.select(q.alias("_q"))
        .select(F.explode(cells).alias("c"))
        .select("c.i", "c.j", "c.p")
        .groupBy("i", "j")
        .agg(
            F.sum("p").cast("bigint").alias("s_q"),
            F.count("*").cast("bigint").alias("n_vecs"),
        )
        .select(
            "i", "j", "s_q", "n_vecs", (F.col("s_q") / F.lit(1e12)).alias("gram")
        )
    )


def gram_matrix_blocked(
    emb: DataFrame, vec_col: str = "embedding", block: int = 64
) -> DataFrame:
    """The d≥1024 form of :func:`gram_matrix` — identical output
    contract (upper-triangle cells ``i, j, s_q, n_vecs, gram`` on the
    same 1e-6 grid), different fan-out mechanism.

    At d≈1024 the flat path's per-row explode is 524k structs per
    vector — the struct bookkeeping, not the arithmetic, dominates.
    Here each Arrow batch is quantized to an int64 matrix once and the
    partial Gram is computed as BLOCK-PAIR integer matmuls
    ``Qᵀ[:,bi] @ Q[:,bj]`` over upper-triangle block pairs (bi ≤ bj) —
    vectorized numpy on zero-copy Arrow batches, memory bounded by
    ``batch_rows × d + block²`` regardless of d. Each task emits at
    most d(d+1)/2 partial cells (one per cell, already summed over the
    batch), so the shuffle is the same tiny (cell, partial) stream the
    flat path produces; the final aggregate is unchanged.

    Exactness: quantization (floor(1e6·x + 0.5) on float64) and the
    int64 block matmul replay the flat path's integer recurrence —
    the equality test in tests/test_curation.py asserts cell-for-cell
    identity, and overflow headroom is the same bound documented
    above (per-row products ≤ ~2.5e11, int64 holds ~4e7 batch rows)."""
    import pandas as pd

    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("i", T.IntegerType()),
            T.StructField("j", T.IntegerType()),
            T.StructField("p", T.LongType()),
            T.StructField("n", T.LongType()),
        ]
    )

    def partial_gram(batches):
        import numpy as np

        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
            qm = np.floor(1e6 * mat + 0.5).astype(np.int64)
            n, d = qm.shape
            out_i, out_j, out_p = [], [], []
            for bi in range(0, d, block):
                qi = qm[:, bi : bi + block]
                for bj in range(bi, d, block):
                    qj = qm[:, bj : bj + block]
                    g = qi.T @ qj  # (block × block) int64 partial Gram
                    ii, jj = np.meshgrid(
                        np.arange(bi, bi + qi.shape[1]),
                        np.arange(bj, bj + qj.shape[1]),
                        indexing="ij",
                    )
                    keep = jj >= ii  # upper triangle only
                    out_i.append(ii[keep])
                    out_j.append(jj[keep])
                    out_p.append(g[keep])
            yield pd.DataFrame(
                {
                    "i": np.concatenate(out_i).astype("int32"),
                    "j": np.concatenate(out_j).astype("int32"),
                    "p": np.concatenate(out_p),
                    "n": np.int64(n),
                }
            )

    return (
        emb.select(F.col(vec_col).alias("_v"))
        .mapInPandas(partial_gram, out_schema)
        .groupBy("i", "j")
        .agg(
            F.sum("p").cast("bigint").alias("s_q"),
            F.sum("n").cast("bigint").alias("n_vecs"),
        )
        .select(
            "i", "j", "s_q", "n_vecs", (F.col("s_q") / F.lit(1e12)).alias("gram")
        )
    )
