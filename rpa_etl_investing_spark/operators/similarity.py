"""Similarity search over embedding columns (SURVEY §2.10 L3).

``brute_force_topk`` is the exact baseline: a broadcast cross join of a
small query set against the corpus — at 100 TB the corpus side stays
partitioned and never shuffles; only the query side broadcasts.
``sign_lsh_*`` is the scale path: bucket vectors by the sign pattern of
their leading components (axis-aligned hyperplane LSH), turning ANN
into an equi-join on bucket key. A production system would use random
hyperplanes or IVF centroids; the sign bucket keeps the plan identical
while staying reproducible in the SQL oracle.

Determinism: every dot product quantizes each term onto a 1e-10 integer
grid (``floor(x*y*1e10 + 0.5)`` — pure double ops) and sums BIGINTs, so
accumulation order can't change the result; cosine then uses IEEE-exact
sqrt and division.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCALE = 1e10


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


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query vector (query side broadcast)."""
    from rpa_etl_investing_spark.operators.dedup import spread

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    # broadcast-cross-join parallelism equals the corpus partition
    # count; spread a few-split scan so the per-pair cosine fans out
    c = spread(corpus, id_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_vec"), F.col("c_vec")).alias("cos_sim"),
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
) -> DataFrame:
    """Bucket key = sign pattern of the first ``n_bits`` components."""
    bits = F.concat(
        *[
            F.when(F.element_at(F.col(vec_col), i + 1) >= 0, F.lit("1")).otherwise(
                F.lit("0")
            )
            for i in range(n_bits)
        ]
    )
    return vectors.select(
        F.col(id_col), F.col(vec_col), bits.alias("bucket")
    )


def ivf_assign_cells(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid (max cosine, centroid
    id as tie-break) — the IVF 'coarse quantizer'. Centroids broadcast;
    assignment is a map-side cross join + per-vector argmax, no shuffle
    of the corpus."""
    from rpa_etl_investing_spark.operators.dedup import spread

    c = centroids.select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cent_vec")
    )
    # spread first: the broadcast cross join runs inside the scan stage,
    # so a few-split corpus would score all centroid dots on few cores —
    # and partitioning by id pre-satisfies the argmax window's shuffle
    scored = spread(vectors, id_col).join(F.broadcast(c)).select(
        id_col,
        vec_col,
        "centroid_id",
        cosine(F.col(vec_col), F.col("cent_vec")).alias("cent_cos"),
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy(id_col).orderBy(F.desc("cent_cos"), F.asc("centroid_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, vec_col, F.col("centroid_id").alias("cell_id"))
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    n_centroids: int = 8,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    queries_in_corpus: bool = False,
) -> DataFrame:
    """IVF-flat ANN (SURVEY §2.10 L3 scale path): corpus partitioned
    into centroid cells; each query searches only its own cell (nprobe=1).

    Centroids are the ``n_centroids`` lowest-id vectors — a deterministic
    stand-in for k-means training (which is an offline step in any IVF
    system); the *index structure and query plan* are the real thing:
    cell assignment is a broadcast argmax, search is an equi-join on
    cell id, so candidate count scales with cell occupancy, not corpus
    size.

    ``queries_in_corpus=True`` declares the query set a subset of the
    corpus (selected by ``id_col``): query cells are then a filter of
    the corpus assignment instead of a second assignment pass."""
    centroids = corpus.filter(F.col(id_col) < n_centroids)
    corpus_cells = ivf_assign_cells(corpus, centroids, id_col, vec_col)
    if queries_in_corpus:
        qkeys = queries.select(id_col).distinct()
        query_cells = corpus_cells.join(F.broadcast(qkeys), id_col, "left_semi")
    else:
        query_cells = ivf_assign_cells(queries, centroids, id_col, vec_col)
    q = query_cells.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), "cell_id"
    )
    c = corpus_cells.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"), "cell_id"
    )
    scored = (
        q.join(c, "cell_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "cell_id",
            "neighbor_id",
            cosine(F.col("q_vec"), F.col("c_vec")).alias("cos_sim"),
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
) -> DataFrame:
    """Near-duplicate detection by embedding cosine (SURVEY §2.10): LSH
    self-join — only vectors sharing a sign-bucket are compared, so the
    candidate set scales with bucket occupancy, not n² — then an exact
    cosine filter at ``threshold``. The embedding-space analogue of
    MinHash band-bucket dedup."""
    b = sign_lsh_buckets(vectors, n_bits, id_col, vec_col)
    a = b.select(
        F.col(id_col).alias("vec_a"), F.col(vec_col).alias("a_vec"), "bucket"
    )
    c = b.select(
        F.col(id_col).alias("vec_b"), F.col(vec_col).alias("b_vec"), "bucket"
    )
    return (
        a.join(c, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            cosine(F.col("a_vec"), F.col("b_vec")).alias("cos_sim"),
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
) -> DataFrame:
    """ANN: candidates limited to the query's LSH bucket (equi-join on
    bucket key → shuffle partitions by bucket, no cross join)."""
    qb = sign_lsh_buckets(queries, n_bits, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), "bucket"
    )
    cb = sign_lsh_buckets(corpus, n_bits, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"), "bucket"
    )
    scored = (
        qb.join(cb, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "bucket",
            "neighbor_id",
            cosine(F.col("q_vec"), F.col("c_vec")).alias("cos_sim"),
        )
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
