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
from rpa_etl_investing_spark.operators.dedup import (
    N_MINHASH,
    exact_dedup,
    minhash_candidate_pairs,
    ngram_jaccard_pairs,
)
from rpa_etl_investing_spark.operators.prefix import (
    SHARD,
    sharded_row_number,
    sharded_running_sum,
    with_id_range_shard,
)
from rpa_etl_investing_spark.operators.sampling import (
    deterministic_split,
    frac_to_hex,
    weighted_source_mix,
)
from rpa_etl_investing_spark.operators.similarity import (
    embedding_near_dup_pairs,
    hyperplane_bucket_sql,
)
from rpa_etl_investing_spark.plans.llm_queries import (
    _BANDS_CTES,
    _cos_sql,
    _SH_CTE,
    _SIG_CTE,
    _TOK_CTE,
)
from rpa_etl_investing_spark.plans.registry import register

_BUCKET_SQL = "substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)"


def _pd_cc_ctes(p: str, pairs: str, rounds: int = 10) -> str:
    """Pointer-doubling connected-components ORACLE (r8, verdict item
    #1): CTE chain computing per-vertex min-label components in
    O(log diameter) label-to-label joins instead of the recursive-CTE
    transitive closure the r1–r7 oracles used. The closure's ``reach``
    relation materializes Σ cluster² rows — the named sf1 wall for all
    four dup-graph queries — while this chain keeps ONE label row per
    vertex per round: round k's label is the min over (self, neighbor
    labels [hook], label-of-label [jump]); measured reach doubles per
    round (2^k), so ``rounds``=10 covers component diameter 1024.
    Every round is MATERIALIZED — DuckDB would otherwise inline the
    whole chain into each reference (the r5 k-core / r7 unrolling dead
    end: 160× slower).

    Convergence tripwire: one extra round runs after round R, and
    ``{p}_labels`` keeps rows only if R and R+1 agree EVERYWHERE — an
    under-provisioned diameter empties the result, surfacing as a loud
    row-count MISMATCH in the sweep rather than silently wrong labels
    (prototyped: a 301-vertex chain at rounds=8 yields 0 rows, at 10
    matches the recursive closure exactly).

    Emits CTE definitions ``{p}_edges``, ``{p}_l0..l{R+1}``,
    ``{p}_labels(v, lbl)``; splice into a WITH list."""
    parts = [
        f"""{p}_edges AS MATERIALIZED (
      SELECT doc_a AS v, doc_b AS u FROM {pairs}
      UNION SELECT doc_b, doc_a FROM {pairs})""",
        f"""{p}_l0 AS MATERIALIZED (
      SELECT v, MIN(u) AS lbl FROM (
        SELECT v, v AS u FROM (SELECT DISTINCT v FROM {p}_edges) AS {p}_verts
        UNION ALL SELECT v, u FROM {p}_edges) GROUP BY v)""",
    ]
    for k in range(1, rounds + 2):
        parts.append(
            f"""{p}_l{k} AS MATERIALIZED (
      SELECT v, MIN(lbl) AS lbl FROM (
        SELECT v, lbl FROM {p}_l{k - 1}
        UNION ALL
        SELECT e.v, t.lbl FROM {p}_edges e JOIN {p}_l{k - 1} t ON t.v = e.u
        UNION ALL
        SELECT t.v, t2.lbl FROM {p}_l{k - 1} t JOIN {p}_l{k - 1} t2
          ON t2.v = t.lbl
      ) GROUP BY v)"""
        )
    parts.append(
        f"""{p}_labels AS MATERIALIZED (
      SELECT v, lbl FROM {p}_l{rounds + 1}
      WHERE NOT EXISTS (
        SELECT 1 FROM {p}_l{rounds} a JOIN {p}_l{rounds + 1} b
        ON a.v = b.v AND a.lbl <> b.lbl))"""
    )
    return ",\n    ".join(parts)


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


# shared n-gram-Jaccard pair pipeline for the three dup-graph oracles;
# the heavy intermediates are MATERIALIZED so DuckDB computes the bucket
# self-join once per query, not once per reference (sf1 discipline)
_NG_PAIRS_CTES = f"""{_TOK_CTE}, {_SH_CTE},
    ex AS (SELECT DISTINCT doc_id, sh FROM shx),
    keep AS (SELECT sh FROM ex GROUP BY sh HAVING COUNT(*) <= 1000),
    exf AS MATERIALIZED (SELECT ex.* FROM ex JOIN keep USING (sh)),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM exf GROUP BY doc_id),
    shared AS MATERIALIZED (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
      FROM exf a JOIN exf b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id),
    ng_pairs AS MATERIALIZED (
      SELECT doc_a, doc_b
      FROM shared
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE n_shared / (sa.n_sh + sb.n_sh - n_shared) >= 0.05)"""


@register(
    "curation_dup_clusters",
    oracle=f"""
    WITH {_NG_PAIRS_CTES},
    {_pd_cc_ctes("ng", "ng_pairs")}
    SELECT v AS doc_id, lbl AS cluster_id FROM ng_labels
    """,
)
def curation_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → duplicate clusters: connected components over
    the 3-gram-Jaccard pair graph, labeling every clustered doc with
    its component's min doc_id (the canonical survivor). The oracle
    recomputes the same components by pointer-doubling label joins
    (``_pd_cc_ctes``: O(log diameter) rounds, linear rows per round —
    tractable at EVERY fixture scale including sf1, unlike the r1–r7
    recursive closure whose reach relation was Σ cluster² rows), while
    the Spark side uses O(diameter) label-propagation rounds
    (operators/components.py)."""
    docs = tbl(spark, sf_dir, "documents")
    return connected_components(ngram_jaccard_pairs(docs))


@register(
    "curation_dup_clusters_star",
    oracle=f"""
    WITH {_NG_PAIRS_CTES},
    {_pd_cc_ctes("ng", "ng_pairs")}
    SELECT v AS doc_id, lbl AS cluster_id FROM ng_labels
    """,
)
def curation_dup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same clustering contract as ``curation_dup_clusters`` computed by
    the SoCC'14 large-star/small-star contraction instead of label
    propagation — O(log² n) rounds on ANY graph topology (the 100 TB
    worst-case guarantee label propagation lacks on long chains). Both
    implementations are checked against the identical recursive-closure
    oracle, so the driver sees the star path verified, not just the
    pytest property tests (the r2 verdict's Lloyd lesson: register the
    machinery, don't only test it)."""
    from rpa_etl_investing_spark.operators.components import (
        large_small_star_components,
    )

    docs = tbl(spark, sf_dir, "documents")
    return large_small_star_components(ngram_jaccard_pairs(docs))


@register(
    "curation_dup_clusters_jump",
    oracle=f"""
    WITH {_NG_PAIRS_CTES},
    {_pd_cc_ctes("ng", "ng_pairs")}
    SELECT v AS doc_id, lbl AS cluster_id FROM ng_labels
    """,
)
def curation_dup_clusters_jump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r8: same clustering contract computed by HOOK+JUMP pointer
    jumping (``operators/components.pointer_jumping_components``) —
    O(log diameter) rounds of linear label joins, the engine twin of
    the pointer-doubling oracle that replaced the r1–r7 recursive
    closure. All THREE components algorithms (label-prop O(d), star
    O(log² n), pointer-jumping O(log d)) now answer the identical
    oracle, so an implementation bug in any one of them shows up as a
    three-way disagreement at the driver gate, not a pytest-only
    property."""
    from rpa_etl_investing_spark.operators.components import (
        pointer_jumping_components,
    )

    docs = tbl(spark, sf_dir, "documents")
    return pointer_jumping_components(ngram_jaccard_pairs(docs))


@register(
    "curation_canonical_docs",
    oracle=f"""
    WITH {_NG_PAIRS_CTES},
    {_pd_cc_ctes("ng", "ng_pairs")},
    clusters AS (
      SELECT v AS doc_id, lbl AS cluster_id FROM ng_labels)
    SELECT cluster_id,
           CAST(doc_id AS BIGINT) AS kept_doc,
           CAST(n_members AS BIGINT) AS n_members,
           CAST(n_chars AS BIGINT) AS kept_chars
    FROM (
      SELECT c.cluster_id, c.doc_id, d.n_chars,
             COUNT(*) OVER (PARTITION BY c.cluster_id) AS n_members,
             ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                                ORDER BY d.n_chars DESC, c.doc_id) AS rn
      FROM clusters c JOIN documents d USING (doc_id))
    WHERE rn = 1
    """,
)
def curation_canonical_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The step after clustering: pick ONE document to keep per duplicate
    cluster — the longest text, doc_id as tie-break (a deterministic
    "best representative" rule; a production pipeline would swap in its
    quality score). Completes the dedup pipeline: pairs → components →
    canonical survivors. One window over cluster_id; cluster metadata
    (size) comes from the same partitioning, so clustering adds exactly
    one extra shuffle beyond the components themselves."""
    from pyspark.sql import Window

    docs = tbl(spark, sf_dir, "documents")
    clusters = connected_components(ngram_jaccard_pairs(docs))
    j = clusters.join(docs.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("cluster_id")
    w_rank = w.orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        j.withColumn("n_members", F.count(F.lit(1)).over(w))
        .withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("kept_doc"),
            F.col("n_members").cast("bigint").alias("n_members"),
            F.col("n_chars").cast("bigint").alias("kept_chars"),
        )
    )


_MH_EST = "(" + " + ".join(
    f"CASE WHEN sa.h{j} = sb.h{j} THEN 1 ELSE 0 END" for j in range(N_MINHASH)
) + f") / {float(N_MINHASH)}"

def _pd_losers(p: str, pairs: str) -> str:
    """Pointer-doubling components + per-family loser extraction: every
    clustered doc that is not its component's min id (the canonical
    survivor) — same contract as the r1–r7 recursive-closure template,
    at linear rows per round instead of Σ cluster²."""
    return (
        _pd_cc_ctes(p, pairs)
        + f""",
    {p}_losers AS (SELECT v AS doc_id FROM {p}_labels WHERE v <> lbl)"""
    )


@register(
    "curation_minhash_clusters_jump",
    oracle=f"""
    WITH {_TOK_CTE}, {_SH_CTE},
    {_SIG_CTE},
    {_BANDS_CTES},
    mh_cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_no = b.band_no AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id),
    mh_pairs AS MATERIALIZED (
      SELECT p.doc_a, p.doc_b
      FROM mh_cand p
      JOIN sig sa ON sa.doc_id = p.doc_a
      JOIN sig sb ON sb.doc_id = p.doc_b
      WHERE {_MH_EST} >= 0.5),
    {_pd_cc_ctes("mh", "mh_pairs")}
    SELECT v AS doc_id, lbl AS cluster_id FROM mh_labels
    """,
)
def curation_minhash_clusters_jump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r9 (verdict item #2): the MINHASH dup family resolved by HOOK+JUMP
    pointer jumping — the O(log diameter) algorithm was wired only to
    the n-gram pair graph in r8; this closes the gap for the LSH
    family. Pairs are the capped band-bucket candidates verified at
    estimated Jaccard ≥ 0.5 (the same pair relation
    ``curation_final_corpus`` drops losers from), components answer the
    pointer-doubling oracle (``_pd_cc_ctes``).

    Scale shape: the pair generator is the banded LSH join (never
    all-pairs, bucket occupancy capped); each jump round is two keyed
    joins over n-row label frames, O(log d) rounds total — the 100 TB
    default for minhash cluster resolution."""
    from rpa_etl_investing_spark.operators.components import (
        pointer_jumping_components,
    )

    docs = tbl(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(docs).filter(F.col("est_jaccard") >= 0.5)
    return pointer_jumping_components(pairs)


@register(
    "curation_embed_clusters_jump",
    oracle=f"""
    WITH eb AS (
      SELECT vec_id, embedding,
             {hyperplane_bucket_sql("embedding")} AS bucket
      FROM embeddings),
    em_pairs AS MATERIALIZED (
      SELECT a.vec_id AS doc_a, c.vec_id AS doc_b
      FROM eb a JOIN eb c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
      WHERE {_cos_sql("a.embedding", "c.embedding")} >= 0.4),
    {_pd_cc_ctes("em", "em_pairs")}
    SELECT v AS doc_id, lbl AS cluster_id FROM em_labels
    """,
)
def curation_embed_clusters_jump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r9 (verdict item #2): the EMBEDDING near-dup family resolved by
    HOOK+JUMP pointer jumping. Pairs are sign-LSH bucket candidates
    verified at cosine ≥ 0.4 (``operators/similarity.py
    embedding_near_dup_pairs`` — vec_id aligns 1:1 with doc_id);
    components answer the same pointer-doubling oracle as the n-gram
    and minhash families, so all three dup-pair generators now have an
    oracle-checked O(log d) cluster-resolution path."""
    from rpa_etl_investing_spark.operators.components import (
        pointer_jumping_components,
    )

    pairs = embedding_near_dup_pairs(
        tbl(spark, sf_dir, "embeddings"), threshold=0.4
    ).select(F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b"))
    return pointer_jumping_components(pairs)


@register(
    "curation_final_corpus",
    oracle=f"""
    WITH {_NG_PAIRS_CTES},
    -- family 1: exact sha256 groups
    exact_groups AS (
      SELECT sha256(text) AS h, MIN(doc_id) AS keep_id
      FROM documents GROUP BY sha256(text)),
    exact_losers AS (
      SELECT d.doc_id FROM documents d
      JOIN exact_groups g ON sha256(d.text) = g.h
      WHERE d.doc_id <> g.keep_id),
    -- family 2: exact 3-gram Jaccard pairs (ng_pairs from the shared CTEs)
    {_pd_losers("ng", "ng_pairs").strip()},
    -- family 3: MinHash band-bucket pairs at est_jaccard >= 0.5
    {_SIG_CTE},
    {_BANDS_CTES},
    mh_cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_no = b.band_no AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id),
    mh_pairs AS MATERIALIZED (
      SELECT p.doc_a, p.doc_b
      FROM mh_cand p
      JOIN sig sa ON sa.doc_id = p.doc_a
      JOIN sig sb ON sb.doc_id = p.doc_b
      WHERE {_MH_EST} >= 0.5),
    {_pd_losers("mh", "mh_pairs").strip()},
    -- family 4: embedding-cosine near-dups (vec_id aligns with doc_id)
    eb AS (
      SELECT vec_id, embedding,
             {hyperplane_bucket_sql("embedding")} AS bucket
      FROM embeddings),
    em_pairs AS MATERIALIZED (
      SELECT a.vec_id AS doc_a, c.vec_id AS doc_b
      FROM eb a JOIN eb c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
      WHERE {_cos_sql("a.embedding", "c.embedding")} >= 0.4),
    {_pd_losers("em", "em_pairs").strip()}
    SELECT source,
           CAST(SUM(CASE WHEN xe.doc_id IS NULL AND xn.doc_id IS NULL
                          AND xm.doc_id IS NULL AND xv.doc_id IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_kept,
           CAST(SUM(CASE WHEN xe.doc_id IS NULL AND xn.doc_id IS NULL
                          AND xm.doc_id IS NULL AND xv.doc_id IS NULL
                         THEN n_chars ELSE 0 END) AS BIGINT) AS total_chars_kept,
           CAST(SUM(CASE WHEN xe.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exact_dropped,
           CAST(SUM(CASE WHEN xn.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_ngram_dropped,
           CAST(SUM(CASE WHEN xm.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_minhash_dropped,
           CAST(SUM(CASE WHEN xv.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_embed_dropped
    FROM documents d
    LEFT JOIN exact_losers xe USING (doc_id)
    LEFT JOIN ng_losers xn USING (doc_id)
    LEFT JOIN mh_losers xm USING (doc_id)
    LEFT JOIN em_losers xv USING (doc_id)
    GROUP BY source ORDER BY source
    """,
)
def curation_final_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole dedup stack composed into the number that matters: what
    actually ships to training. ALL FOUR near/exact-dup families drop
    their cluster losers (min-id canonical survives): exact sha256
    groups, 3-gram-Jaccard clusters, MinHash band-bucket clusters (LSH
    candidates at est_jaccard ≥ 0.5), and embedding-cosine clusters
    (sign-LSH buckets at cosine ≥ 0.4; embeddings.vec_id aligns 1:1
    with doc_id) — plus a per-family dropped-count audit per source, so
    the materialization is also the attribution report ("which stage
    removed how much").

    Composition stays set-based end-to-end: each loser frame carries
    only doc_ids (never text), membership is four LEFT joins on doc_id
    folded into one grouped pass (kept = no family flagged), and every
    constituent operator is the same one verified individually
    (exact_dedup, ngram_jaccard_pairs, minhash_candidate_pairs,
    embedding_near_dup_pairs, connected_components)."""
    docs = tbl(spark, sf_dir, "documents")

    exact_groups = exact_dedup(docs)  # (content_hash, canonical_id, n_copies)
    hashed = docs.select(
        "doc_id", F.sha2(F.col("text").cast("binary"), 256).alias("content_hash")
    )
    exact_losers = (
        hashed.join(exact_groups, "content_hash")
        .filter(F.col("doc_id") != F.col("canonical_id"))
        .select("doc_id")
    )

    def cluster_losers(pairs: DataFrame) -> DataFrame:
        # one row per doc_id by construction (components groups per vertex)
        return (
            connected_components(pairs)
            .filter(F.col("doc_id") != F.col("cluster_id"))
            .select("doc_id")
        )

    ngram_losers = cluster_losers(ngram_jaccard_pairs(docs))
    minhash_losers = cluster_losers(
        minhash_candidate_pairs(docs).filter(F.col("est_jaccard") >= 0.5)
    )
    embed_losers = cluster_losers(
        embedding_near_dup_pairs(
            tbl(spark, sf_dir, "embeddings"), threshold=0.4
        ).select(
            F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
        )
    )

    flagged = docs.select("doc_id", "source", "n_chars")
    for losers, name in [
        (exact_losers, "x_exact"),
        (ngram_losers, "x_ngram"),
        (minhash_losers, "x_minhash"),
        (embed_losers, "x_embed"),
    ]:
        flagged = flagged.join(losers.withColumn(name, F.lit(1)), "doc_id", "left")
    kept = (
        F.col("x_exact").isNull()
        & F.col("x_ngram").isNull()
        & F.col("x_minhash").isNull()
        & F.col("x_embed").isNull()
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.sum(F.when(kept, 1).otherwise(0)).cast("bigint").alias("n_docs_kept"),
            F.sum(F.when(kept, F.col("n_chars")).otherwise(0))
            .cast("bigint")
            .alias("total_chars_kept"),
            F.sum(F.coalesce("x_exact", F.lit(0))).cast("bigint").alias("n_exact_dropped"),
            F.sum(F.coalesce("x_ngram", F.lit(0))).cast("bigint").alias("n_ngram_dropped"),
            F.sum(F.coalesce("x_minhash", F.lit(0))).cast("bigint").alias("n_minhash_dropped"),
            F.sum(F.coalesce("x_embed", F.lit(0))).cast("bigint").alias("n_embed_dropped"),
        )
        .orderBy("source")
    )


_PACK_BUDGET = 512


@register(
    "curation_pack_offsets",
    oracle=f"""
    WITH tokd AS (
      SELECT doc_id, source, LEN(STRING_SPLIT(text, ' ')) AS n_tok
      FROM documents),
    s AS (
      SELECT doc_id, source, n_tok,
             SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_off
      FROM tokd)
    SELECT doc_id, source,
           CAST(end_off - n_tok AS BIGINT) AS start_off,
           CAST(n_tok AS BIGINT) AS n_tok,
           CAST(FLOOR((end_off - n_tok) / {_PACK_BUDGET}.0) AS BIGINT) AS first_bin,
           CAST(FLOOR((end_off - 1) / {_PACK_BUDGET}.0) AS BIGINT) AS last_bin
    FROM s
    """,
)
def curation_pack_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (concat-and-chunk): lay documents end-to-end in
    deterministic (source, doc_id) order and record each doc's token
    offset and the fixed-size training bins it lands in — how a
    pretraining pipeline turns a corpus into equal-length samples.

    The prefix sum is TWO-LEVEL (operators/prefix.py): running sums per
    (source, doc_id-range shard) + broadcast cumulative shard offsets —
    bit-identical to a per-source window, but parallelism scales with
    the shard count, not the source count. A handful of sources at
    100 TB would otherwise serialize each source's entire corpus into
    one sorted task (r3 verdict item #1)."""
    docs = tbl(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " ")).cast("bigint")
    base = with_id_range_shard(
        docs.select("doc_id", "source", n_tok.alias("n_tok")), "doc_id"
    )
    with_off = sharded_running_sum(
        base, ["source"], [F.col("doc_id")], "n_tok", "end_off"
    ).drop(SHARD)
    return with_off.select(
        "doc_id",
        "source",
        (F.col("end_off") - F.col("n_tok")).alias("start_off"),
        "n_tok",
        F.floor((F.col("end_off") - F.col("n_tok")) / _PACK_BUDGET).alias("first_bin"),
        F.floor((F.col("end_off") - 1) / _PACK_BUDGET).alias("last_bin"),
    )


@register(
    "curation_global_pack_offsets",
    oracle=f"""
    WITH tokd AS (
      SELECT doc_id, LEN(STRING_SPLIT(text, ' ')) AS n_tok
      FROM documents),
    s AS (
      SELECT doc_id, n_tok,
             SUM(n_tok) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_off
      FROM tokd)
    SELECT doc_id,
           CAST(end_off - n_tok AS BIGINT) AS start_off,
           CAST(n_tok AS BIGINT) AS n_tok,
           CAST(FLOOR((end_off - n_tok) / {_PACK_BUDGET}.0) AS BIGINT) AS first_bin,
           CAST(FLOOR((end_off - 1) / {_PACK_BUDGET}.0) AS BIGINT) AS last_bin
    FROM s
    """,
)
def curation_global_pack_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLOBAL sequence packing — one continuous token stream across the
    whole corpus in doc_id order, no per-source sharding of the layout.
    Before operators/prefix.py this was the shape the docstrings ruled
    out ("a global pack would serialize on one partition"); the
    two-level prefix sum with an EMPTY partition list makes it viable —
    local sums per id-range shard, offsets over the n_shards-row frame,
    broadcast add-back — so the only single-partition window in the
    plan is over the shard-count frame, constant-sized at any scale."""
    docs = tbl(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " ")).cast("bigint")
    base = with_id_range_shard(
        docs.select("doc_id", n_tok.alias("n_tok")), "doc_id"
    )
    with_off = sharded_running_sum(
        base, [], [F.col("doc_id")], "n_tok", "end_off"
    ).drop(SHARD)
    return with_off.select(
        "doc_id",
        (F.col("end_off") - F.col("n_tok")).alias("start_off"),
        "n_tok",
        F.floor((F.col("end_off") - F.col("n_tok")) / _PACK_BUDGET).alias("first_bin"),
        F.floor((F.col("end_off") - 1) / _PACK_BUDGET).alias("last_bin"),
    )


@register(
    "curation_balanced_sample",
    oracle="""
    SELECT doc_id, source
    FROM (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents)
    WHERE rn <= 10
    """,
)
def curation_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced per-source subset: exactly 10 docs per source, chosen by
    md5 order — an unbiased, rerun-stable draw (hash order is
    uncorrelated with doc content or insertion order), the deterministic
    stand-in for per-group reservoir sampling.

    Same scale path as ``curation_stratified_sample``: the per-source
    rank runs through ``sharded_row_number`` (operators/prefix.py) with
    the hash's first hex char as a 16-way monotone shard — no task ever
    sorts a whole source, so source cardinality never bounds
    parallelism. (The naive alternative, one ``row_number`` window per
    source, is acceptable ONLY for small k where Spark plans a
    WindowGroupLimit pushdown; the sharded form is the documented
    default so callers don't have to reason about that.)"""
    from rpa_etl_investing_spark.operators.prefix import sharded_row_number

    docs = (
        tbl(spark, sf_dir, "documents")
        .select("doc_id", "source", F.md5(F.col("doc_id").cast("string")).alias("h"))
        .withColumn("_shard", F.substring("h", 1, 1))
    )
    ranked = sharded_row_number(
        docs, ["source"], [F.col("h"), F.col("doc_id")], "rn", shard_col="_shard"
    )
    return ranked.filter(F.col("rn") <= 10).select("doc_id", "source")


def _stop_in() -> str:
    from rpa_etl_investing_spark.operators.text import STOPWORDS

    return ", ".join(f"'{w}'" for w in STOPWORDS)


_TOKEN_BUDGET = 2000

_N_QSHARDS = 16


def _with_quality_shard(df: DataFrame) -> DataFrame:
    """Monotone shard for the (quality DESC, doc_id ASC) sort order —
    the contract ``sharded_running_sum`` needs (operators/prefix.py).

    ``quality_score`` emits three disjoint regimes (operators/text.py):
    a continuum in [0.5, 1.0] and two exact atoms, 0.25 (stopword-heavy)
    and 0.0 (too short). Equal-width bands over the continuum alone
    would dump each atom — exactly where a real corpus's mass piles up
    (short/boilerplate docs) — into a single shard, recreating the
    serialized-window problem for that shard. So the atoms get their own
    doc_id-range sub-shards (doc_id is the tie-break within equal
    quality, so sub-sharding by id stays monotone): continuum → bands
    0..16, the 0.25 atom → 100+idband, the 0.0 atom → 200+idband.
    """
    df = with_id_range_shard(df, "doc_id", n_shards=_N_QSHARDS, out="_idb")
    cont = F.floor((F.lit(1.0) - F.col("quality")) * _N_QSHARDS).cast("int")
    shard = (
        F.when(F.col("quality") == 0.0, F.lit(200) + F.col("_idb"))
        .when(F.col("quality") == 0.25, F.lit(100) + F.col("_idb"))
        .otherwise(cont)
    )
    return df.withColumn(SHARD, shard.cast("int")).drop("_idb")


@register(
    "curation_token_budget",
    oracle=f"""
    WITH {_TOK_CTE},
    q AS (
      SELECT doc_id, LEN(t) AS n_tok,
             CASE WHEN LEN(t) < 5 THEN 0.0
                  WHEN LEN(LIST_FILTER(t, x -> x IN ({{stops}}))) / LEN(t) > 0.5 THEN 0.25
                  ELSE 1.0 - LEN(LIST_FILTER(t, x -> x IN ({{stops}}))) / LEN(t) END AS quality
      FROM tok),
    ranked AS (
      SELECT d.source, q.doc_id, q.n_tok,
             SUM(q.n_tok) OVER (PARTITION BY d.source
                                ORDER BY q.quality DESC, q.doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_tok
      FROM q JOIN documents d USING (doc_id))
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens
    FROM ranked WHERE cum_tok <= {_TOKEN_BUDGET}
    GROUP BY source ORDER BY source
    """.replace("{stops}", _stop_in()),
)
def curation_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budgeted selection: per source, keep the highest-quality
    documents (doc_id tie-break) until a fixed token budget fills — the
    "best N tokens per source" step that turns quality scores into an
    actual training mixture. The running token sum is the two-level
    sharded form (``_with_quality_shard`` + ``sharded_running_sum``):
    quality-band shards with atom sub-sharding keep the prefix sum
    parallel within every source, so source cardinality never bounds
    task count; a grouped audit follows, no per-source global sort."""
    from rpa_etl_investing_spark.operators.text import quality_score

    docs = tbl(spark, sf_dir, "documents")
    q = quality_score(docs).select(
        "doc_id", F.col("n_tokens").alias("n_tok"), "quality"
    )
    base = _with_quality_shard(docs.select("doc_id", "source").join(q, "doc_id"))
    ranked = sharded_running_sum(
        base, ["source"], [F.desc("quality"), F.col("doc_id")], "n_tok", "cum_tok"
    )
    return (
        ranked.filter(F.col("cum_tok") <= _TOKEN_BUDGET)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs_kept"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
        )
        .orderBy("source")
    )


@register(
    "curation_quality_filter",
    oracle=f"""
    WITH {_TOK_CTE},
    q AS (
      SELECT doc_id,
             CASE WHEN LEN(t) < 5 THEN 0.0
                  WHEN LEN(LIST_FILTER(t, x -> x IN ({{stops}}))) / LEN(t) > 0.5 THEN 0.25
                  ELSE 1.0 - LEN(LIST_FILTER(t, x -> x IN ({{stops}}))) / LEN(t) END AS quality
      FROM tok),
    r AS (
      SELECT d.lang, q.quality,
             PERCENT_RANK() OVER (PARTITION BY d.lang
               ORDER BY q.quality DESC, q.doc_id) AS pr
      FROM q JOIN documents d USING (doc_id))
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_kept,
           (CAST(CAST(SUM(CAST(quality AS DECIMAL(27,12))) * 1000000000000 AS BIGINT) AS DOUBLE) / 1000000000000.0) AS total_quality
    FROM r WHERE pr <= 0.5
    GROUP BY lang ORDER BY lang
    """.replace("{stops}", _stop_in()),
)
def curation_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-based quality filtering: keep each language's top half by
    composite quality score (doc_id tie-break, so the cut is
    deterministic — no threshold-boundary float compare). The
    real-pipeline form of "filter to the best X% per language".

    TWO-PASS, no per-lang global sort (r3 verdict item #3): pass 1 is a
    broadcast-sized per-lang count; pass 2 computes each row's exact
    rank as a sharded row_number (``_with_quality_shard`` +
    ``sharded_row_number`` — parallel within every lang) and keeps
    ``rank ≤ floor(0.5·(n−1)) + 1``. With the total-order tie-break,
    rank is row_number and ``percent_rank = (rank−1)/(n−1)``, so that
    integer cutoff is EXACTLY the oracle's ``pr <= 0.5`` — the float
    boundary (n odd → (k−1)/(n−1) = 0.5) is representable, and any
    off-boundary ratio differs from 0.5 by ≥ 1/(2(n−1)), far above
    double rounding error."""
    from rpa_etl_investing_spark.operators.text import quality_score

    docs = tbl(spark, sf_dir, "documents")
    q = quality_score(docs).select("doc_id", "quality")
    base = _with_quality_shard(docs.select("doc_id", "lang").join(q, "doc_id"))
    ranked = sharded_row_number(
        base, ["lang"], [F.desc("quality"), F.col("doc_id")], "rn"
    )
    counts = base.groupBy("lang").agg(F.count(F.lit(1)).alias("_n"))
    return (
        ranked.join(F.broadcast(counts), "lang")
        .filter(F.col("rn") <= F.floor(F.lit(0.5) * (F.col("_n") - 1)) + 1)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            # scaled-BIGINT exit (r8): at scale 12 the direct cast's
            # bit-identical window ends at 2^53/1e12 ≈ 9e3 quality
            # points per lang — sf1 already exceeds it; the shifted
            # exit is exact to 2^63/1e12 ≈ 9.2e6.
            (
                (F.sum(F.col("quality").cast("decimal(27,12)")) * F.lit(10**12))
                .cast("bigint")
                .cast("double")
                / F.lit(float(10**12))
            ).alias("total_quality"),
        )
        .orderBy("lang")
    )


@register(
    "curation_training_samples",
    oracle=f"""
    WITH tokd AS (
      SELECT doc_id, source, LEN(STRING_SPLIT(text, ' ')) AS n_tok
      FROM documents),
    s AS (
      SELECT doc_id, source, n_tok,
             SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_off
      FROM tokd),
    seg AS (
      SELECT doc_id, source,
             end_off - n_tok AS start_off, end_off,
             UNNEST(RANGE(CAST(FLOOR((end_off - n_tok) / {_PACK_BUDGET}.0) AS BIGINT),
                          CAST(FLOOR((end_off - 1) / {_PACK_BUDGET}.0) AS BIGINT) + 1))
               AS bin_id
      FROM s WHERE n_tok >= 1)
    SELECT source,
           CAST(bin_id AS BIGINT) AS bin_id,
           doc_id,
           CAST(GREATEST(bin_id * {_PACK_BUDGET}, start_off) - start_off AS BIGINT)
             AS seg_start,
           CAST(LEAST((bin_id + 1) * {_PACK_BUDGET}, end_off)
                - GREATEST(bin_id * {_PACK_BUDGET}, start_off) AS BIGINT)
             AS seg_tokens
    FROM seg
    """,
)
def curation_training_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The packed-sample composition table — the final materialization a
    pretraining data loader actually reads: for every fixed 512-token
    training bin (``_PACK_BUDGET``), which token range of which document
    fills it (``curation_pack_offsets`` gives each doc its bins; this
    emits the per-(bin, doc) segments, including docs split across
    bins).

    Pure integer arithmetic over two-level sharded prefix sums
    (operators/prefix.py — parallelism bounded by shard count, not
    source count): one ``sequence``/``explode`` per doc spanning its
    bins, zero extra shuffles after the offset stage — at 100 TB the
    segment table streams straight to the sink, and a loader groups by
    (source, bin_id) to assemble samples."""
    docs = tbl(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " ")).cast("bigint")
    base = with_id_range_shard(
        docs.select("doc_id", "source", n_tok.alias("n_tok")), "doc_id"
    )
    s = (
        sharded_running_sum(base, ["source"], [F.col("doc_id")], "n_tok", "end_off")
        .drop(SHARD)
        .filter(F.col("n_tok") >= 1)
        .withColumn("start_off", F.col("end_off") - F.col("n_tok"))
        .withColumn("first_bin", F.floor(F.col("start_off") / _PACK_BUDGET))
        .withColumn("last_bin", F.floor((F.col("end_off") - 1) / _PACK_BUDGET))
    )
    seg = s.select(
        "doc_id",
        "source",
        "start_off",
        "end_off",
        F.explode(F.sequence(F.col("first_bin"), F.col("last_bin"))).alias("bin_id"),
    )
    bin_lo = F.col("bin_id") * _PACK_BUDGET
    bin_hi = (F.col("bin_id") + 1) * _PACK_BUDGET
    seg_start = F.greatest(bin_lo, F.col("start_off")) - F.col("start_off")
    seg_tokens = F.least(bin_hi, F.col("end_off")) - F.greatest(
        bin_lo, F.col("start_off")
    )
    return seg.select(
        "source",
        F.col("bin_id").cast("long").alias("bin_id"),
        "doc_id",
        seg_start.cast("long").alias("seg_start"),
        seg_tokens.cast("long").alias("seg_tokens"),
    )


@register(
    "curation_temperature_mix",
    oracle=f"""
    WITH sizes AS (
      SELECT source, CAST(SUM(n_chars) AS BIGINT) AS src_size
      FROM documents GROUP BY source),
    mn AS (SELECT MIN(src_size) AS min_size FROM sizes),
    fr AS (
      SELECT source, src_size,
             SQRT(CAST(min_size AS DOUBLE) / CAST(src_size AS DOUBLE)) AS keep_frac,
             CAST(ROUND(SQRT(CAST(min_size AS DOUBLE) / CAST(src_size AS DOUBLE))
                        * 65536) AS INT) AS n16
      FROM sizes CROSS JOIN mn),
    thr AS (
      SELECT source, src_size, keep_frac,
             CASE WHEN n16 >= 65536 THEN 'g' ELSE printf('%04x', n16) END AS t
      FROM fr),
    kept AS (
      SELECT d.source FROM documents d JOIN thr ON d.source = thr.source
      WHERE {_BUCKET_SQL} < thr.t)
    SELECT t.source, t.src_size, t.keep_frac, CAST(k.n AS BIGINT) AS n_kept
    FROM thr t JOIN (
      SELECT source, COUNT(*) AS n FROM kept GROUP BY source) k
      ON t.source = k.source
    ORDER BY t.source
    """,
)
def curation_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Square-root temperature source mixing with data-derived keep
    fractions (operators/sampling.py temperature_mix): per-source char
    budgets → sqrt damping → in-plan hex thresholds → the standard
    shuffle-free hash filter; audit of kept counts per source."""
    from rpa_etl_investing_spark.operators.sampling import temperature_mix

    kept = temperature_mix(
        tbl(spark, sf_dir, "documents"), "doc_id", "source", "n_chars"
    )
    return (
        kept.groupBy("source", "src_size", "keep_frac")
        .agg(F.count(F.lit(1)).alias("n_kept"))
        .orderBy("source")
    )


# DSIR importance weighting (operators/importance.py): the per-doc CTEs
# mirror dsir_quantized_logratios exactly — same 2-hex-char buckets,
# same smoothing parenthesization (so libm ln sees identical doubles),
# same 1e-6 quantization, exact BIGINT reductions thereafter.
_HEX16_DOC = (
    "("
    + " + ".join(
        f"(STRPOS('0123456789abcdef', SUBSTR(md5(CAST(doc_id AS VARCHAR)), {i}, 1)) - 1)"
        f" * {16 ** (4 - i)}"
        for i in range(1, 5)
    )
    + ")"
)

_DSIR_CTES = """
    tokd AS (
      SELECT doc_id, (lang = 'en') AS is_target,
             UNNEST(STRING_SPLIT(text, ' ')) AS tok
      FROM documents),
    bt AS (SELECT doc_id, is_target, SUBSTR(md5(tok), 1, 2) AS bucket FROM tokd),
    bs AS (
      SELECT bucket,
             SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS t_cnt,
             SUM(CASE WHEN is_target THEN 0 ELSE 1 END) AS r_cnt
      FROM bt GROUP BY bucket),
    tot AS (SELECT CAST(SUM(t_cnt) AS BIGINT) AS tt,
                   CAST(SUM(r_cnt) AS BIGINT) AS rt FROM bs),
    lr AS (
      SELECT bucket,
             CAST(FLOOR(1000000.0 * LN(((t_cnt + 1.0) / (tt + 256.0))
                                       * ((rt + 256.0) / (r_cnt + 1.0)))
                        + 0.5) AS BIGINT) AS qlr
      FROM bs CROSS JOIN tot),
    dc AS (SELECT doc_id, bucket, COUNT(*) AS c FROM bt GROUP BY doc_id, bucket),
    w AS (
      SELECT dc.doc_id,
             CAST(SUM(c) AS BIGINT) AS n_tokens,
             CAST(SUM(c * qlr) AS BIGINT) AS q_weight
      FROM dc JOIN lr USING (bucket)
      GROUP BY dc.doc_id)
"""


@register(
    "curation_dsir_weights",
    oracle=f"""
    WITH {_DSIR_CTES}
    SELECT doc_id, n_tokens, q_weight,
           q_weight / 1000000.0 AS dsir_weight
    FROM w
    """,
)
def curation_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (arXiv:2302.03169): hashed bag-of-words
    log likelihood ratio of target (lang='en') vs raw model per
    document, on the exact-integer grid (operators/importance.py has
    the parity + 100 TB shape analysis)."""
    from rpa_etl_investing_spark.operators.importance import dsir_weights

    docs = tbl(spark, sf_dir, "documents")
    return dsir_weights(docs, F.col("lang") == "en").select(
        "doc_id", "n_tokens", "q_weight", "dsir_weight"
    )


@register(
    "curation_dsir_sample",
    oracle=f"""
    WITH {_DSIR_CTES},
    g AS (
      SELECT doc_id, q_weight,
             CAST(FLOOR(1000000.0 *
                        (-LN(-LN(({_HEX16_DOC} + 0.5) / 65536.0)))
                        + 0.5) AS BIGINT) AS qg
      FROM w)
    SELECT doc_id,
           q_weight / 1000000.0 AS dsir_weight,
           CAST(q_weight + qg AS BIGINT) AS q_key
    FROM g
    ORDER BY q_key DESC, doc_id
    LIMIT 100
    """,
)
def curation_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel-top-k importance resampling over the DSIR weights:
    selection probability ∝ exp(weight), yet fully deterministic — the
    Gumbel draw is a pure function of doc_id and the sort key is an
    exact integer, so reruns and engines agree row-for-row. Top-k is
    a TakeOrderedAndProject (no global sort materialization)."""
    from rpa_etl_investing_spark.operators.importance import (
        dsir_weights,
        gumbel_quantized,
    )

    docs = tbl(spark, sf_dir, "documents")
    w = dsir_weights(docs, F.col("lang") == "en")
    return (
        w.withColumn(
            "q_key",
            (F.col("q_weight") + gumbel_quantized(F.col("doc_id"))).cast("bigint"),
        )
        .select("doc_id", "dsir_weight", "q_key")
        .orderBy(F.desc("q_key"), "doc_id")
        .limit(100)
    )


@register(
    "curation_stratified_sample",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, lang, {_BUCKET_SQL} AS b FROM documents),
    r AS (
      SELECT doc_id, lang, b,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY b, doc_id) AS rn
      FROM h)
    SELECT lang, doc_id, CAST(rn AS BIGINT) AS rank_in_stratum
    FROM r WHERE rn <= 20
    """,
)
def curation_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-N-per-stratum sampling: the first 20 documents of every
    language in content-hash order — a uniform, rerun-stable draw
    (adding documents later can evict, never reorder, the kept set).

    Scale shape: the per-stratum rank uses the sharded row_number
    primitive (operators/prefix.py) with the bucket's first hex char as
    the 16-way monotone shard, so no task ever sorts a whole language —
    the same two-level pattern that fixed the packing family, applied
    to stratified selection."""
    from rpa_etl_investing_spark.operators.prefix import sharded_row_number
    from rpa_etl_investing_spark.operators.sampling import hash_bucket

    docs = tbl(spark, sf_dir, "documents").select(
        "doc_id", "lang", hash_bucket("doc_id").alias("b")
    ).withColumn("_shard", F.substring("b", 1, 1))
    ranked = sharded_row_number(
        docs, ["lang"], [F.col("b"), F.col("doc_id")], "rn", shard_col="_shard"
    )
    return ranked.filter(F.col("rn") <= 20).select(
        "lang", "doc_id", F.col("rn").cast("bigint").alias("rank_in_stratum")
    )


@register(
    "curation_corpus_report",
    oracle=f"""
    WITH {_TOK_CTE}, {_SH_CTE}, {_SIG_CTE},
    {_BANDS_CTES},
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_no = b.band_no AND a.band_key = b.band_key
           AND a.doc_id < b.doc_id),
    base AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT SHA256(text)) AS BIGINT) AS n_distinct_texts,
             CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
             CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
             CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS total_tokens
      FROM documents),
    pc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_candidate_pairs FROM pairs)
    SELECT n_docs,
           n_distinct_texts,
           n_docs - n_distinct_texts AS n_exact_dup_docs,
           n_langs, n_sources, total_tokens,
           CAST(FLOOR(1000000.0 * total_tokens / n_docs + 0.5) AS BIGINT)
             AS mean_tokens_q,
           n_candidate_pairs
    FROM base CROSS JOIN pc
    """,
)
def curation_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-row corpus health report a curation run ships with its
    output: document / distinct-text / exact-dup counts, language and
    source diversity, token mass, mean tokens per doc (1e-6 grid), and
    the MinHash-LSH candidate-pair count — each number the head of a
    family this engine computes in full elsewhere. All components are
    single aggregates joined as 1-row broadcasts; the pair count reuses
    the capped band join (never all-pairs)."""
    from rpa_etl_investing_spark.operators.dedup import minhash_candidate_pairs

    docs = tbl(spark, sf_dir, "documents")
    base = docs.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.countDistinct(F.sha2(F.col("text"), 256)).cast("bigint").alias(
            "n_distinct_texts"
        ),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("total_tokens"),
    )
    pc = minhash_candidate_pairs(docs).agg(
        F.count("*").cast("bigint").alias("n_candidate_pairs")
    )
    return base.crossJoin(F.broadcast(pc)).select(
        "n_docs",
        "n_distinct_texts",
        (F.col("n_docs") - F.col("n_distinct_texts")).alias("n_exact_dup_docs"),
        "n_langs",
        "n_sources",
        "total_tokens",
        F.floor(
            F.lit(1000000.0) * F.col("total_tokens") / F.col("n_docs") + F.lit(0.5)
        )
        .cast("bigint")
        .alias("mean_tokens_q"),
        "n_candidate_pairs",
    )


@register(
    "curation_epoch_plan",
    oracle="""
    WITH per_src AS (
      SELECT source, CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS t
      FROM documents GROUP BY source),
    tot AS (SELECT CAST(SUM(t) AS BIGINT) AS total,
                   CAST(COUNT(*) AS BIGINT) AS n FROM per_src),
    ordered AS (
      SELECT source, t,
             ROW_NUMBER() OVER (ORDER BY t, source) AS i,
             CAST(SUM(4 * t) OVER (ORDER BY t, source
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s_i
      FROM per_src),
    flagged AS (
      SELECT o.*, tot.total, tot.n,
             4 * o.t * (tot.n - o.i + 1) <= 2 * tot.total - (o.s_i - 4 * o.t)
               AS capped
      FROM ordered o CROSS JOIN tot),
    pv AS (
      SELECT CAST(COALESCE(MAX(CASE WHEN capped THEN s_i END), 0) AS BIGINT) AS s_k,
             CAST(COUNT(CASE WHEN capped THEN 1 END) AS BIGINT) AS k
      FROM flagged)
    SELECT f.source, f.t AS n_tokens, f.capped,
           CAST(CASE WHEN f.capped THEN 4 * f.t
                ELSE (2 * f.total - p.s_k) // (f.n - p.k) END AS BIGINT)
             AS alloc_tokens,
           CAST(CASE WHEN f.capped THEN 4 * f.t
                ELSE (2 * f.total - p.s_k) // (f.n - p.k) END AS BIGINT)
             / CAST(f.t AS DOUBLE) AS epochs
    FROM flagged f CROSS JOIN pv p
    """,
)
def curation_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax-style epoch-capped budget allocation (Chung et al. 2023,
    arXiv:2304.09151) as a closed-form windowed computation: give every
    source an equal share of a 2×-corpus token budget, except no source
    repeats more than 4 epochs. The sequential water-filling loop of
    the paper collapses to one window pass: sources ascending by size,
    a source is capped iff its full 4-epoch allocation is affordable
    against the budget left when its turn comes
    (``4·t_i·(n−i+1) ≤ B − S_{i−1}``, prefix sums over 4·t), and the
    uncapped tail splits the remainder equally (integer floor). All
    BIGINT arithmetic; the per-source epochs ratio divides two exact
    integers.

    Scale shape: the fact-sized work is one per-source token aggregate;
    the window runs over n_sources rows (the mixing plan is inherently
    per-source — ~dozens of rows at any corpus size), and the pivot
    rides back as a 1-row broadcast."""
    from pyspark.sql.window import Window as W

    docs = tbl(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.sum(F.size(F.split(F.col("text"), " "))).cast("bigint").alias("t")
    )
    tot = per_src.agg(
        F.sum("t").cast("bigint").alias("total"),
        F.count("*").cast("bigint").alias("n"),
    )
    # bounded-window: n_sources rows (per-source mixing plan)
    wo = W.orderBy("t", "source")
    ordered = per_src.select(
        "source",
        "t",
        F.row_number().over(wo).alias("i"),
        F.sum(F.lit(4) * F.col("t"))
        .over(wo.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("bigint")
        .alias("s_i"),
    )
    flagged = ordered.crossJoin(F.broadcast(tot)).withColumn(
        "capped",
        F.lit(4) * F.col("t") * (F.col("n") - F.col("i") + 1)
        <= F.lit(2) * F.col("total") - (F.col("s_i") - F.lit(4) * F.col("t")),
    )
    pivot = flagged.agg(
        F.coalesce(F.max(F.when(F.col("capped"), F.col("s_i"))), F.lit(0))
        .cast("bigint")
        .alias("s_k"),
        F.count(F.when(F.col("capped"), 1)).cast("bigint").alias("k"),
    )
    j = flagged.crossJoin(F.broadcast(pivot))
    alloc = F.when(F.col("capped"), F.lit(4) * F.col("t")).otherwise(
        F.expr("(2 * total - s_k) div (n - k)")
    ).cast("bigint")
    return j.select(
        "source",
        F.col("t").alias("n_tokens"),
        "capped",
        alloc.alias("alloc_tokens"),
        (alloc / F.col("t").cast("double")).alias("epochs"),
    )


@register(
    "curation_negative_pairs",
    oracle="""
    WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    cand AS (
      SELECT d.doc_id AS anchor_id,
             (d.doc_id * 2654435761 + j) % n.n_docs AS neg_id
      FROM documents d
      CROSS JOIN n
      CROSS JOIN (VALUES (1), (2)) AS ks(j)),
    kept AS (
      SELECT anchor_id, neg_id FROM cand
      WHERE anchor_id <> neg_id
        AND NOT EXISTS (
          SELECT 1 FROM documents a JOIN documents b
            ON a.doc_id = cand.anchor_id AND b.doc_id = cand.neg_id
           AND a.text = b.text))
    SELECT k.anchor_id, k.neg_id, b.lang AS neg_lang, b.source AS neg_source
    FROM kept k JOIN documents b ON k.neg_id = b.doc_id
    """,
)
def curation_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative-pair generation for contrastive training:
    each anchor gets k=2 pseudo-random partners via a Knuth
    multiplicative hash over the dense doc-id domain (``(id·2654435761
    + j) mod n`` — n rides as a 1-row broadcast), self-pairs dropped,
    and accidental positives (exact-dup texts) removed by a hash
    equi-join — never a similarity scan over all pairs. The partner
    lookup is a plain key equi-join, so at 100 TB the whole generator
    is two shuffle-free projections plus one key join. For a sparse id
    space, first mint dense ids with the bucketed row_number + offset
    pattern (etl/pipeline.py) and the same scheme applies."""
    docs = tbl(spark, sf_dir, "documents")
    n = docs.agg(F.count("*").cast("bigint").alias("n_docs"))
    ks = spark.range(1, 3).select(F.col("id").alias("j"))
    cand = (
        docs.select("doc_id")
        .crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(ks))
        .select(
            F.col("doc_id").alias("anchor_id"),
            ((F.col("doc_id") * F.lit(2654435761) + F.col("j")) % F.col("n_docs"))
            .alias("neg_id"),
        )
        .filter(F.col("anchor_id") != F.col("neg_id"))
    )
    a = docs.select(F.col("doc_id").alias("anchor_id"), F.sha2("text", 256).alias("ah"))
    b = docs.select(
        F.col("doc_id").alias("neg_id"),
        F.sha2("text", 256).alias("bh"),
        F.col("lang").alias("neg_lang"),
        F.col("source").alias("neg_source"),
    )
    return (
        cand.join(a, "anchor_id")
        .join(b, "neg_id")
        .filter(F.col("ah") != F.col("bh"))
        .select("anchor_id", "neg_id", "neg_lang", "neg_source")
    )


@register(
    "curation_weighted_sample_k",
    oracle="""
    WITH u AS (
      SELECT doc_id, n_chars,
             (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
              + 0.5) / 4294967296.0 AS u
      FROM documents WHERE n_chars > 0),
    keyed AS (
      SELECT doc_id, n_chars,
             CAST(FLOOR(1e12 * LN(u) / n_chars + 0.5) AS BIGINT) AS key_q
      FROM u)
    SELECT doc_id, n_chars, key_q
    FROM keyed
    ORDER BY key_q DESC, doc_id
    LIMIT 100
    """,
)
def curation_weighted_sample_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, exactly k survivors:
    Efraimidis–Spirakis A-ES keys (IPL 2006) — rank every doc by
    ``u^(1/w)`` (monotonically, by ``ln(u)/w``) with weight = doc
    length, keep the top 100. The uniform u is the engine-portable
    md5-prefix grid (deterministic, replayable), the key is quantized
    once to the 1e-12 grid, and the selection carries a doc_id total
    order so ties cannot flap.

    Scale shape: the key is a map-side expression; top-k plans
    TakeOrderedAndProject (per-partition heads merged at the driver,
    k rows each — never a global sort). This is the one-pass
    distributed form of weighted reservoir sampling: ANY fixed k works
    at ANY corpus size with one scan and k·partitions rows moved."""
    docs = tbl(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    keyed = docs.select(
        "doc_id",
        "n_chars",
        F.floor(F.lit(1e12) * F.log(u) / F.col("n_chars") + F.lit(0.5))
        .cast("bigint")
        .alias("key_q"),
    )
    return keyed.orderBy(F.desc("key_q"), F.asc("doc_id")).limit(100)


@register(
    "curation_ccnet_buckets",
    oracle="""
    WITH tok AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents),
    b AS (
      SELECT doc_id, s['w1'] AS w1, s['w2'] AS w2 FROM (
        SELECT doc_id,
               UNNEST(LIST_TRANSFORM(RANGE(2, LEN(t) + 1),
                                     i -> {'w1': t[i-1], 'w2': t[i]})) AS s
        FROM tok WHERE LEN(t) >= 2)),
    c2 AS (SELECT w1, w2, COUNT(*) AS n2 FROM b GROUP BY w1, w2),
    c1 AS (SELECT w1, COUNT(*) AS n1 FROM b GROUP BY w1),
    q AS (SELECT c2.w1, c2.w2,
                 CAST(FLOOR(1e10 * (n2 / n1) + 0.5) AS BIGINT) AS qp
          FROM c2 JOIN c1 USING (w1)),
    s AS (
      SELECT b.doc_id,
             CAST(CAST(SUM(qp) AS BIGINT) // COUNT(*) AS BIGINT) AS score_q
      FROM b JOIN q ON b.w1 = q.w1 AND b.w2 = q.w2
      GROUP BY b.doc_id),
    sl AS (
      SELECT s.doc_id, d.lang, s.score_q
      FROM s JOIN documents d ON s.doc_id = d.doc_id),
    r AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY score_q) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM sl),
    cuts AS (
      SELECT lang,
        MAX(CASE WHEN rn = CAST(FLOOR((1.0/3)*(n-1)) AS BIGINT)+1
                 THEN score_q END) AS c33,
        MAX(CASE WHEN rn = CAST(FLOOR((2.0/3)*(n-1)) AS BIGINT)+1
                 THEN score_q END) AS c66
      FROM r GROUP BY lang)
    SELECT sl.doc_id, sl.lang, sl.score_q,
           CASE WHEN score_q <= c33 THEN 'tail'
                WHEN score_q <= c66 THEN 'middle'
                ELSE 'head' END AS bucket
    FROM sl JOIN cuts USING (lang)
    ORDER BY sl.doc_id
    """,
)
def curation_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5+: CCNet-style head/middle/tail split — per LANGUAGE, rank
    every document by its corpus-LM fluency score and cut at the exact
    per-language terciles (Wenzek et al., CCNet: documents are bucketed
    by LM perplexity percentile within language; the head feeds
    training, the tail is dropped or down-weighted).

    Score: the integer-grid bigram fluency proxy of
    `llm_bigram_doc_score` reduced to pure BIGINT (Σ qp // n_bigrams) so
    no float ever enters ranking or comparison. Docs with < 2 tokens
    carry no bigram evidence and are excluded (CCNet likewise drops
    un-scorable fragments).

    Scale shape: the LM is distributed (two hash aggregates + one
    bigram-keyed equi-join — never broadcast; at corpus scale it
    exceeds any driver), and the tercile cuts come from the SHARDED
    exact selection (operators/prefix.py `exact_quantiles`,
    group_cols=[lang]) — no per-language sort, no `percentile()`
    collect buffer. The cut table is n_langs rows — genuinely bounded,
    so ITS broadcast back onto the scored corpus is the legitimate
    kind. Tie handling is value-based (`<=` against the cut VALUE), so
    the split is deterministic under any tie order."""
    from rpa_etl_investing_spark.operators.dedup import spread
    from rpa_etl_investing_spark.operators.prefix import exact_quantiles

    docs = tbl(spark, sf_dir, "documents")
    toks = (
        spread(docs, "doc_id")
        .select("doc_id", F.split("text", " ").alias("t"))
        .filter(F.size("t") >= 2)
    )
    b = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1),"
                " i -> struct(t[i-1] AS w1, t[i] AS w2))"
            )
        ).alias("s"),
    ).select("doc_id", F.col("s.w1").alias("w1"), F.col("s.w2").alias("w2"))
    c2 = b.groupBy("w1", "w2").agg(F.count("*").alias("n2"))
    c1 = b.groupBy("w1").agg(F.count("*").alias("n1"))
    q = c2.join(c1, "w1").select(
        "w1",
        "w2",
        F.floor(F.lit(1e10) * (F.col("n2") / F.col("n1")) + F.lit(0.5))
        .cast("bigint")
        .alias("qp"),
    )
    s = (
        b.join(q, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(F.expr("CAST(sum(qp) DIV count(*) AS BIGINT)").alias("score_q"))
    )
    sl = s.join(docs.select("doc_id", "lang"), "doc_id")
    cuts = exact_quantiles(
        sl, "score_q", {"c33": 1.0 / 3.0, "c66": 2.0 / 3.0}, group_cols=["lang"]
    )
    return (
        sl.join(F.broadcast(cuts), "lang")
        .select(
            "doc_id",
            "lang",
            "score_q",
            F.when(F.col("score_q") <= F.col("c33"), F.lit("tail"))
            .when(F.col("score_q") <= F.col("c66"), F.lit("middle"))
            .otherwise(F.lit("head"))
            .alias("bucket"),
        )
        .orderBy("doc_id")
    )


@register(
    "curation_split_leakage",
    oracle=f"""
    WITH assigned AS (
      SELECT md5(text) AS h,
             CASE WHEN {_BUCKET_SQL} < '{frac_to_hex(0.8)}' THEN 'train'
                  WHEN {_BUCKET_SQL} < '{frac_to_hex(0.9)}' THEN 'val'
                  ELSE 'test' END AS split
      FROM documents),
    hs AS (SELECT DISTINCT h, split FROM assigned),
    pairs AS (
      SELECT a.h, a.split AS split_a, b.split AS split_b
      FROM hs a JOIN hs b ON a.h = b.h AND a.split < b.split)
    SELECT split_a, split_b, CAST(COUNT(*) AS BIGINT) AS n_leaked_contents
    FROM pairs
    GROUP BY split_a, split_b
    ORDER BY split_a, split_b
    """,
)
def curation_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5+: train/val/test LEAKAGE audit — the check every eval pipeline
    must run BEFORE trusting held-out metrics: identical document
    content appearing on both sides of a split boundary (the id-keyed
    deterministic split is stable, but duplicate CONTENT under
    different ids walks across it freely — exactly why dedup must
    precede splitting, and this query measures how much leakage remains
    if it doesn't). One row per split pair with the count of leaked
    distinct contents.

    Scale shape: content hash + split label per doc (map-side), one
    distinct on (hash, split) — shuffle carries 16-byte digests, never
    text — then a self-join keyed on the hash whose fan-out is bounded
    by 3 split labels per hash (≤ 3 rows/key by construction). The
    reference's workload cannot leak (single-source append,
    /root/reference/main.py:137-147); this is the generalization its
    training-data consumers need."""
    docs = tbl(spark, sf_dir, "documents")
    assigned = deterministic_split(docs, "doc_id").select(
        F.md5("text").alias("h"), "split"
    )
    hs = assigned.distinct()
    a = hs.select("h", F.col("split").alias("split_a"))
    b = hs.select("h", F.col("split").alias("split_b"))
    return (
        a.join(b, "h")
        .filter(F.col("split_a") < F.col("split_b"))
        .groupBy("split_a", "split_b")
        .agg(F.count("*").cast("bigint").alias("n_leaked_contents"))
        .orderBy("split_a", "split_b")
    )


@register(
    "curation_sft_format_gate",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             CASE WHEN doc_id % 11 = 0 THEN
               [{'role': 'assistant', 'content': SUBSTRING(text, 1, 10)},
                {'role': 'user',
                 'content': CASE WHEN doc_id % 7 = 0 THEN ''
                                 ELSE SUBSTRING(text, 11, 10) END}]
             WHEN doc_id % 13 = 0 THEN
               [{'role': 'user', 'content': SUBSTRING(text, 1, 10)},
                {'role': 'user',
                 'content': CASE WHEN doc_id % 7 = 0 THEN ''
                                 ELSE SUBSTRING(text, 11, 10) END}]
             ELSE
               [{'role': 'user', 'content': SUBSTRING(text, 1, 10)},
                {'role': 'assistant',
                 'content': CASE WHEN doc_id % 7 = 0 THEN ''
                                 ELSE SUBSTRING(text, 11, 10) END}]
             END AS msgs
      FROM documents),
    checks AS (
      SELECT doc_id,
             msgs[1].role = 'user' AS first_ok,
             LEN(LIST_FILTER(RANGE(1, LEN(msgs)),
                             i -> msgs[i].role = msgs[i + 1].role)) = 0
               AS alternate_ok,
             LEN(LIST_FILTER(msgs, x -> LENGTH(x.content) = 0)) = 0
               AS content_ok
      FROM m)
    SELECT doc_id, first_ok, alternate_ok, content_ok,
           (first_ok AND alternate_ok AND content_ok) AS accepted
    FROM checks
    ORDER BY doc_id
    """,
)
def curation_sft_format_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5+ gen: SFT conversation-format gate — the schema validation a
    fine-tuning pipeline runs on chat-formatted samples before they
    reach a tokenizer: first turn must be the user's, roles must
    alternate, no empty contents. The fixture manufactures the three
    defect classes deterministically (role-swap every 11th doc,
    double-user every 13th, empty assistant every 7th) so the gate's
    verdicts are oracle-checkable per document.

    Scale shape: entirely map-side — the message array is built,
    validated with Catalyst higher-order functions (`filter` over the
    role sequence), and flagged in one projection; no shuffle, no
    Python, no JSON string round-trip on the hot path. An engine
    ingesting real OpenAI-style JSON would put `from_json` in front of
    the same checks (the F13 surface demonstrates that parse)."""
    docs = tbl(spark, sf_dir, "documents")
    a = F.substring("text", 1, 10)
    b = F.when(F.col("doc_id") % 7 == 0, F.lit("")).otherwise(
        F.substring("text", 11, 10)
    )

    def msg(role, content):
        return F.struct(F.lit(role).alias("role"), content.alias("content"))

    msgs = (
        F.when(
            F.col("doc_id") % 11 == 0,
            F.array(msg("assistant", a), msg("user", b)),
        )
        .when(
            F.col("doc_id") % 13 == 0,
            F.array(msg("user", a), msg("user", b)),
        )
        .otherwise(F.array(msg("user", a), msg("assistant", b)))
    )
    m = docs.select("doc_id", msgs.alias("msgs"))
    first_ok = F.col("msgs")[0]["role"] == "user"
    alternate_ok = (
        F.size(
            F.filter(
                F.sequence(F.lit(0), F.size("msgs") - 2),
                lambda i: F.col("msgs")[i]["role"]
                == F.col("msgs")[i + 1]["role"],
            )
        )
        == 0
    )
    content_ok = (
        F.size(F.filter("msgs", lambda x: F.length(x["content"]) == 0)) == 0
    )
    return m.select(
        "doc_id",
        first_ok.alias("first_ok"),
        alternate_ok.alias("alternate_ok"),
        content_ok.alias("content_ok"),
        (first_ok & alternate_ok & content_ok).alias("accepted"),
    ).orderBy("doc_id")


def hrw_packed_assignments(d: DataFrame) -> DataFrame:
    """Per-doc rendezvous argmax under 8 and 9 shards: returns
    ``doc_id, p8, p9`` where p% 16 is the winning shard (see
    ``curation_rendezvous_shards``). Shared with the HRW property test
    so the test always validates the shipped recipe."""
    fan = d.select(
        "doc_id", F.explode(F.sequence(F.lit(0), F.lit(8))).alias("s")
    )
    hx = F.md5(
        F.concat_ws(":", F.col("doc_id").cast("string"), F.col("s").cast("string"))
    )
    packed = F.conv(F.substring(hx, 1, 14), 16, 10).cast("bigint") * 16 + F.col("s")
    return fan.groupBy("doc_id").agg(
        F.max(F.when(F.col("s") < 8, packed)).alias("p8"),
        F.max(packed).alias("p9"),
    )


# Rendezvous (highest-random-weight) hashing: weight(doc, shard) is the
# first 14 hex digits of md5("doc_id:shard") as a 56-bit integer,
# argmax packed as weight*16 + shard so MAX() resolves both the winner
# and deterministic ties in one aggregate (DuckDB has no hex->int conv;
# the oracle parses the digits positionally, same device as the
# minhash mirror in llm_queries.py).
_HRW_W_SQL = (
    "("
    + " + ".join(
        f"(STRPOS('0123456789abcdef', SUBSTR(h, {i}, 1)) - 1) * {16 ** (14 - i)}"
        for i in range(1, 15)
    )
    + ")"
)


@register(
    "curation_rendezvous_shards",
    oracle=f"""
    WITH fan AS (
      SELECT doc_id, UNNEST(RANGE(0, 9)) AS s FROM documents),
    wt AS (
      SELECT doc_id, s,
             {_HRW_W_SQL} AS w
      FROM (SELECT doc_id, s,
                   md5(CAST(doc_id AS VARCHAR) || ':' || CAST(s AS VARCHAR)) AS h
            FROM fan)),
    a AS (
      SELECT doc_id,
             MAX(CASE WHEN s < 8 THEN w * 16 + s END) AS p8,
             MAX(w * 16 + s) AS p9
      FROM wt GROUP BY doc_id)
    SELECT CAST(p8 % 16 AS BIGINT) AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN p8 % 16 <> p9 % 16 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_moved,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
    FROM a GROUP BY 1 ORDER BY 1
    """,
)
def curation_rendezvous_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5+: rendezvous (highest-random-weight) shard assignment — each
    doc goes to the shard whose md5("doc_id:shard") weight is highest.
    Unlike mod-N hashing, growing the pool relocates only the docs the
    NEW shard wins (~1/(N+1) of them): the query assigns every doc under
    8 and under 9 shards in ONE aggregate and reports per-shard counts
    plus how many docs the 9th shard stole (n_moved), demonstrating the
    minimal-disruption property the technique exists for.

    Determinism: weight is a 56-bit integer from the md5 hex prefix;
    argmax is MAX(weight*16 + shard), so ties (impossible in practice,
    defined anyway) resolve to the higher shard id identically in both
    engines.

    Scale shape: one explode×N_shards fan-out (map-side), one hash
    aggregate keyed on doc_id, one tiny re-aggregate by shard. For very
    large shard pools the fan-out factor is the pool size — cap it with
    a two-level tournament (weights per shard-group, then within the
    winning group); at N=9 the flat form is the right plan."""
    d = tbl(spark, sf_dir, "documents").select("doc_id")
    a = hrw_packed_assignments(d)
    return (
        a.select(
            "doc_id",
            (F.col("p8") % 16).alias("shard"),
            (F.col("p9") % 16).alias("shard9"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(F.col("shard") != F.col("shard9"), 1).otherwise(0)
            ).alias("n_moved"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("shard")
    )


# ---- L5+ (r6): leakage-safe fit/transform standardization ------------------

_CUST_BUCKET_SQL = "substr(md5(CAST(c_custkey AS VARCHAR)), 1, 4)"


@register(
    "curation_fit_transform_scaling",
    oracle=f"""
    WITH b AS (
      SELECT c_mktsegment AS segment,
             CAST(FLOOR(CAST(c_acctbal AS DOUBLE) * 100 + 0.5) AS BIGINT) AS x,
             {_CUST_BUCKET_SQL} < '{frac_to_hex(0.8)}' AS is_train
      FROM customer),
    fit AS (
      SELECT segment,
             CAST(COUNT(*) AS BIGINT) AS n_train,
             CAST(SUM(x) AS BIGINT) AS s1,
             CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS s2
      FROM b WHERE is_train GROUP BY segment),
    scored AS (
      SELECT b.segment, b.is_train,
             CAST(b.x AS DECIMAL(38,0)) * f.n_train - f.s1 AS d,
             f.n_train * f.s2 - CAST(f.s1 AS DECIMAL(38,0)) * f.s1 AS nv
      FROM b JOIN fit f ON b.segment = f.segment)
    SELECT f.segment, f.n_train,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(f.s1 AS DOUBLE) / f.n_train / 100 AS train_mean,
           CAST(SUM(CASE WHEN s.d * s.d > 4 * s.nv THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers,
           CAST(SUM(CASE WHEN NOT s.is_train AND s.d * s.d > 4 * s.nv
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_heldout_outliers
    FROM scored s JOIN fit f ON s.segment = f.segment
    GROUP BY f.segment, f.n_train, f.s1
    ORDER BY f.segment
    """,
)
def curation_fit_transform_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5+ (r6): leakage-safe fit/transform feature standardization —
    the scaler every training pipeline needs: statistics (mean,
    variance) are FIT on the deterministic 80% train split only (the
    `curation_deterministic_split` hash convention on the entity key)
    and APPLIED to every row, so held-out rows never influence their
    own normalization — the sibling of the LOO target encoding's
    leakage discipline (`analytics_target_encoding`). Reports, per
    segment, the train-fit mean and the |z| > 2 outlier counts over
    all rows and over held-out rows specifically.

    Exactness discipline: balances quantize ONCE to integer cents;
    the z-score threshold is evaluated without ever forming a float
    z — |z| > 2  ⟺  (x·n − S1)² > 4·(n·S2 − S1²), all in
    DECIMAL(38,0) (the covariance-matrix posture: cents², times corpus
    cardinality, overflows int64 at scale — decimal keeps the
    inequality exact on both engines). The one display division
    (train_mean) happens at the end.

    Scale shape: the fit is one hash aggregate over the train split
    (mergeable (n, Σx, Σx²) state — incremental refits reuse it, the
    `etl_incremental_rollup` posture); the transform re-joins the
    |segments|-row fit relation (broadcast-able by construction) back
    onto the full table map-side. One fact shuffle for the fit, one
    for the final per-segment audit."""
    cust = tbl(spark, sf_dir, "customer")
    b = cust.select(
        F.col("c_mktsegment").alias("segment"),
        F.floor(F.col("c_acctbal").cast("double") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("x"),
        (
            F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 4)
            < F.lit(frac_to_hex(0.8))
        ).alias("is_train"),
    )
    fit = (
        b.filter("is_train")
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_train"),
            F.sum("x").cast("bigint").alias("s1"),
            F.sum(F.col("x").cast("decimal(38,0)") * F.col("x"))
            .cast("decimal(38,0)")
            .alias("s2"),
        )
    )
    scored = b.join(fit, "segment").select(
        "segment",
        "is_train",
        "n_train",
        "s1",
        (F.col("x").cast("decimal(38,0)") * F.col("n_train") - F.col("s1")).alias("d"),
        (
            F.col("n_train") * F.col("s2")
            - F.col("s1").cast("decimal(38,0)") * F.col("s1")
        ).alias("nv"),
    )
    out = F.col("d") * F.col("d") > F.lit(4) * F.col("nv")
    return (
        scored.groupBy("segment", "n_train", "s1")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_total"),
            F.sum(F.when(out, 1).otherwise(0)).cast("bigint").alias("n_outliers"),
            F.sum(F.when(~F.col("is_train") & out, 1).otherwise(0))
            .cast("bigint")
            .alias("n_heldout_outliers"),
        )
        .select(
            "segment",
            "n_train",
            "n_total",
            (F.col("s1").cast("double") / F.col("n_train") / F.lit(100)).alias(
                "train_mean"
            ),
            "n_outliers",
            "n_heldout_outliers",
        )
        .orderBy("segment")
    )


# ---- L5+ (r6): hard-negative mining from LSH buckets ------------------------

from rpa_etl_investing_spark.operators.similarity import hyperplane_bucket_sql as _hb
from rpa_etl_investing_spark.plans.llm_queries import _cos_sql as _cos


@register(
    "curation_hard_negatives",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding, {_hb("embedding")} AS bucket FROM embeddings),
    p AS (
      SELECT a.vec_id, n.vec_id AS nid,
             CAST(FLOOR(1e10 * ({_cos("a.embedding", "n.embedding")}) + 0.5)
                  AS BIGINT) AS cos_q
      FROM b a JOIN b n ON a.bucket = n.bucket AND a.vec_id <> n.vec_id
      WHERE ({_cos("a.embedding", "n.embedding")}) < 0.8),
    r AS (
      SELECT vec_id, nid, cos_q,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY cos_q DESC, nid) AS rn,
             COUNT(*) OVER (PARTITION BY vec_id) AS nc
      FROM p)
    SELECT vec_id, nid AS hard_neg_id, cos_q,
           CAST(nc AS BIGINT) AS n_candidates
    FROM r WHERE rn = 1 ORDER BY vec_id
    """,
)
def curation_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5+ (r6): HARD-negative mining for contrastive training — the
    quality upgrade over `curation_negative_pairs`' random negatives:
    for each vector, the most similar in-LSH-bucket neighbor that is
    NOT a near-duplicate (cosine < 0.8, the `llm_embedding_near_dup`
    threshold) — semantically close but distinct, exactly what makes a
    contrastive batch informative (easy random negatives saturate the
    loss; duplicates would be false negatives). Emits the chosen
    negative, its quantized similarity, and the per-anchor candidate
    count.

    Scale shape: the same sign-LSH bucket self-join as the near-dup
    and contamination queries — candidates scale with bucket
    occupancy, never n²; the winner is one struct-min hash aggregate
    per anchor (max cos_q, tie to the smaller id) — deterministic on
    the 1e-10 grid in both engines. Anchors whose bucket holds only
    duplicates (or nothing) simply emit no row and would fall back to
    random negatives in a composed pipeline."""
    from rpa_etl_investing_spark.operators.similarity import (
        _norm,
        cosine_prenormed,
        sign_lsh_buckets,
    )

    emb = tbl(spark, sf_dir, "embeddings")
    b = sign_lsh_buckets(emb, 8, "vec_id", "embedding", 64).withColumn(
        "_nrm", _norm(F.col("embedding"))
    )
    anchors = b.select(
        "vec_id",
        F.col("embedding").alias("a_vec"),
        F.col("_nrm").alias("a_norm"),
        "bucket",
    )
    negs = b.select(
        F.col("vec_id").alias("nid"),
        F.col("embedding").alias("n_vec"),
        F.col("_nrm").alias("n_norm"),
        "bucket",
    )
    cos = cosine_prenormed(
        F.col("a_vec"), F.col("n_vec"), F.col("a_norm"), F.col("n_norm")
    )
    p = (
        anchors.join(negs, "bucket")
        .filter(F.col("vec_id") != F.col("nid"))
        .withColumn("cos_sim", cos)
        .filter(F.col("cos_sim") < 0.8)
        .select(
            "vec_id",
            "nid",
            F.floor(F.lit(1e10) * F.col("cos_sim") + F.lit(0.5))
            .cast("bigint")
            .alias("cos_q"),
        )
    )
    return (
        p.groupBy("vec_id")
        .agg(
            F.min(
                F.struct((-F.col("cos_q")).alias("neg_cos"), F.col("nid").alias("nid"))
            ).alias("best"),
            F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
        )
        .select(
            "vec_id",
            F.col("best.nid").alias("hard_neg_id"),
            (-F.col("best.neg_cos")).cast("bigint").alias("cos_q"),
            "n_candidates",
        )
        .orderBy("vec_id")
    )


@register(
    "curation_cc_tripwire",
    oracle="""
    SELECT 'pointer_jumping' AS algorithm,
           CAST(2 AS BIGINT) AS max_iter,
           FALSE AS converged,
           CAST(-1 AS BIGINT) AS n_components
    UNION ALL
    SELECT 'pointer_jumping', CAST(12 AS BIGINT), TRUE, CAST(1 AS BIGINT)
    ORDER BY max_iter
    """,
)
def curation_cc_tripwire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2+ robustness: the convergence tripwire exercised END-TO-END
    (r9 ADVICE item #3 / the r10 candidate from SURVEY §7.2's list).
    The components algorithms raise instead of returning plausible-but-
    wrong labels when the round budget is exhausted; this query PROVES
    that path fires by running ``pointer_jumping_components`` on a
    32-vertex chain twice — max_iter=2 (reach 2 < diameter 31 ⇒ the
    monotone label-sum can't reach fixpoint ⇒ RuntimeError, reported
    as converged=false) and max_iter=12 (pointer jumping needs
    ⌈log2(31)⌉+1 ≈ 6 rounds + 1 confirming round ⇒ converges, 1
    component). The audit relation is deterministic on both arms, so
    the oracle pins the tripwire's firing, not just its existence in
    source.

    The chain fixture is built from ``spark.range`` (sf-invariant by
    design: the property under test is the ROUND BUDGET contract, not
    corpus-dependent clustering — the corpus-scale component queries
    are the curation_*_clusters families)."""
    from rpa_etl_investing_spark.operators.components import (
        pointer_jumping_components,
    )

    n = 32
    edges = spark.range(n - 1).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    rows = []
    for max_iter in (2, 12):
        try:
            labels = pointer_jumping_components(edges, max_iter=max_iter)
            n_comp = labels.select("cluster_id").distinct().count()
            rows.append(("pointer_jumping", max_iter, True, n_comp))
        except RuntimeError:
            rows.append(("pointer_jumping", max_iter, False, -1))
    return spark.createDataFrame(
        rows,
        "algorithm string, max_iter bigint, converged boolean,"
        " n_components bigint",
    ).orderBy("max_iter")
