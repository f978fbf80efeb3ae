"""DSIR-style importance weighting for training-data selection.

Data Selection with Importance Resampling (Xie et al., 2023, public
paper arXiv:2302.03169): score every raw document by how target-like
its hashed bag-of-words is — the log likelihood ratio between a target
n-gram model and a raw n-gram model over B hashed feature buckets —
then sample with Gumbel-top-k so selection is ∝ exp(weight).

Engine-parity design (the repo-wide rule from ``plans/registry.py``):
no free-floating float reductions. The only transcendental, ``ln`` of
the smoothed bucket ratio, is computed ONCE per bucket (B values, not
per token), quantized to the 1e-6 integer grid
(``FLOOR(1e6 * ln(r) + 0.5)`` — a 1-2 ulp libm difference between
JVM and DuckDB flips the floor only when the true value sits within
~1e-10 of a grid boundary), and every per-document reduction is then an
exact BIGINT sum, identical in any engine and any partitioning. The
Gumbel perturbation uses the same trick: a 16-bit md5 bucket of the
doc id gives a deterministic uniform ``u``, and ``-ln(-ln(u))`` is
quantized to the same grid, so the top-k sort key is a pure integer.

Scale shape (100 TB): one token explode feeding two hash aggregates —
per-(bucket) corpus counts (B=256 groups, tiny) and per-(doc, bucket)
counts (partial map-side combine collapses the token fan-out before the
shuffle) — then a broadcast join of the 256-row log-ratio table and one
final per-doc aggregate. Text itself never shuffles; only (doc_id,
bucket, count) rows do. No driver collect anywhere; the totals needed
for smoothing ride along as a 1-row broadcast.

Generalizes the reference's row-level scoring stage
(``/root/reference/main.py:100-106``) to corpus-level selection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 256  # 2 hex chars of md5 — engine-identical, no int parse
QUANT = 1_000_000  # log-ratio grid: 1e-6 resolution, exact BIGINT sums


def token_bucket(tok: Column) -> Column:
    """Hashed-feature bucket for a token: first 2 hex chars of md5."""
    return F.substring(F.md5(tok.cast("binary")), 1, 2)


def dsir_quantized_logratios(
    docs: DataFrame, is_target: Column, text_col: str = "text"
) -> DataFrame:
    """Per-bucket quantized log likelihood ratios + per-doc-bucket counts.

    Returns a DataFrame of ``(doc_id, bucket, c, qlr)`` where ``c`` is
    the doc's token count in the bucket and ``qlr`` the bucket's
    smoothed log-ratio on the 1e-6 integer grid. Downstream reductions
    over it are exact integer sums.
    """
    toks = docs.select(
        "doc_id",
        is_target.alias("is_target"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).withColumn("bucket", token_bucket(F.col("tok")))

    # Corpus-level bucket counts for both models in ONE aggregate
    # (B=256 groups — the shuffle moves 256 rows per partition).
    bs = toks.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("t_cnt"),
        F.sum(F.when(F.col("is_target"), 0).otherwise(1)).alias("r_cnt"),
    )
    tot = bs.agg(
        F.sum("t_cnt").alias("tt"), F.sum("r_cnt").alias("rt")
    )  # 1-row broadcast scalar — no driver collect
    # Add-one smoothing over the B-bucket vocabulary; the double-typed
    # expression is parenthesized identically in the SQL oracle so both
    # engines feed libm ln the same IEEE-754 input.
    lr = bs.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.floor(
            F.lit(float(QUANT))
            * F.log(
                ((F.col("t_cnt") + F.lit(1.0)) / (F.col("tt") + F.lit(float(N_BUCKETS))))
                * ((F.col("rt") + F.lit(float(N_BUCKETS))) / (F.col("r_cnt") + F.lit(1.0)))
            )
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("qlr"),
    )

    dc = toks.groupBy("doc_id", "bucket").agg(F.count("*").alias("c"))
    return dc.join(F.broadcast(lr), "bucket")


def dsir_weights(
    docs: DataFrame, is_target: Column, text_col: str = "text"
) -> DataFrame:
    """Per-document DSIR importance weight.

    ``(doc_id, n_tokens, q_weight, dsir_weight)`` — ``q_weight`` is the
    exact integer Σ c·qlr (the sort/sampling key), ``dsir_weight`` the
    human-readable double ``q_weight / 1e6``.
    """
    scored = dsir_quantized_logratios(docs, is_target, text_col)
    return scored.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.sum(F.col("c") * F.col("qlr")).cast("bigint").alias("q_weight"),
    ).withColumn("dsir_weight", F.col("q_weight") / F.lit(float(QUANT)))


def gumbel_quantized(key: Column) -> Column:
    """Deterministic quantized Gumbel(0,1) perturbation for a key.

    ``u = (md5_16bit(key) + 0.5) / 65536`` is uniform on (0,1) and a
    pure function of the key (stable across reruns / engines), so
    ``-ln(-ln(u))`` is a standard Gumbel draw; quantized to the 1e-6
    grid it composes with ``q_weight`` into an all-integer top-k key.
    """
    k16 = F.conv(F.substring(F.md5(key.cast("string").cast("binary")), 1, 4), 16, 10).cast(
        "bigint"
    )
    u = (k16.cast("double") + F.lit(0.5)) / F.lit(65536.0)
    return (
        F.floor(F.lit(float(QUANT)) * (-F.log(-F.log(u))) + F.lit(0.5))
        .cast("bigint")
    )
