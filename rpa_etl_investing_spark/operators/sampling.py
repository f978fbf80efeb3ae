"""Deterministic sampling / splitting / mixing for training-data curation.

A training pipeline needs samples that are **stable**: re-running the
job, adding executors, or re-partitioning the input must never move a
document across the train/val/test boundary, and two engines must agree
on the assignment (the driver's DuckDB oracle recomputes it). That
rules out ``df.sample()``/``RAND()`` (seed- and partitioning-dependent)
in favor of content-keyed hashing: a document's fate is a pure function
of its key.

Mechanism: the first 4 hex chars of ``md5(key)`` form a uniform
16-bit bucket; fractions become *lexicographic* hex thresholds
(``frac → format(int(frac * 0x10000), "04x")``), so the comparison is a
plain string ``<`` that behaves identically in Spark, DuckDB, and any
engine with a standard md5 — no integer conversion, no float rounding.

Scale: all three operators are stateless per-row projections/filters —
no shuffle, no state, fully pipelined into the scan; at 100 TB they
cost one pass and prune columns/rows before anything expensive runs.
Generalizes the reference's row-level transform stage
(``/root/reference/main.py:100-106``) to curation semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def frac_to_hex(frac: float) -> str:
    """A keep-fraction as a 4-hex-digit lexicographic threshold.

    ``bucket < frac_to_hex(f)`` keeps ``round(f * 65536)`` of the 65536
    equally-likely buckets — exact for any fraction on the 1/65536 grid.
    """
    n = round(frac * 0x10000)
    if not 0 <= n <= 0x10000:
        raise ValueError(f"fraction {frac} outside [0, 1]")
    return format(n, "04x") if n <= 0xFFFF else "g"  # 'g' > 'ffff': keep all


def hash_bucket(key: Column | str) -> Column:
    """Uniform 16-bit bucket for a key column: ``substr(md5(key), 1, 4)``.

    Kept as lowercase hex text so thresholds compare lexicographically
    (ASCII ``0-9 < a-f``) in every engine.
    """
    c = F.col(key) if isinstance(key, str) else key
    return F.substring(F.md5(c.cast("string")), 1, 4)


def deterministic_split(
    df: DataFrame,
    key: str,
    train: float = 0.8,
    val: float = 0.1,
) -> DataFrame:
    """Assign a stable ``split`` label (train/val/test) keyed on ``key``.

    The boundaries are cumulative thresholds over the hash bucket, so
    the three sets partition the data exactly and adding rows later
    never reshuffles existing assignments — the property that keeps a
    held-out set held out across pipeline reruns.
    """
    b = hash_bucket(key)
    return df.withColumn(
        "split",
        F.when(b < F.lit(frac_to_hex(train)), "train")
        .when(b < F.lit(frac_to_hex(train + val)), "val")
        .otherwise("test"),
    )


def weighted_source_mix(
    df: DataFrame, key: str, source_col: str, weights: dict[str, float]
) -> DataFrame:
    """Down-sample each source to its mixture weight (keep-fraction).

    The per-source threshold is a literal CASE over ``source_col``;
    sources absent from ``weights`` are dropped (weight 0). This is the
    standard "mix web at 10%, books at 100%" curation step, executed as
    one shuffle-free filter instead of N per-source jobs.
    """
    thresh: Column = F.lit("0000")
    for src, w in sorted(weights.items()):
        thresh = F.when(F.col(source_col) == src, F.lit(frac_to_hex(w))).otherwise(
            thresh
        )
    return df.filter(hash_bucket(key) < thresh)


def temperature_mix(
    df: DataFrame,
    key: str,
    source_col: str,
    size_col: str,
) -> DataFrame:
    """Square-root temperature (α=0.5, UniMax-style) source mixing with
    DATA-DERIVED keep fractions: each source's per-row keep rate is
    ``sqrt(smallest_source_size / source_size)``, so sampled source mass
    goes as ``size^0.5`` — big sources are damped toward the small ones
    instead of drowning them, and the smallest source keeps everything.
    Returns the input rows that survive, plus ``keep_frac`` and the
    per-source ``src_size`` for auditing.

    Unlike :func:`weighted_source_mix`, the fractions are computed
    IN-ENGINE from the data (no driver collect, no hand-tuned weight
    table): per-source sizes are one tiny aggregate, the global min is a
    broadcast scalar, and the fraction→hex-threshold conversion happens
    in the plan, so the whole derivation is a broadcast join on top of
    the same shuffle-free hash filter. α is fixed at 0.5 because
    ``sqrt`` is correctly rounded in every IEEE engine — the oracle
    reproduces the fraction bit-exactly, which a general ``pow(x, α)``
    (libm-dependent last ulp) could not guarantee.
    """
    sizes = df.groupBy(source_col).agg(F.sum(size_col).alias("src_size"))
    mn = sizes.agg(F.min("src_size").alias("_min_size"))
    fracs = (
        sizes.crossJoin(F.broadcast(mn))
        .withColumn(
            "keep_frac",
            F.sqrt(F.col("_min_size").cast("double") / F.col("src_size").cast("double")),
        )
        .withColumn("_n16", F.round(F.col("keep_frac") * 65536).cast("int"))
        .withColumn(
            "_thr",
            F.when(F.col("_n16") >= 65536, F.lit("g")).otherwise(
                F.lower(F.lpad(F.hex(F.col("_n16")), 4, "0"))
            ),
        )
        .select(source_col, "src_size", "keep_frac", "_thr")
    )
    return (
        df.join(F.broadcast(fracs), source_col)
        .filter(hash_bucket(key) < F.col("_thr"))
        .drop("_thr")
    )
