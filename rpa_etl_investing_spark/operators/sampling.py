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
