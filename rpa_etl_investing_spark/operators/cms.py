"""Count-Min sketch — mergeable point-frequency estimation in a
fixed 4×1024 integer table.

The exact token-frequency table is vocabulary-sized; the Misra-Gries
two-pass (operators/heavy_hitters.py) bounds the OUTPUT but still
answers only the ≥θ question. A Count-Min sketch (Cormode &
Muthukrishnan '05) answers point queries — "how often does THIS token
occur?" — from a table whose size is fixed regardless of corpus or
vocabulary size: d hash rows × w buckets of BIGINT counters, each
occurrence incrementing one bucket per row, estimate = min over rows.

Guarantees (one-sided): est ≥ true always (counters only ever
over-count via collisions); est ≤ true + (e/w)·N with probability
≥ 1 − e^(−d) per query, N the total stream length. Both are asserted
as booleans in the registered query and directly in tests.

Spark shape: the build is ONE hash aggregate over (row, bucket) —
4·w distinct keys, so map-side combine collapses each partition to
≤ 4·w rows before the shuffle, and the finished sketch is genuinely
bounded (4·w rows) — broadcastable at ANY corpus size, and mergeable
across corpora by bucket-wise +. Probes are a broadcast join against
the sketch. Hashing is Spark's xxhash64 over (token, row) — one JVM
hash per occurrence per row, no Python anywhere.

The reference has no sketch machinery (its corpus is ~300 scraped
rows, /root/reference/main.py); this is the 100 TB-scale path for
frequency point queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 4
CMS_WIDTH = 1024


def cms_build(tokens: DataFrame, token_col: str = "token") -> DataFrame:
    """Build the sketch from a stream of occurrences (one row per
    occurrence). Returns (row, bucket, c) — at most ``CMS_DEPTH *
    CMS_WIDTH`` rows."""
    fan = tokens.select(
        F.col(token_col).alias("_tok"),
        F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("row"),
    )
    return (
        fan.select(
            "row",
            F.pmod(F.xxhash64("_tok", "row"), F.lit(CMS_WIDTH)).alias("bucket"),
        )
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def cms_estimate(
    sketch: DataFrame, probes: DataFrame, token_col: str = "token"
) -> DataFrame:
    """Point-frequency estimate for each probe token: min over the
    sketch's d rows of the token's bucket counter. ``probes`` carries
    one row per distinct token to estimate; all its columns pass
    through. A bucket no occurrence ever hit reads as 0."""
    fan = probes.select(
        "*",
        F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("row"),
    ).withColumn(
        "bucket", F.pmod(F.xxhash64(F.col(token_col), F.col("row")), F.lit(CMS_WIDTH))
    )
    hit = fan.join(F.broadcast(sketch), ["row", "bucket"], "left").withColumn(
        "c", F.coalesce(F.col("c"), F.lit(0))
    )
    return (
        hit.groupBy(*probes.columns)
        .agg(F.min("c").cast("long").alias("est"))
    )
