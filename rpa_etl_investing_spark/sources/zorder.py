"""Z-order (Morton curve) layout — multi-dimensional data clustering.

Bucketing (sources/bucketing.py) optimizes ONE join key; range-sorting
optimizes ONE filter column. A table filtered on *several* columns
(``l_partkey`` AND ``l_suppkey``) needs a layout where files are tight
in every dimension at once. The standard lakehouse answer is to sort
by a space-filling curve: bucket each dimension to 2^bits levels,
interleave the bits (Morton 1966; the technique behind Z-ORDER
clustering in modern table formats), and range-partition files by the
interleaved key. Nearby z-values are nearby in ALL dimensions, so
every file's per-column min/max footer spans a narrow slice of each
dimension and scan pruning works for filters on either column — where
a linear sort leaves the second column's span per file at ~100% of the
domain (asserted quantitatively in tests/test_sources.py).

Determinism: bucketing is integer scaling against broadcast min/max
scalars, interleaving is a fixed sum of shifted bit tests — all exact
BIGINT expressions, oracle-reproducible to the bit, whole-stage
codegen'd, zero UDFs.

At 100 TB: z-ordering is a one-time layout cost (one repartitionByRange
write); after it, any query filtering on a z-dimension prunes files by
parquet min/max footers alone — no index structure to maintain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_interleave(a: Column, b: Column, bits: int) -> Column:
    """Interleave the low ``bits`` bits of two bucket ids into one
    z-value (a's bit k lands at position 2k+1, b's at 2k) — a fixed
    sum of shift/mask terms, identical syntax on Spark and the oracle."""
    z = F.lit(0).cast("bigint")
    for k in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(a, k).bitwiseAND(F.lit(1)), 2 * k + 1)
            + F.shiftleft(F.shiftright(b, k).bitwiseAND(F.lit(1)), 2 * k)
        )
    return z.cast("bigint")


def with_zvalue(
    df: DataFrame, col_a: str, col_b: str, bits: int = 4, out: str = "zval"
) -> DataFrame:
    """Attach the Morton z-value of (col_a, col_b) as column ``out``.

    Each dimension is scaled to ``[0, 2^bits - 1]`` with
    ``((v - lo) * (2^bits - 1)) div (hi - lo)`` — integer ``div``, so
    the bucket id (and hence the z-value) is bit-exact on any engine;
    a degenerate ``hi == lo`` dimension maps to bucket 0. Bounds ride
    in as a 1-row broadcast aggregate (no driver collect), the same
    scalar plumbing as gap-fill's derived spine bounds."""
    hi = (1 << bits) - 1
    bounds = df.agg(
        F.min(col_a).cast("bigint").alias("_a_lo"),
        F.max(col_a).cast("bigint").alias("_a_hi"),
        F.min(col_b).cast("bigint").alias("_b_lo"),
        F.max(col_b).cast("bigint").alias("_b_hi"),
    )
    j = df.crossJoin(F.broadcast(bounds))
    ab = F.expr(
        f"CASE WHEN _a_hi > _a_lo THEN (CAST({col_a} AS BIGINT) - _a_lo) * {hi}"
        f" div (_a_hi - _a_lo) ELSE CAST(0 AS BIGINT) END"
    )
    bb = F.expr(
        f"CASE WHEN _b_hi > _b_lo THEN (CAST({col_b} AS BIGINT) - _b_lo) * {hi}"
        f" div (_b_hi - _b_lo) ELSE CAST(0 AS BIGINT) END"
    )
    return j.select(*df.columns, morton_interleave(ab, bb, bits).alias(out))
