"""Two-level (sharded) prefix sums — running aggregates whose
parallelism is NOT bounded by the window partition-key cardinality.

The problem (r3 verdict item #1): ``SUM(x) OVER (PARTITION BY source
ORDER BY id ROWS UNBOUNDED PRECEDING)`` plans one sorted task per
``source``. With a handful of sources at 100 TB, each task scans that
source's ENTIRE row set — the classic single-partition-window
scale-killer, merely sharded by a low-cardinality key.

The fix is the same two-level shape the dim upsert already uses for
distributed id assignment (etl/pipeline.py:150-166):

1. split each partition into shards via a column that is a MONOTONE
   function of the ordering key (so shard order == row order);
2. run the running sum locally per (partition, shard) — parallel across
   shards, each task sees only its shard;
3. aggregate per-shard totals (map-side combinable, tiny output:
   n_partitions × n_shards rows), turn them into cumulative offsets
   with a window over that constant-sized frame;
4. broadcast the offsets back and add them map-side.

Steps 2-4 cost one extra cheap aggregate pass + a broadcast join; in
exchange no task ever holds more than ~1/n_shards of a partition.
The result is bit-identical to the single-window form because the
shard column never reorders rows — it only cuts the sorted sequence
into contiguous ranges.

Monotonicity contract: ``shard_col`` must be non-decreasing along the
window's sort order within every partition. For an ascending integer
key, :func:`with_id_range_shard` builds one from broadcast min/max
bounds; for domain-specific orders (e.g. quality DESC with known value
atoms) the caller supplies its own — see
plans/curation_queries.py:_quality_shard for a worked example.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SHARD = "_ps_shard"


def with_id_range_shard(
    df: DataFrame, id_col: str, n_shards: int | None = None, out: str = SHARD
) -> DataFrame:
    """Add a shard id that is monotone in an integer ``id_col``: equal-width
    id ranges between the column's broadcast min/max.

    ``n_shards`` defaults to ``spark.sql.shuffle.partitions`` so shard
    parallelism tracks the session's shuffle sizing. The bounds ride in
    as a 1-row broadcast (no driver collect); width is
    ``floor((hi - lo) / n) + 1`` so shard ids land in ``[0, n)``.
    Uniform-width ranges assume roughly dense ids (true for the fixture
    doc_ids); at scale a skewed id space would swap this for
    quantile-derived cut points — the downstream machinery is unchanged.
    """
    n = n_shards or int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    bounds = df.agg(
        F.min(id_col).cast("long").alias("_ps_lo"),
        F.max(id_col).cast("long").alias("_ps_hi"),
    )
    width = F.floor((F.col("_ps_hi") - F.col("_ps_lo")) / F.lit(n)) + 1
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(
            out, F.floor((F.col(id_col) - F.col("_ps_lo")) / width).cast("int")
        )
        .drop("_ps_lo", "_ps_hi")
    )


def sharded_running_sum(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[Column | str],
    value_col: Column | str,
    out_col: str,
    shard_col: str = SHARD,
) -> DataFrame:
    """Running sum of ``value_col`` over (``partition_cols`` ORDER BY
    ``order_cols`` ROWS UNBOUNDED PRECEDING..CURRENT ROW), computed with
    per-shard local windows + broadcast cumulative shard offsets.

    ``df`` must already carry ``shard_col`` (see module docstring for
    the monotonicity contract). The shard column is left in place for
    the caller to drop — it is also the key that proves, in the physical
    plan, that no per-partition global sort exists (tests/test_plans.py
    pins ``hashpartitioning(..., _ps_shard`` on the window exchange).
    """
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    local_w = (
        Window.partitionBy(*partition_cols, shard_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = df.withColumn("_ps_local", F.sum(value).over(local_w))
    totals = df.groupBy(*partition_cols, shard_col).agg(
        F.sum(value).alias("_ps_tot")
    )
    # cumulative offsets over the (n_partitions × n_shards)-row totals
    # frame — the only ordered window over an unsharded partition, and it
    # runs on a constant-sized input at any data scale
    off_w = (
        Window.partitionBy(*partition_cols)
        .orderBy(shard_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "_ps_off", F.coalesce(F.sum("_ps_tot").over(off_w), F.lit(0))
    ).select(*partition_cols, shard_col, "_ps_off")
    return (
        local.join(F.broadcast(offsets), [*partition_cols, shard_col])
        .withColumn(out_col, (F.col("_ps_local") + F.col("_ps_off")).cast("long"))
        .drop("_ps_local", "_ps_off")
    )


def sharded_row_number(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[Column | str],
    out_col: str,
    shard_col: str = SHARD,
) -> DataFrame:
    """``row_number()`` over (``partition_cols`` ORDER BY ``order_cols``)
    as a sharded running count — the selection-rank primitive behind the
    two-pass quality cut (keep rows ranked ≤ k without a per-partition
    global sort)."""
    return sharded_running_sum(
        df, partition_cols, order_cols, F.lit(1), out_col, shard_col
    )
