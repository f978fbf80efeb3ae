"""As-of join (SURVEY §2.3 J6) — the time-series operator Spark lacks
natively, built as a union + window merge-scan.

Shape: tag both sides, union them, and take ``last(value, ignorenulls)``
over a per-key event-time window. This is the scalable form — ONE
shuffle on the join key (no range cross-join, no per-key fan-out),
the same access pattern a native as-of implementation performs. The
``pd.merge_asof``-in-``applyInPandas`` alternative exists for pandas
semantics but moves data through Python; this stays fully JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For each left row, attach the adjacent right row for the same key:
    ``direction="backward"`` (default) takes the most recent right row
    with ``right.ts <= left.ts``; ``direction="forward"`` the earliest
    right row with ``right.ts >= left.ts`` (conversion attribution,
    next-restock lookups). Both are the same one-shuffle merge-scan —
    forward just reverses the scan order.

    ``right`` must be unique per (key, ts); pre-dedupe otherwise or the
    survivor at duplicate timestamps is unspecified.

    ``tolerance_seconds`` bounds staleness (pandas ``merge_asof``
    tolerance): a match farther than the bound in the scan direction is
    nulled out AFTER the merge-scan — a map-side conditional on the
    already-attached timestamps, costing no extra shuffle.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    rtypes = dict(right.dtypes)
    l_tag = left.select(
        "*",
        F.lit(1).alias("_is_left"),
        F.lit(None).cast("timestamp").alias("_r_ts"),
        *[F.lit(None).cast(rtypes[c]).alias(f"_r_{c}") for c in value_cols],
    )
    r_tag = right.select(
        F.col(key),
        F.col(ts),
        F.lit(0).alias("_is_left"),
        F.col(ts).alias("_r_ts"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)
    # right rows sort before left rows at equal ts → inclusive semantics
    # in both directions (forward scans time-reversed)
    ts_order = F.col(ts).asc() if direction == "backward" else F.col(ts).desc()
    w = (
        W.partitionBy(key)
        .orderBy(ts_order, F.col("_is_left").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = (
        unioned.select(
            *left.columns,
            "_is_left",
            F.last("_r_ts", ignorenulls=True).over(w).alias(f"{ts}{suffix}"),
            *[
                F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
                for c in value_cols
            ],
        )
        .filter(F.col("_is_left") == 1)
        .drop("_is_left")
    )
    if tolerance_seconds is not None:
        us = lambda c: F.unix_micros(c.cast("timestamp_ltz"))  # noqa: E731
        gap = (
            us(F.col(ts)) - us(F.col(f"{ts}{suffix}"))
            if direction == "backward"
            else us(F.col(f"{ts}{suffix}")) - us(F.col(ts))
        )
        within = gap <= F.lit(int(tolerance_seconds) * 1_000_000)
        out = out.select(
            *left.columns,
            F.when(within, F.col(f"{ts}{suffix}")).alias(f"{ts}{suffix}"),
            *[
                F.when(within, F.col(f"{c}{suffix}")).alias(f"{c}{suffix}")
                for c in value_cols
            ],
        )
    return out
