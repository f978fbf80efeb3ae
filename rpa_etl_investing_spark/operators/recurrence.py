"""Distributed first-order linear recurrences — EWMA and friends
without a per-key sequential scan over the whole series.

The problem: ``y_i = a_i * y_{i-1} + b_i`` (EWMA is ``a = 1-alpha``,
``b = alpha * x``) looks inherently sequential, and the naive Spark
answer — ``applyInPandas`` per key, one task scanning the key's entire
history — recreates the single-partition-window scale-killer the
prefix-sum module exists to avoid (operators/prefix.py). The reference
pipeline's consumers want exactly this shape over its snapshot
timeline (``/root/reference/main.py:44``): smoothed price series,
decayed activity scores.

The fix is that first-order linear maps COMPOSE: a run of rows acts on
the incoming state as ``y_out = P * y_in + Q`` with ``P = prod(a_i)``
and ``Q`` the recurrence run from 0. That associativity gives the same
two-level scan shape as ``sharded_running_sum``:

1. cut each key's series into contiguous shards (monotone shard id —
   same contract as operators/prefix.py);
2. fold each shard ONCE, JVM-side, with the higher-order ``aggregate``
   over a ``sort_array(collect_list(...))`` segment — producing every
   row's within-shard affine prefix ``(P_i, q_i)`` plus the shard
   summary ``(P_seg, Q_seg)``;
3. compose the tiny (keys x shards) summary table per key into each
   shard's incoming state ``y_in`` — constant-sized work at any data
   scale;
4. join ``y_in`` back and emit ``y_i = P_i * y_in + q_i`` map-side
   via ``transform`` + ``explode``.

No Python runs anywhere (the folds are Catalyst higher-order
functions inside codegen); no task ever holds more than one shard of
one key. Numerics: the composed form is algebraically identical to
the sequential recurrence but associates differently, so outputs can
differ from a strict left fold in the last ulp — consumers that
compare against a sequential engine quantize to a grid first (the
same discipline as plans/timeseries.py's integer-grid metrics).

Shard-size contract: ``collect_list`` materializes one shard of one
key per aggregation buffer, so shard count must keep shards at an
in-memory-friendly size (the prefix-sum module's sizing argument,
verbatim). Order values must be unique per key — they are the sort
key inside each shard.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rpa_etl_investing_spark.operators.prefix import SHARD

_ROWS_T = "array<struct<ord:bigint,p:double,q:double>>"
_ACC_T = f"struct<p:double,q:double,rows:{_ROWS_T}>"
_OUT_T = "array<struct<shard:int,y_in:double>>"
_CACC_T = f"struct<y:double,outs:{_OUT_T}>"


def linear_recurrence(
    df: DataFrame,
    key_cols: list[str],
    order_col: Column | str,
    a_col: Column | str,
    b_col: Column | str,
    out_col: str = "y",
    shard_col: str = SHARD,
) -> DataFrame:
    """Per ``key_cols`` series ordered by ``order_col`` (a BIGINT,
    unique per key), compute ``y_i = a_i * y_{i-1} + b_i`` with
    ``y_{-1} = 0``, returning one row per input row:
    ``(*key_cols, ord, y)``.

    ``df`` must already carry ``shard_col`` monotone in the order
    (operators/prefix.py contract — use ``with_id_range_shard`` on the
    integer order)."""
    ordc = F.col(order_col) if isinstance(order_col, str) else order_col
    ac = F.col(a_col) if isinstance(a_col, str) else a_col
    bc = F.col(b_col) if isinstance(b_col, str) else b_col

    seg = df.select(
        *key_cols,
        F.col(shard_col).cast("int").alias("_lr_shard"),
        F.struct(
            ordc.cast("bigint").alias("ord"),
            ac.cast("double").alias("a"),
            bc.cast("double").alias("b"),
        ).alias("_lr_x"),
    )
    # one aggregation buffer per (key, shard): the shard's rows, sorted
    grouped = seg.groupBy(*key_cols, "_lr_shard").agg(
        F.sort_array(F.collect_list("_lr_x")).alias("_lr_xs")
    )
    # JVM-side left fold: per-row affine prefix (P_i, q_i) w.r.t. the
    # shard's incoming state, plus the shard summary as the last entry
    folded = grouped.withColumn(
        "_lr_acc",
        F.aggregate(
            "_lr_xs",
            F.expr(f"cast(struct(1.0d, 0.0d, array()) as {_ACC_T})"),
            lambda acc, x: F.struct(
                (acc["p"] * x["a"]).alias("p"),
                (x["a"] * acc["q"] + x["b"]).alias("q"),
                F.array_append(
                    acc["rows"],
                    F.struct(
                        x["ord"].alias("ord"),
                        (acc["p"] * x["a"]).alias("p"),
                        (x["a"] * acc["q"] + x["b"]).alias("q"),
                    ),
                ).alias("rows"),
            ),
        ),
    ).select(
        *key_cols,
        "_lr_shard",
        F.col("_lr_acc")["rows"].alias("_lr_rows"),
        F.col("_lr_acc")["p"].alias("_lr_P"),
        F.col("_lr_acc")["q"].alias("_lr_Q"),
    )
    # compose shard summaries per key -> each shard's incoming y_in.
    # (keys x shards) rows total: constant-sized at any data scale.
    incoming = (
        folded.groupBy(*key_cols)
        .agg(
            F.sort_array(
                F.collect_list(F.struct("_lr_shard", "_lr_P", "_lr_Q"))
            ).alias("_lr_segs")
        )
        .withColumn(
            "_lr_c",
            F.aggregate(
                "_lr_segs",
                F.expr(f"cast(struct(0.0d, array()) as {_CACC_T})"),
                lambda acc, s: F.struct(
                    (s["_lr_P"] * acc["y"] + s["_lr_Q"]).alias("y"),
                    F.array_append(
                        acc["outs"],
                        F.struct(
                            s["_lr_shard"].alias("shard"),
                            acc["y"].alias("y_in"),
                        ),
                    ).alias("outs"),
                ),
            ),
        )
        .select(
            *key_cols, F.explode(F.col("_lr_c")["outs"]).alias("_lr_o")
        )
        .select(
            *key_cols,
            F.col("_lr_o")["shard"].alias("_lr_shard"),
            F.col("_lr_o")["y_in"].alias("_lr_yin"),
        )
    )
    # apply: y_i = P_i * y_in + q_i, map-side after a keyed join
    return (
        folded.join(incoming, [*key_cols, "_lr_shard"])
        .select(
            *key_cols,
            F.explode(
                F.transform(
                    "_lr_rows",
                    lambda r: F.struct(
                        r["ord"].alias("ord"),
                        (r["p"] * F.col("_lr_yin") + r["q"]).alias("y"),
                    ),
                )
            ).alias("_lr_r"),
        )
        .select(
            *key_cols,
            F.col("_lr_r")["ord"].alias("ord"),
            F.col("_lr_r")["y"].alias(out_col),
        )
    )


def ewma(
    df: DataFrame,
    key_cols: list[str],
    order_col: Column | str,
    value_col: Column | str,
    alpha: float,
    out_col: str = "ewma",
    shard_col: str = SHARD,
) -> DataFrame:
    """Zero-initialised exponentially-weighted moving average:
    ``y_i = alpha * x_i + (1 - alpha) * y_{i-1}``, ``y_{-1} = 0`` —
    a constant-coefficient :func:`linear_recurrence`."""
    vc = F.col(value_col) if isinstance(value_col, str) else value_col
    return linear_recurrence(
        df,
        key_cols,
        order_col,
        F.lit(1.0 - alpha),
        F.lit(alpha) * vc.cast("double"),
        out_col=out_col,
        shard_col=shard_col,
    )
