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


_ROWS2_T = (
    "array<struct<ord:bigint,m11:double,m12:double,m21:double,m22:double,"
    "q1:double,q2:double>>"
)
_ACC2_T = (
    "struct<m11:double,m12:double,m21:double,m22:double,"
    f"q1:double,q2:double,rows:{_ROWS2_T}>"
)
_OUT2_T = "array<struct<shard:int,s1_in:double,s2_in:double>>"
_CACC2_T = f"struct<s1:double,s2:double,outs:{_OUT2_T}>"


def affine2_recurrence(
    df: DataFrame,
    key_cols: list[str],
    order_col: Column | str,
    matrix: tuple[float, float, float, float],
    v1_col: Column | str,
    v2_col: Column | str,
    out_cols: tuple[str, str] = ("s1", "s2"),
    shard_col: str = SHARD,
) -> DataFrame:
    """Second-order generalization of :func:`linear_recurrence`: the
    2-vector state ``s_i = A·s_{i-1} + v_i`` with a CONSTANT 2×2 matrix
    ``A = (a11, a12, a21, a22)`` and a per-row offset vector
    ``(v1_i, v2_i)``, ``s_{-1} = (0, 0)``.

    Affine maps on R² compose exactly like the scalar case —
    ``(M2, q2)∘(M1, q1) = (M2·M1, M2·q1 + q2)`` — so the same
    two-level scan applies verbatim: JVM shard folds producing each
    row's composed prefix ``(M_i, q_i)``, a constant-sized shard-summary
    composition per key, and a map-side apply
    ``s_i = M_i·s_in + q_i``. This is the machinery for
    double-exponential (Holt) smoothing, damped-trend variants, and any
    order-2 IIR filter; the scalar module docstring's sharding and
    numerics contracts carry over unchanged."""
    a11, a12, a21, a22 = (float(x) for x in matrix)
    ordc = F.col(order_col) if isinstance(order_col, str) else order_col
    v1c = F.col(v1_col) if isinstance(v1_col, str) else v1_col
    v2c = F.col(v2_col) if isinstance(v2_col, str) else v2_col

    seg = df.select(
        *key_cols,
        F.col(shard_col).cast("int").alias("_lr_shard"),
        F.struct(
            ordc.cast("bigint").alias("ord"),
            v1c.cast("double").alias("v1"),
            v2c.cast("double").alias("v2"),
        ).alias("_lr_x"),
    )
    grouped = seg.groupBy(*key_cols, "_lr_shard").agg(
        F.sort_array(F.collect_list("_lr_x")).alias("_lr_xs")
    )

    A11, A12 = F.lit(a11), F.lit(a12)
    A21, A22 = F.lit(a21), F.lit(a22)

    def _step(acc, x):
        m11 = A11 * acc["m11"] + A12 * acc["m21"]
        m12 = A11 * acc["m12"] + A12 * acc["m22"]
        m21 = A21 * acc["m11"] + A22 * acc["m21"]
        m22 = A21 * acc["m12"] + A22 * acc["m22"]
        q1 = A11 * acc["q1"] + A12 * acc["q2"] + x["v1"]
        q2 = A21 * acc["q1"] + A22 * acc["q2"] + x["v2"]
        return F.struct(
            m11.alias("m11"),
            m12.alias("m12"),
            m21.alias("m21"),
            m22.alias("m22"),
            q1.alias("q1"),
            q2.alias("q2"),
            F.array_append(
                acc["rows"],
                F.struct(
                    x["ord"].alias("ord"),
                    m11.alias("m11"),
                    m12.alias("m12"),
                    m21.alias("m21"),
                    m22.alias("m22"),
                    q1.alias("q1"),
                    q2.alias("q2"),
                ),
            ).alias("rows"),
        )

    folded = grouped.withColumn(
        "_lr_acc",
        F.aggregate(
            "_lr_xs",
            F.expr(
                f"cast(struct(1.0d, 0.0d, 0.0d, 1.0d, 0.0d, 0.0d, array())"
                f" as {_ACC2_T})"
            ),
            _step,
        ),
    ).select(
        *key_cols,
        "_lr_shard",
        F.col("_lr_acc")["rows"].alias("_lr_rows"),
        F.col("_lr_acc")["m11"].alias("_m11"),
        F.col("_lr_acc")["m12"].alias("_m12"),
        F.col("_lr_acc")["m21"].alias("_m21"),
        F.col("_lr_acc")["m22"].alias("_m22"),
        F.col("_lr_acc")["q1"].alias("_q1"),
        F.col("_lr_acc")["q2"].alias("_q2"),
    )
    incoming = (
        folded.groupBy(*key_cols)
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        "_lr_shard", "_m11", "_m12", "_m21", "_m22", "_q1", "_q2"
                    )
                )
            ).alias("_lr_segs")
        )
        .withColumn(
            "_lr_c",
            F.aggregate(
                "_lr_segs",
                F.expr(f"cast(struct(0.0d, 0.0d, array()) as {_CACC2_T})"),
                lambda acc, s: F.struct(
                    (
                        s["_m11"] * acc["s1"] + s["_m12"] * acc["s2"] + s["_q1"]
                    ).alias("s1"),
                    (
                        s["_m21"] * acc["s1"] + s["_m22"] * acc["s2"] + s["_q2"]
                    ).alias("s2"),
                    F.array_append(
                        acc["outs"],
                        F.struct(
                            s["_lr_shard"].alias("shard"),
                            acc["s1"].alias("s1_in"),
                            acc["s2"].alias("s2_in"),
                        ),
                    ).alias("outs"),
                ),
            ),
        )
        .select(*key_cols, F.explode(F.col("_lr_c")["outs"]).alias("_lr_o"))
        .select(
            *key_cols,
            F.col("_lr_o")["shard"].alias("_lr_shard"),
            F.col("_lr_o")["s1_in"].alias("_s1in"),
            F.col("_lr_o")["s2_in"].alias("_s2in"),
        )
    )
    o1, o2 = out_cols
    return (
        folded.join(incoming, [*key_cols, "_lr_shard"])
        .select(
            *key_cols,
            F.explode(
                F.transform(
                    "_lr_rows",
                    lambda r: F.struct(
                        r["ord"].alias("ord"),
                        (
                            r["m11"] * F.col("_s1in")
                            + r["m12"] * F.col("_s2in")
                            + r["q1"]
                        ).alias("s1"),
                        (
                            r["m21"] * F.col("_s1in")
                            + r["m22"] * F.col("_s2in")
                            + r["q2"]
                        ).alias("s2"),
                    ),
                )
            ).alias("_lr_r"),
        )
        .select(
            *key_cols,
            F.col("_lr_r")["ord"].alias("ord"),
            F.col("_lr_r")["s1"].alias(o1),
            F.col("_lr_r")["s2"].alias(o2),
        )
    )


def holt(
    df: DataFrame,
    key_cols: list[str],
    order_col: Column | str,
    value_col: Column | str,
    alpha: float,
    beta: float,
    shard_col: str = SHARD,
) -> DataFrame:
    """Holt double-exponential smoothing (level + trend), zero-init:

    ``l_t = α·x_t + (1−α)(l_{t−1} + b_{t−1})``
    ``b_t = β(l_t − l_{t−1}) + (1−β)·b_{t−1}``

    Substituting l_t into b_t makes the pair one constant-matrix affine
    recurrence on the state (l, b):

    ``A = [[1−α, 1−α], [−αβ, 1−αβ]]``, offset ``(α·x_t, αβ·x_t)``

    — solved by :func:`affine2_recurrence`'s distributed scan. Choose α,
    β with exact binary representations (0.25, 0.5) so both engines
    parse identical coefficients."""
    vc = F.col(value_col) if isinstance(value_col, str) else value_col
    x = vc.cast("double")
    return affine2_recurrence(
        df,
        key_cols,
        order_col,
        (1.0 - alpha, 1.0 - alpha, -alpha * beta, 1.0 - alpha * beta),
        F.lit(alpha) * x,
        F.lit(alpha * beta) * x,
        out_cols=("level", "trend"),
        shard_col=shard_col,
    )


def holt_damped(
    df: DataFrame,
    key_cols: list[str],
    order_col: Column | str,
    value_col: Column | str,
    alpha: float,
    beta: float,
    phi: float,
    shard_col: str = SHARD,
) -> DataFrame:
    """Damped-trend Holt smoothing (Gardner & McKenzie 1985) — the
    M-competition default: the trend is multiplied by a damping factor
    ``φ < 1`` each step, so long-horizon forecasts flatten instead of
    extrapolating linearly:

    ``l_t = α·x_t + (1−α)(l_{t−1} + φ·b_{t−1})``
    ``b_t = β(l_t − l_{t−1}) + (1−β)·φ·b_{t−1}``

    Substitution makes the pair ONE constant-matrix affine recurrence
    on (l, b): ``A = [[1−α, (1−α)φ], [−αβ, φ(1−αβ)]]``, offset
    ``(α·x_t, αβ·x_t)`` — the same :func:`affine2_recurrence`
    distributed scan as the undamped form (``φ = 1`` reduces to
    :func:`holt` exactly). Choose α, β, φ with exact binary
    representations (0.25, 0.5, 0.875) so both engines parse identical
    coefficients."""
    vc = F.col(value_col) if isinstance(value_col, str) else value_col
    x = vc.cast("double")
    return affine2_recurrence(
        df,
        key_cols,
        order_col,
        (
            1.0 - alpha,
            (1.0 - alpha) * phi,
            -alpha * beta,
            phi * (1.0 - alpha * beta),
        ),
        F.lit(alpha) * x,
        F.lit(alpha * beta) * x,
        out_cols=("level", "trend"),
        shard_col=shard_col,
    )
