"""Distributed linear-recurrence scan (operators/recurrence.py):
sequential-reference correctness, shard-count invariance, and the
scale-shape plan properties (no per-key global window, no Python)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rpa_etl_investing_spark.operators.prefix import with_id_range_shard
from rpa_etl_investing_spark.operators.recurrence import ewma, linear_recurrence


def _series(spark, n_keys=3, n=40):
    # x depends on (key, ord) deterministically; a varies per row so the
    # general (non-constant-coefficient) path is exercised
    return spark.range(n_keys * n).select(
        (F.col("id") % n_keys).alias("k"),
        (F.col("id") / n_keys).cast("bigint").alias("ord"),
        ((F.col("id") % 7) / 10.0 + 0.2).alias("a"),
        ((F.col("id") % 11) * 1.5 - 3.0).alias("b"),
    )


def _sequential(rows):
    """Strict left-fold reference, grouped by key."""
    out = {}
    by_key = {}
    for r in sorted(rows, key=lambda r: (r["k"], r["ord"])):
        y = by_key.get(r["k"], 0.0)
        y = r["a"] * y + r["b"]
        by_key[r["k"]] = y
        out[(r["k"], r["ord"])] = y
    return out


def test_matches_sequential_reference(spark):
    df = _series(spark)
    sharded = with_id_range_shard(df, "ord", n_shards=5)
    got = linear_recurrence(sharded, ["k"], "ord", "a", "b").collect()
    ref = _sequential(df.collect())
    assert len(got) == len(ref)
    for r in got:
        assert r["y"] == pytest.approx(ref[(r["k"], r["ord"])], abs=1e-9)


def test_shard_count_invariance(spark):
    """1 shard (pure sequential fold) and 7 shards (composed) agree to
    float tolerance — the associativity argument, executed."""
    df = _series(spark, n_keys=2, n=50)
    one = {
        (r["k"], r["ord"]): r["y"]
        for r in linear_recurrence(
            with_id_range_shard(df, "ord", n_shards=1), ["k"], "ord", "a", "b"
        ).collect()
    }
    many = linear_recurrence(
        with_id_range_shard(df, "ord", n_shards=7), ["k"], "ord", "a", "b"
    ).collect()
    assert len(many) == len(one)
    for r in many:
        assert r["y"] == pytest.approx(one[(r["k"], r["ord"])], rel=1e-12)


def test_ewma_zero_init_formula(spark):
    df = spark.range(10).select(
        F.lit(0).alias("k"),
        F.col("id").alias("ord"),
        (F.col("id") + 1.0).alias("x"),
    )
    sharded = with_id_range_shard(df, "ord", n_shards=3)
    got = {
        r["ord"]: r["ewma"]
        for r in ewma(sharded, ["k"], "ord", "x", alpha=0.25).collect()
    }
    acc = 0.0
    for i in range(10):
        acc = 0.25 * (i + 1) + 0.75 * acc
        assert got[i] == pytest.approx(acc, abs=1e-12)


def test_plan_has_no_per_key_window_and_no_python(spark):
    """The scale contract: the physical plan contains (a) no Window
    operator at all — the scan is folds + joins, so nothing sorts a
    whole key in one task — and (b) no Python evaluation (the folds
    are Catalyst higher-order functions)."""
    df = _series(spark)
    sharded = with_id_range_shard(df, "ord", n_shards=5)
    plan = (
        linear_recurrence(sharded, ["k"], "ord", "a", "b")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the within-shard fold groups by (key, shard), proving shard-level
    # parallelism in the aggregate that carries the heavy rows
    assert "_lr_shard" in plan


# --- second-order (matrix) recurrence: Holt smoothing --------------------


def _holt_sequential(rows, alpha, beta):
    out = {}
    state = {}
    for r in sorted(rows, key=lambda r: (r["k"], r["ord"])):
        l_prev, b_prev = state.get(r["k"], (0.0, 0.0))
        l_new = alpha * r["x"] + (1 - alpha) * (l_prev + b_prev)
        b_new = beta * (l_new - l_prev) + (1 - beta) * b_prev
        state[r["k"]] = (l_new, b_new)
        out[(r["k"], r["ord"])] = (l_new, b_new)
    return out


def _holt_series(spark, n_keys=3, n=40):
    return spark.range(n_keys * n).select(
        (F.col("id") % n_keys).alias("k"),
        (F.col("id") / n_keys).cast("bigint").alias("ord"),
        ((F.col("id") % 13) * 2.5 - 6.0).alias("x"),
    )


def test_holt_matches_sequential_reference(spark):
    from rpa_etl_investing_spark.operators.recurrence import holt

    df = _holt_series(spark)
    sharded = with_id_range_shard(df, "ord", n_shards=5)
    got = holt(sharded, ["k"], "ord", "x", alpha=0.25, beta=0.5).collect()
    ref = _holt_sequential(df.collect(), 0.25, 0.5)
    assert len(got) == len(ref)
    for r in got:
        el, eb = ref[(r["k"], r["ord"])]
        assert r["level"] == pytest.approx(el, abs=1e-9)
        assert r["trend"] == pytest.approx(eb, abs=1e-9)


def test_holt_shard_count_invariance(spark):
    from rpa_etl_investing_spark.operators.recurrence import holt

    df = _holt_series(spark, n_keys=2, n=50)
    one = {
        (r["k"], r["ord"]): (r["level"], r["trend"])
        for r in holt(
            with_id_range_shard(df, "ord", n_shards=1), ["k"], "ord", "x", 0.25, 0.5
        ).collect()
    }
    many = holt(
        with_id_range_shard(df, "ord", n_shards=7), ["k"], "ord", "x", 0.25, 0.5
    ).collect()
    assert len(many) == len(one)
    for r in many:
        el, eb = one[(r["k"], r["ord"])]
        assert r["level"] == pytest.approx(el, abs=1e-9)
        assert r["trend"] == pytest.approx(eb, abs=1e-9)


def test_affine2_plan_has_no_window_and_no_python(spark):
    from rpa_etl_investing_spark.operators.recurrence import holt

    df = _holt_series(spark)
    sharded = with_id_range_shard(df, "ord", n_shards=5)
    plan = (
        holt(sharded, ["k"], "ord", "x", 0.25, 0.5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "_lr_shard" in plan
