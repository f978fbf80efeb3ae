"""Round-6 operator contracts: damped-Holt's reduction property and
the null-safe join's physical plan class."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_holt_damped_phi1_reduces_to_holt(spark):
    """φ = 1 must make holt_damped bit-identical to holt — the damped
    matrix degenerates to the undamped one, so any divergence means
    the matrix algebra is wrong."""
    from rpa_etl_investing_spark.operators.prefix import with_id_range_shard
    from rpa_etl_investing_spark.operators.recurrence import holt, holt_damped

    rows = [("a", i, float(v)) for i, v in enumerate([10, 12, 9, 15, 11, 14, 8, 13])]
    df = with_id_range_shard(
        spark.createDataFrame(rows, ["k", "ord", "x"]), "ord", n_shards=3
    )
    plain = {
        r["ord"]: (r["level"], r["trend"])
        for r in holt(df, ["k"], "ord", "x", alpha=0.25, beta=0.5).collect()
    }
    damped = {
        r["ord"]: (r["level"], r["trend"])
        for r in holt_damped(
            df, ["k"], "ord", "x", alpha=0.25, beta=0.5, phi=1.0
        ).collect()
    }
    assert plain == damped


def test_holt_damped_trend_decays_toward_zero(spark):
    """With a constant series after a jump, the damped trend must decay
    geometrically (|b_t| shrinking), which undamped Holt also does but
    the damped forecast l + φ·b must sit strictly between level and
    the undamped forecast l + b when b > 0."""
    from rpa_etl_investing_spark.operators.prefix import with_id_range_shard
    from rpa_etl_investing_spark.operators.recurrence import holt_damped

    rows = [("a", i, 100.0 if i else 0.0) for i in range(10)]
    df = with_id_range_shard(
        spark.createDataFrame(rows, ["k", "ord", "x"]), "ord", n_shards=2
    )
    out = sorted(
        holt_damped(df, ["k"], "ord", "x", alpha=0.25, beta=0.5, phi=0.875)
        .collect(),
        key=lambda r: r["ord"],
    )
    trends = [abs(r["trend"]) for r in out[3:]]
    assert all(b2 < b1 for b1, b2 in zip(trends, trends[1:]))


def test_null_safe_join_stays_hash_join(spark, sf_dir):
    """EqualNullSafe must remain an equi-join key: the physical plan
    for the registered query contains a hash join and NO
    BroadcastNestedLoopJoin (the plan class a non-equi predicate would
    force)."""
    from rpa_etl_investing_spark.plans.registry import QUERIES

    df = QUERIES["join_null_safe_equality"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan) or (
        "ShuffledHashJoin" in plan
    )
