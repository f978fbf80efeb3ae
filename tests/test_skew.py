"""Salted-join equivalence + balance property."""

from __future__ import annotations

from pyspark.sql import functions as F

from rpa_etl_investing_spark.catalog import tbl
from rpa_etl_investing_spark.operators.skew import (
    SALT_COL,
    salt_large_side,
    salted_join,
)


def test_salted_join_equals_plain_join(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"), "l_quantity"
    )
    od = tbl(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), "o_orderstatus"
    )
    got = salted_join(li, od, ["k"], n_salts=4)
    want = li.join(od, ["k"])
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_salt_spreads_a_hot_key(spark, sf_dir):
    # a synthetic 100%-skewed input: every row has the same join key
    hot = (
        tbl(spark, sf_dir, "lineitem")
        .select(F.lit(1).alias("k"), "l_quantity", "l_orderkey", "l_linenumber")
    )
    salted = salt_large_side(hot, 8)
    n_salts_seen = salted.select(SALT_COL).distinct().count()
    assert n_salts_seen == 8  # the single hot key now spans 8 sub-keys


def test_salt_is_deterministic(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem").limit(100)
    a = {tuple(r) for r in salt_large_side(li, 8).collect()}
    b = {tuple(r) for r in salt_large_side(li, 8).collect()}
    assert a == b


def test_salted_join_rejects_small_side_preserving_types(spark):
    """Right/full outer would emit an unmatched small-side row once per
    salt — the operator must refuse rather than silently multiply."""
    import pytest

    from rpa_etl_investing_spark.operators.skew import salted_join

    big = spark.createDataFrame([(1, "x")], "k bigint, v string")
    small = spark.createDataFrame([(2, "y")], "k bigint, w string")
    for how in ("right", "full", "outer", "full_outer", "right_outer"):
        with pytest.raises(ValueError):
            salted_join(big, small, ["k"], how=how)
    # the preserved-large forms remain accepted and exact
    assert salted_join(big, small, ["k"], how="left").count() == 1
    assert salted_join(big, small, ["k"], how="inner").count() == 0
