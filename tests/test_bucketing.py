"""Bucketed co-located join: the per-query shuffle disappears."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from rpa_etl_investing_spark.catalog import tbl
from rpa_etl_investing_spark.sources.bucketing import bucketed_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    li = tbl(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )
    od = tbl(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderdate", "o_totalprice"
    )
    write_bucketed(li, "b_lineitem", ["l_orderkey"], n_buckets=8, sort_cols=["l_orderkey"])
    write_bucketed(od, "b_orders", ["l_orderkey"], n_buckets=8, sort_cols=["l_orderkey"])
    yield "b_lineitem", "b_orders"


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    # disable auto-broadcast: at fixture scale the optimizer would just
    # broadcast the small side, which is exactly what is NOT available
    # at fact-to-fact scale — the scenario bucketing exists for
    lt, rt = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, lt, rt, ["l_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan
    assert "Bucketed: true" in plan, plan


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    got = (
        bucketed_join(spark, lt, rt, ["l_orderkey"])
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("n"))
    )
    li = tbl(spark, sf_dir, "lineitem")
    od = tbl(spark, sf_dir, "orders")
    want = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("n"))
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
