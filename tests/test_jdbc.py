"""JDBC round-trip against embedded Derby (the reference's PostgreSQL
path, S4/S5, with a bundled database standing in)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rpa_etl_investing_spark.catalog import tbl
from rpa_etl_investing_spark.sources.jdbc import (
    DERBY_DRIVER,
    DERBY_MEM_URL,
    read_jdbc,
    write_jdbc,
)


def test_jdbc_roundtrip_preserves_values(spark, sf_dir):
    url = DERBY_MEM_URL.format(name="t_roundtrip")
    nation = tbl(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    write_jdbc(nation, url, "nation_t", DERBY_DRIVER)
    back = read_jdbc(spark, url, "nation_t", DERBY_DRIVER)
    # Derby uppercases identifiers; normalize for comparison
    back = back.toDF(*[c.lower() for c in back.columns])
    assert back.count() == nation.count()
    assert back.exceptAll(nation).count() == 0
    assert nation.exceptAll(back).count() == 0


def test_jdbc_dialect_assumptions(spark, sf_dir):
    """Names the dialect contract the engine relies on (sources/jdbc.py
    module doc): identifier case is normalized per-dialect (Derby upper,
    Postgres lower — so the code never depends on case), strings/doubles/
    timestamps round-trip exactly, and timestamps keep at least micro
    precision. Runs on Derby; the Postgres deltas that CAN'T be exercised
    without a server (TEXT vs CLOB, reWriteBatchedInserts, stringtype)
    are documented next to POSTGRES_URL_TEMPLATE."""
    import datetime as dt

    url = DERBY_MEM_URL.format(name="t_dialect")
    df = spark.createDataFrame(
        [(1, "héllo wörld", 1.5, dt.datetime(2026, 1, 2, 3, 4, 5, 123456))],
        "id bigint, s string, d double, ts timestamp",
    )
    write_jdbc(df, url, "dialect_t", DERBY_DRIVER)
    back = read_jdbc(spark, url, "dialect_t", DERBY_DRIVER)
    # identifier-case normalization is the caller's job in BOTH dialects
    assert [c.lower() for c in back.columns] == ["id", "s", "d", "ts"]
    row = back.toDF(*[c.lower() for c in back.columns]).collect()[0]
    assert row.s == "héllo wörld"  # CLOB/TEXT round-trip incl. non-ASCII
    assert row.d == 1.5  # DOUBLE vs DOUBLE PRECISION: IEEE bits survive
    assert row.ts.microsecond == 123456  # micro precision floor (both)


def test_jdbc_partitioned_read_fans_out(spark, sf_dir):
    url = DERBY_MEM_URL.format(name="t_fanout")
    orders = tbl(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    write_jdbc(orders, url, "orders_t", DERBY_DRIVER)
    bounds = orders.agg(
        F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi")
    ).collect()[0]
    back = read_jdbc(
        spark,
        url,
        "orders_t",
        DERBY_DRIVER,
        partition_col="o_orderkey",
        lower_bound=int(bounds.lo),
        upper_bound=int(bounds.hi) + 1,
        num_partitions=4,
    )
    assert back.rdd.getNumPartitions() == 4  # range-bounded parallel scan
    assert back.count() == orders.count()


def test_jdbc_live_postgres_roundtrip(spark, sf_dir):
    """Optional live-Postgres parity run (r3 verdict stretch #9): set
    SPARK_GRAFT_PG_URL (e.g. jdbc:postgresql://localhost:5432/test
    ?user=...&password=...) to exercise the real dialect — TEXT vs CLOB,
    reWriteBatchedInserts, lower-case identifier folding. Skipped when no
    server/driver is reachable (this sandbox has neither); the shared
    JDBC behavior stays pinned by the Derby tests above."""
    import os

    import pytest

    from rpa_etl_investing_spark.sources.jdbc import POSTGRES_DRIVER

    url = os.environ.get("SPARK_GRAFT_PG_URL")
    if not url:
        pytest.skip("SPARK_GRAFT_PG_URL not set; no live Postgres to test")
    try:
        spark._jvm.java.lang.Class.forName(POSTGRES_DRIVER)
    except Exception:
        pytest.skip("Postgres JDBC driver not on the Spark classpath")

    nation = tbl(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    write_jdbc(nation, url, "parity_nation_pg", POSTGRES_DRIVER)
    back = read_jdbc(spark, url, "parity_nation_pg", POSTGRES_DRIVER)
    back = back.toDF(*[c.lower() for c in back.columns])
    assert back.count() == nation.count()
    assert back.exceptAll(nation).count() == 0
    assert nation.exceptAll(back).count() == 0
