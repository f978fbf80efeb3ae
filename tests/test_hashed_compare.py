"""Size-gated in-engine checksum comparator (r9, verdict item #6).

Above the row gate the sweep compares COUNT(*) plus two independent
56-bit md5-slice sums computed in BOTH engines over a canonically
spelled row string, instead of materializing oversized results to
pandas twice (the r8 sf1 pass spent 874 s on ONE 24M-row round-trip).
These tests force the gate low so the hashed path runs on fixture-scale
queries whose exact-path verdict is known, proving the two paths agree
in BOTH directions: a true match hashes equal, and a planted value /
row-count difference is caught.
"""

from __future__ import annotations

import rpa_etl_investing_spark.plans as plans
from tests.parity import duck_connection, hashed_compare

# exact-path-green queries covering the canonical spelling table:
# bigint/string/decimal-exit-double (unpivot), pure bigint (exact dedup
# groups via curation), double ratio (classifier auc is 1 row — skip),
# date/timestamp columns (ohlc has ts buckets)
CASES = [
    "unpivot_fact_measures",
    "agg_pricing_summary",
    "agg_having",
    # NULL doubles at window partition edges (DuckDB concat treats NULL
    # as '' — the null sentinel must still win) + timestamp_ntz spelling
    "window_lag_lead",
    "datetime_funcs",
]


def test_hashed_path_matches_where_exact_path_matches(spark, sf_dir):
    con = duck_connection(sf_dir)
    try:
        for name in CASES:
            q = plans.QUERIES[name]
            df = q.fn(spark, sf_dir)
            problems = hashed_compare(df, con, q.oracle, gate_rows=1)
            assert problems is not None, f"{name}: hashed path not taken"
            assert problems == [], f"{name}: {problems}"
    finally:
        con.close()


def test_hashed_path_catches_planted_value_difference(spark, sf_dir):
    q = plans.QUERIES["agg_having"]
    df = q.fn(spark, sf_dir)
    con = duck_connection(sf_dir)
    try:
        # same row count, one value off by one: only the checksums differ
        wrong = f"""
        SELECT o_custkey, spend,
               CASE WHEN ROW_NUMBER() OVER (ORDER BY o_custkey) = 1
                    THEN n_orders + 1 ELSE n_orders END AS n_orders
        FROM ({q.oracle})
        """
        problems = hashed_compare(df, con, wrong, gate_rows=1)
        assert problems, "planted value difference not caught"
        assert any("checksum" in p for p in problems), problems
        # dropped row: caught by the count leg
        fewer = f"SELECT * FROM ({q.oracle}) LIMIT 5"
        problems = hashed_compare(df, con, fewer, gate_rows=1)
        assert problems and any("row count" in p for p in problems), problems
    finally:
        con.close()


def test_hashed_path_declines_below_gate_and_on_exotic_types(spark, sf_dir):
    con = duck_connection(sf_dir)
    try:
        q = plans.QUERIES["agg_having"]
        df = q.fn(spark, sf_dir)
        # below the gate: decline (exact path owns it)
        assert hashed_compare(df, con, q.oracle, gate_rows=10**9) is None
        # exotic output type (struct column): decline
        st = spark.range(3).selectExpr("named_struct('a', id) AS s")
        assert hashed_compare(st, con, "SELECT 1", gate_rows=1) is None
    finally:
        con.close()


def test_hashed_path_supports_array_columns(spark, sf_dir):
    """r9 verdict item #6: array columns take the element-joined
    canonical spelling, so embedding-style outputs (array<double> /
    array<bigint>) can ride the hashed path. Doubles round-trip
    bit-stable through the 2^52 floor decomposition per element; NULL
    elements, NULL arrays, and the ['']-vs-[] ambiguity are all
    disambiguated."""
    con = duck_connection(sf_dir)
    try:
        df = spark.sql("""
            SELECT * FROM VALUES
              (1L, array(0.1D, 2.5D, -3.75D),   array(1L, 2L)),
              (2L, array(1e-30D, 12345.6789D),  array(CAST(NULL AS BIGINT))),
              (3L, CAST(NULL AS ARRAY<DOUBLE>), array()),
              (4L, array(CAST('NaN' AS DOUBLE), CAST(NULL AS DOUBLE)), array(7L))
            AS t(id, emb, ks)
        """)
        oracle = """
            SELECT * FROM (VALUES
              (CAST(1 AS BIGINT), [0.1, 2.5, -3.75], [1, 2]),
              (2, [1e-30, 12345.6789], [CAST(NULL AS BIGINT)]),
              (3, CAST(NULL AS DOUBLE[]), CAST([] AS BIGINT[])),
              (4, ['NaN'::DOUBLE, NULL], [7])) t(id, emb, ks)
        """
        problems = hashed_compare(df, con, oracle, gate_rows=1)
        assert problems is not None, "array path not taken"
        assert problems == [], problems
        # a one-element value difference in the array must be caught
        wrong = oracle.replace("[1, 2]", "[1, 3]")
        problems = hashed_compare(df, con, wrong, gate_rows=1)
        assert problems and any("checksum" in p for p in problems), problems
    finally:
        con.close()
