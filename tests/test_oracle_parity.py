"""Every registry query must match its DuckDB oracle (the driver's gate)."""

from __future__ import annotations

import pytest

import rpa_etl_investing_spark.plans as plans
from tests.parity import run_compare

ALL_NAMES = sorted(plans.QUERIES)


@pytest.mark.parametrize("name", ALL_NAMES)
def test_query_matches_oracle(spark, sf_dir, name):
    q = plans.QUERIES[name]
    if q.oracle is None:
        # rows-only check: must run and return a stable schema
        df = q.fn(spark, sf_dir)
        assert df.columns, f"{name}: empty schema"
        assert df.count() >= 0
        return
    problems = run_compare(spark, name, sf_dir)
    assert not problems, f"{name}: " + "; ".join(problems)
