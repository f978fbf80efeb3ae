"""Plan-string rendering must be bounded on ANY session (r9 item #1).

The r8 judge reproduced a driver OOM in the 8-thread full-registry
sweep: ``graph_kcore``'s 4-round unrolled peel plan was stringified by
``QueryExecution.explainString`` (the SQL listener renders the full
formatted plan for every action) on a bare 1g heap while seven other
heavy queries ran — ``java.lang.OutOfMemoryError`` inside
``TreeNode.generateTreeString``. Plan strings are diagnostics, not
results, so ``catalog.tbl()`` now pins ``spark.sql.maxPlanStringLength``
on whatever session the caller hands in (the driver's is bare), making
the per-query diagnostic allocation O(1) however deeply an iterative
algorithm unrolled its lineage.
"""

from __future__ import annotations

import pytest

from rpa_etl_investing_spark.catalog import MAX_PLAN_STRING_LENGTH, tbl


def _explain_len(df) -> int:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return len(df._jdf.queryExecution().explainString(mode))


def test_tbl_pins_plan_string_cap(spark, sf_dir):
    """Any scan through the catalog must (re)pin the cap — the driver's
    session starts with Spark's ~2 GiB default."""
    spark.conf.unset("spark.sql.maxPlanStringLength")
    tbl(spark, sf_dir, "lineitem")
    assert spark.conf.get("spark.sql.maxPlanStringLength") == str(
        MAX_PLAN_STRING_LENGTH
    )


@pytest.mark.slow
def test_kcore_plan_string_bounded(spark, sf_dir):
    """The exact r8 OOM shape: build the unrolled k-core peel plan and
    render its formatted string; it must come back truncated within the
    cap (plus the truncation marker), not grow with unroll depth."""
    from rpa_etl_investing_spark.plans import QUERIES

    df = QUERIES["graph_kcore"].fn(spark, sf_dir)
    n = _explain_len(df)
    # small slack: Spark appends a "... N more characters" marker
    assert n <= MAX_PLAN_STRING_LENGTH + 256, (
        f"kcore plan string {n} chars exceeds cap {MAX_PLAN_STRING_LENGTH}"
    )
