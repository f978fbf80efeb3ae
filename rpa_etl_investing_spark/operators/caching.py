"""Retire-previous persist registry — bounded caching for operators
whose returned LAZY DataFrame references an intermediate relation more
than once.

The DataFrame API gives every branch fresh expression ids, so
Catalyst's ReusedExchange (canonical equality) only catches some of
the duplication: a query composed of two sharded scans over one
aggregated series re-expands the series' aggregation subtree — and its
raw fact scan — into every branch (measured: 19 live parquet scans in
the un-persisted CUSUM plan). Persisting the SMALL aggregated relation
collapses all branches onto one cached copy.

Lifecycle is the same problem operators/graph.py solved for the
pagerank edge list: the returned DataFrame is lazy, so the producing
function cannot unpersist before returning. Each ``keep()`` therefore
retires every previously kept relation, bounding the live-cache count
at one per call site no matter how many times tests/bench re-invoke a
query; callers that are completely done can ``release_kept()``.

Only relations whose size is decoupled from (or heavily reduced from)
the fact — daily series, per-key counts, aggregated graphs — belong
here. Raw-fact-sized projections stay unpersisted: rescanning a pruned
parquet projection is cheaper at 100 TB than caching it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_KEPT: list[DataFrame] = []


def keep(df: DataFrame) -> DataFrame:
    """Persist ``df`` (MEMORY_AND_DISK), retiring previously kept
    relations first. Returns ``df`` for chaining."""
    release_kept()
    df.persist()
    _KEPT.append(df)
    return df


def release_kept() -> None:
    """Unpersist every relation kept by prior :func:`keep` calls. Only
    call once previously returned DataFrames have been consumed."""
    while _KEPT:
        _KEPT.pop().unpersist()
