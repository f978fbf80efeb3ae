"""Central query registry.

Every operator from SURVEY.md §2 lands here as a named query: a Spark
callable ``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible)
an equivalent ANSI-SQL oracle string for DuckDB. ``__spark_entry__.py``
exposes this registry to the driver's correctness harness.

Oracle-parity rules (SURVEY §5, §7.4):
- alias every computed column identically in Spark and SQL;
- double-typed aggregates go through exact DECIMAL accumulation and are
  cast to DOUBLE at the end, so sum order can't change the bits;
- averages are written as sum/count in both engines (engines' native
  AVG differ in intermediate typing);
- no nondeterministic expressions; top-k always has a total-order
  tie-breaker.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB-runnable ANSI SQL; None → rows-only check
    doc: str


QUERIES: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QueryDef(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in QUERIES.items()}


def all_oracles() -> dict[str, str]:
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
