"""Query plans — importing this package populates the registry."""

from rpa_etl_investing_spark.plans import (  # noqa: F401
    aggregates,
    etl_queries,
    llm_queries,
    relational,
    scalar_functions,
    streaming_queries,
    windows,
)
from rpa_etl_investing_spark.plans.registry import QUERIES, all_oracles, all_queries

__all__ = ["QUERIES", "all_queries", "all_oracles"]
