"""Query plans — importing this package populates the registry."""

from rpa_etl_investing_spark.plans import (  # noqa: F401
    advanced,
    aggregates,
    analytics,
    curation_queries,
    etl_queries,
    llm_queries,
    multimodal_queries,
    relational,
    scalar_functions,
    source_queries,
    streaming_queries,
    subqueries,
    timeseries,
    udf_surface,
    windows,
)
from rpa_etl_investing_spark.plans.registry import QUERIES, all_oracles, all_queries

__all__ = ["QUERIES", "all_queries", "all_oracles"]
