"""rpa_etl_investing_spark — a PySpark-native analytics engine.

Brand-new implementation (not a port) of the query and data-processing
capabilities of the reference ETL pipeline ``vitoriarntrindade/rpa-etl-investing``
(``/root/reference/main.py``), re-expressed Spark-first:

- everything is declarative DataFrame / SQL so Catalyst handles predicate
  pushdown, column pruning, broadcast-join selection and AQE re-planning;
- the reference's row-at-a-time ETL (``main.py:122-147``) becomes set-based
  batch transforms (``etl/``);
- the reference's single analytic query (``main.py:149-157``) seeds a full
  relational operator surface (``plans/``), plus streaming (``streaming/``)
  and LLM-data-pipeline operators (``operators/``) per SURVEY.md §2.
"""

from rpa_etl_investing_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark"]
