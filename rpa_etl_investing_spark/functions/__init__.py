"""Engine scalar-function library (SURVEY §2.8).

All functions are built-in Column expressions — no Python UDFs — so
they stay inside Catalyst/WholeStageCodegen (SURVEY §2.11 design rule).
"""

from rpa_etl_investing_spark.functions.locale import (
    parse_brazilian_number,
    parse_percent_variation,
)

__all__ = ["parse_brazilian_number", "parse_percent_variation"]
