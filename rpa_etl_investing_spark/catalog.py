"""Parquet table registry over a scale-factor directory.

The driver pre-generates read-only parquet tables at
``/root/testdata/sf{0.001,0.01,0.1}/<name>.parquet`` (TESTDATA.md).
This module is the engine's scan layer (SURVEY §2.1 S5/S8): plain
``spark.read.parquet`` so Catalyst gets predicate pushdown, column
pruning and partition-level parallelism for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Dimension-sized tables: always broadcast-joinable at any scale factor
# (region/nation are fixed-size; supplier/part/customer grow slowly).
SMALL_DIMS = {"region", "nation", "supplier"}


def tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects; with ``spark.sql.legacy.parquet.nanosAsLong``
    (set in session.py) it arrives as nanos-since-epoch and is converted
    here to a microsecond TimestampType (truncation — matching DuckDB's
    ``CAST(ts AS TIMESTAMP)``).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register the fixture tables as temp views for ``spark.sql`` queries."""
    for name in names or TABLES:
        tbl(spark, sf_dir, name).createOrReplaceTempView(name)
