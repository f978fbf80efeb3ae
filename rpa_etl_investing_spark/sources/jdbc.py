"""JDBC source/sink (SURVEY §2.1 S4/S5 — literal parity with the
reference's PostgreSQL load path, ``/root/reference/main.py:15-18,
122-147``).

The reference inserts row-at-a-time with a commit per row; the Spark
sink writes each partition as one batched transaction over one
connection (``batchsize`` rows per round trip), and the source reads
with predicate pushdown into the remote database.

Scale notes baked into the defaults:
- **Sink**: parallelism = input partitions (one connection each) —
  ``df.repartition(n)`` first to match what the database can absorb;
  ``batchsize`` keeps round trips off the per-row path the reference
  took.
- **Source**: a naive ``spark.read.jdbc(table)`` is a SINGLE-connection
  scan; pass ``partition_col``/``bounds``/``num_partitions`` so the read
  fans out as range-bounded queries (the JDBC analogue of input splits).

Tested against Derby embedded in-memory (bundled with Spark for the
Hive metastore) — the same code path as PostgreSQL with a different
``url``/``driver``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DERBY_MEM_URL = "jdbc:derby:memory:{name};create=true"
DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    driver: str,
    mode: str = "overwrite",
    batchsize: int = 1000,
) -> None:
    """Batched JDBC append/overwrite — the set-based replacement for the
    reference's per-row ``session.commit()`` (``main.py:147``)."""
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .option("batchsize", str(batchsize))
        .mode(mode)
        .save()
    )


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str,
    partition_col: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """JDBC scan; with ``partition_col`` + bounds the read issues
    ``num_partitions`` range-bounded queries in parallel instead of one
    full-table cursor."""
    r = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
    )
    if partition_col is not None:
        r = (
            r.option("partitionColumn", partition_col)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 4))
        )
    return r.load()
