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

**Postgres dialect delta** (the reference's actual sink is Postgres via
SQLAlchemy, ``main.py:15-18``; the sandbox ships Postgres *server*
binaries but no JDBC driver jar, so the Derby tests pin the *shared*
JDBC behavior, tests/test_postgres_live.py pins the live-Postgres
behavior through the wire-protocol sink in sources/pgwire.py, and this
note pins the dialect rest):

- Type mapping (Spark ``JdbcDialect``): StringType → Derby ``CLOB`` vs
  Postgres ``TEXT``; DoubleType → ``DOUBLE`` vs ``DOUBLE PRECISION``;
  TimestampType → ``TIMESTAMP`` in both, but Postgres stores microseconds
  UTC while Derby keeps nanos — round-trips at micro precision either way.
  BooleanType → Derby ``BOOLEAN`` (10.7+) vs Postgres ``BOOLEAN``; binary →
  Derby ``BLOB`` vs Postgres ``BYTEA``.
- Identifier quoting is ``"`` in both; Derby upper-cases unquoted names,
  Postgres lower-cases them — ``PARITY_*`` table names in the tests are
  spelled unquoted so either normalization works.
- Postgres-only knobs worth setting in production (no Derby equivalent):
  ``stringtype=unspecified`` on the url (lets VARCHAR bind to enum/json
  columns), ``reWriteBatchedInserts=true`` (turns the ``batchsize`` batch
  into one multi-row INSERT — the true set-based analogue of the
  reference's per-row commit), and ``truncate=true`` on overwrite so the
  table's grants/indexes survive.
- Isolation default is READ_COMMITTED in both (Spark sets it per
  connection via ``isolationLevel``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DERBY_MEM_URL = "jdbc:derby:memory:{name};create=true"
DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"

# What a production run against the reference's Postgres would pass:
# write_jdbc(df, POSTGRES_URL_TEMPLATE.format(...), table,
#            POSTGRES_DRIVER) — same code path, different dialect plugin.
POSTGRES_URL_TEMPLATE = (
    "jdbc:postgresql://{host}:{port}/{db}"
    "?reWriteBatchedInserts=true&stringtype=unspecified"
)
POSTGRES_DRIVER = "org.postgresql.Driver"


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
