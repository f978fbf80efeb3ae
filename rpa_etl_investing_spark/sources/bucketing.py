"""Bucketed tables — co-located joins without a per-query shuffle
(SURVEY §2.1 S8 / §2.3 J6 scale path).

A fact-to-fact equi-join (e.g. ``lineitem ⋈ orders`` on orderkey)
shuffles both sides on every query. Bucketing pays that shuffle once at
write time: both tables are written ``bucketBy(n, key)``, so their
files are already hash-partitioned on the join key and Spark plans a
SortMergeJoin with **no Exchange on either side** (asserted in
tests/test_bucketing.py). At 100 TB this converts the dominant
recurring join cost into a one-time layout cost — the same trade the
reference makes by keying its fact table on dimension ids at load time
(``/root/reference/main.py:139-140``).

Bucketed tables live in the session's ``spark.sql.warehouse.dir`` via
``saveAsTable`` (bucket metadata needs the catalog; a plain
``.parquet(path)`` write cannot record it).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Materialize ``df`` as a bucketed (and optionally sorted) table.
    Sorting within buckets lets the join skip its per-task sort too.

    With ``path`` the table is EXTERNAL at that location — bucket
    metadata still lands in the catalog (bucketBy requires saveAsTable)
    but the files live where the caller says, independent of the
    session's warehouse dir (a bare driver session points its warehouse
    at the process cwd, which this repo must not assume is writable).
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a previous run may have left the location behind without a
    # catalog entry; saveAsTable refuses to reuse it
    if path is None:
        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        loc = os.path.join(warehouse.removeprefix("file:"), table.lower())
    else:
        loc = path
    if os.path.exists(loc):
        shutil.rmtree(loc)
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key — planned without
    any Exchange when bucket counts match."""
    return spark.table(left_table).join(spark.table(right_table), on)
