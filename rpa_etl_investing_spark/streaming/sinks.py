"""Idempotent foreachBatch sink (SURVEY §2.9): the exactly-once
pattern for sinks Structured Streaming can't transact against.

``foreachBatch`` hands the writer a (batch DataFrame, batch_id) pair;
Spark guarantees batch_id is stable across failure/replay of the same
epoch. Writing each batch's rows to a partition directory NAMED by
batch_id makes the write idempotent — a replayed batch overwrites its
own partition instead of appending a duplicate — which upgrades
at-least-once delivery to effectively-once without sink transactions
(the same journaling trick a JDBC/Kafka sink would use with a
``batch_id`` dedup column; see sources/jdbc.py for the relational
sink itself).

The journal is compacted on read: latest batch_id wins per key. At
100 TB the journal is append-cheap (update mode emits only keys that
changed in the batch), compaction is one window over (key) — and a
periodic rewrite job can fold old partitions into a base snapshot
without stopping the stream (standard lambda-compaction; out of scope
here).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def journal_upsert_sink(
    agg: DataFrame, sink_dir: str, checkpoint_dir: str
):
    """Start an update-mode stream writing each batch's changed rows to
    ``sink_dir/batch_id=N`` (overwrite ⇒ replay-idempotent)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(sink_dir, f"batch_id={batch_id}")
        )

    return (
        agg.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write_batch)
        .start()
    )


def compact_journal(
    spark: SparkSession, sink_dir: str, key_cols: list[str]
) -> DataFrame:
    """Materialized view over the journal: latest batch per key."""
    df = spark.read.parquet(sink_dir)  # partition discovery adds batch_id
    w = Window.partitionBy(*key_cols).orderBy(F.desc("batch_id"))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "batch_id")
    )
