"""Structured Streaming demo (SURVEY §2.9): the SAME window logic that
the oracle checks in batch runs under readStream with a watermark and
produces identical results."""

from __future__ import annotations

from pyspark.sql import functions as F

from rpa_etl_investing_spark.catalog import tbl
from rpa_etl_investing_spark.streaming import tumbling_window_counts


def test_streaming_tumbling_matches_batch(spark, sf_dir, tmp_path):
    batch_events = tbl(spark, sf_dir, "events")
    expected = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in tumbling_window_counts(batch_events).collect()
    }

    # the file-stream source wants a directory; expose the fixture file
    # through one. ts arrives as nanos-long (see catalog.tbl), convert
    # identically.
    stream_dir = tmp_path / "events_stream"
    stream_dir.mkdir()
    (stream_dir / "events.parquet").symlink_to(f"{sf_dir}/events.parquet")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .parquet(str(stream_dir))
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        .withWatermark("ts", "1 hour")
    )
    q = (
        tumbling_window_counts(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("tumbling_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
            for r in spark.sql("SELECT * FROM tumbling_out").collect()
        }
    finally:
        q.stop()
    assert got == expected
