"""Structured Streaming demo (SURVEY §2.9): the SAME window logic that
the oracle checks in batch runs under readStream with a watermark and
produces identical results."""

from __future__ import annotations

from pyspark.sql import functions as F

from rpa_etl_investing_spark.catalog import normalize_events_ts, tbl
from rpa_etl_investing_spark.streaming import running_user_totals, tumbling_window_counts


def _stream_events(spark, raw_schema, stream_dir):
    """File-stream over the events fixture, ts normalized to a
    watermark-compatible TIMESTAMP (watermarks reject TIMESTAMP_NTZ; the
    session timezone is UTC, so the LTZ cast preserves wall time against
    the batch side)."""
    return normalize_events_ts(
        spark.readStream.schema(raw_schema).parquet(str(stream_dir))
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_streaming_tumbling_matches_batch(spark, sf_dir, tmp_path):
    batch_events = tbl(spark, sf_dir, "events")
    expected = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in tumbling_window_counts(batch_events).collect()
    }

    # the file-stream source wants a directory; expose the fixture file
    # through one. ts arrives as nanos-long or a native timestamp
    # depending on the fixture layout (see catalog.normalize_events_ts).
    stream_dir = tmp_path / "events_stream"
    stream_dir.mkdir()
    (stream_dir / "events.parquet").symlink_to(f"{sf_dir}/events.parquet")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = _stream_events(spark, raw_schema, stream_dir).withWatermark(
        "ts", "1 hour"
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


def test_streaming_session_window_matches_batch_sf01(spark, tmp_path):
    """ST3 under a real stream, at the bench scale factor (r2 verdict
    stretch #8): session windows (30-min gap per user) computed by
    ``session_window`` under readStream + watermark must equal the batch
    sessionize over the same sf0.1 events — the merge-as-events-arrive
    state machine converges to the batch answer."""
    from rpa_etl_investing_spark.streaming import sessionize

    sf_dir = "/root/testdata/sf0.1"
    batch_events = tbl(spark, sf_dir, "events")
    expected = {
        (r["user_id"], r["session_start"]): (
            r["session_end"],
            r["n_events"],
            r["first_event_id"],
        )
        for r in sessionize(batch_events).collect()
    }
    assert expected  # sf0.1 must actually produce sessions

    stream_dir = tmp_path / "events_session_stream"
    stream_dir.mkdir()
    (stream_dir / "events.parquet").symlink_to(f"{sf_dir}/events.parquet")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = _stream_events(spark, raw_schema, stream_dir).withWatermark(
        "ts", "1 hour"
    )
    q = (
        sessionize(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("session_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["user_id"], r["session_start"]): (
                r["session_end"],
                r["n_events"],
                r["first_event_id"],
            )
            for r in spark.sql("SELECT * FROM session_out").collect()
        }
    finally:
        q.stop()
    assert got == expected


def test_stateful_running_totals_matches_batch(spark, sf_dir, tmp_path):
    """ST6: applyInPandasWithState — final per-user state equals the
    batch aggregate."""
    batch_events = tbl(spark, sf_dir, "events")
    expected = {
        r["user_id"]: (r["n"], r["total"])
        for r in batch_events.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }

    stream_dir = tmp_path / "events_state_stream"
    stream_dir.mkdir()
    (stream_dir / "events.parquet").symlink_to(f"{sf_dir}/events.parquet")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = normalize_events_ts(
        spark.readStream.schema(raw_schema).parquet(str(stream_dir))
    )
    q = (
        running_user_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_out")
        .start()
    )
    try:
        q.processAllAvailable()
        # update mode emits one row per (user, micro-batch); the final
        # emission per user is the completed running total
        rows = spark.sql(
            """
            SELECT user_id, n_events, total_value FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                           ORDER BY n_events DESC) AS rn
              FROM stateful_out) WHERE rn = 1
            """
        ).collect()
        got = {r["user_id"]: (r["n_events"], r["total_value"]) for r in rows}
    finally:
        q.stop()
    assert set(got) == set(expected)
    for uid, (n, total) in expected.items():
        gn, gtotal = got[uid]
        assert gn == n
        assert abs(gtotal - total) < 1e-6 * max(1.0, abs(total))


def test_stream_stream_interval_join_matches_batch(spark, sf_dir, tmp_path):
    """Stream-stream join: clicks ⋈ purchases per user within 30 min,
    watermarked both sides; result equals the batch interval join."""

    from rpa_etl_investing_spark.streaming import interval_join

    def batch_side(etype):
        return (
            tbl(spark, sf_dir, "events")
            .filter(F.col("event_type") == etype)
            .select("event_id", "user_id", "ts")
        )

    expected = {
        (r.event_id, r.p_event_id)
        for r in interval_join(
            batch_side("click"), batch_side("purchase"),
            upper="30 minutes", right_prefix="p_",
        ).collect()
    }

    stream_dir = tmp_path / "ss_events"
    stream_dir.mkdir()
    (stream_dir / "events.parquet").symlink_to(f"{sf_dir}/events.parquet")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema

    def stream_side(etype):
        return (
            _stream_events(spark, raw_schema, stream_dir)
            .filter(F.col("event_type") == etype)
            .select("event_id", "user_id", "ts")
            .withWatermark("ts", "1 hour")
        )

    q = (
        interval_join(
            stream_side("click"), stream_side("purchase"),
            upper="30 minutes", right_prefix="p_",
        )
        .select("event_id", "p_event_id")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_join_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.event_id, r.p_event_id)
            for r in spark.sql("SELECT * FROM ss_join_out").collect()
        }
    finally:
        q.stop()
    assert got == expected


def test_streaming_ohlc_resample_matches_batch_sf01(spark, tmp_path):
    """The investing-domain counterpart of the session-window stretch
    (r3 verdict stretch #8): the one-pass struct-min/max OHLC resample
    run under readStream must equal the batch form at the bench scale
    factor — open/close/high/low/volume are all commutative merge
    state, so the streaming aggregate converges to the batch answer
    regardless of arrival order."""
    from rpa_etl_investing_spark.plans.timeseries import ohlc_resample

    sf_dir = "/root/testdata/sf0.1"
    batch_events = tbl(spark, sf_dir, "events")
    expected = {
        (r["user_id"], r["bucket"]): (
            r["open"], r["high"], r["low"], r["close"], r["n_trades"], r["volume"]
        )
        for r in ohlc_resample(batch_events).collect()
    }
    assert expected  # sf0.1 must actually produce buckets

    stream_dir = tmp_path / "events_ohlc_stream"
    stream_dir.mkdir()
    (stream_dir / "events.parquet").symlink_to(f"{sf_dir}/events.parquet")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = _stream_events(spark, raw_schema, stream_dir).withWatermark(
        "ts", "1 hour"
    )
    q = (
        ohlc_resample(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("ohlc_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["user_id"], r["bucket"]): (
                r["open"], r["high"], r["low"], r["close"], r["n_trades"], r["volume"]
            )
            for r in spark.sql("SELECT * FROM ohlc_out").collect()
        }
    finally:
        q.stop()
    assert got == expected


def test_foreach_batch_journal_restart_is_idempotent(spark, sf_dir, tmp_path):
    """The exactly-once property of the batch_id journal: stop the
    stream mid-input, restart from the SAME checkpoint with more data,
    and restart once more with nothing new — the compacted state must
    equal the plain batch aggregate after the second phase and must not
    change on the empty restart (no duplicated or re-appended batches)."""
    import os

    from rpa_etl_investing_spark.streaming import (
        compact_journal,
        journal_upsert_sink,
    )

    events = tbl(spark, sf_dir, "events").select("event_id", "user_id")
    chunks = tmp_path / "chunks"
    events.withColumn("chunk", (F.col("event_id") % 3).cast("int")).coalesce(
        1
    ).write.partitionBy("chunk").parquet(str(chunks))
    # phase 1: only chunks 0 and 1 visible
    staged = tmp_path / "staged"
    staged.mkdir()
    for c in (0, 1):
        (staged / f"chunk={c}").symlink_to(chunks / f"chunk={c}")

    def run_stream():
        stream = (
            spark.readStream.schema("event_id bigint, user_id bigint, chunk int")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(staged))
            .drop("chunk")
        )
        agg = stream.groupBy("user_id").agg(F.count("*").alias("n_events"))
        q = journal_upsert_sink(agg, str(tmp_path / "journal"), str(tmp_path / "ckpt"))
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_stream()
    # phase 2: the remaining chunk arrives; restart from the checkpoint
    (staged / "chunk=2").symlink_to(chunks / "chunk=2")
    run_stream()
    got = {
        (r["user_id"], r["n_events"])
        for r in compact_journal(spark, str(tmp_path / "journal"), ["user_id"]).collect()
    }
    expected = {
        (r["user_id"], r["n_events"])
        for r in events.groupBy("user_id").agg(F.count("*").alias("n_events")).collect()
    }
    assert got == expected
    # phase 3: restart with no new data — journal must be unchanged
    before = sorted(os.listdir(tmp_path / "journal"))
    run_stream()
    after = sorted(os.listdir(tmp_path / "journal"))
    assert before == after
    got2 = {
        (r["user_id"], r["n_events"])
        for r in compact_journal(spark, str(tmp_path / "journal"), ["user_id"]).collect()
    }
    assert got2 == expected


def test_stream_static_enrich_matches_batch(spark, sf_dir, tmp_path):
    """Stream-static broadcast enrich: the same static_enrich plan under
    readStream (stateless, append mode, NO watermark — the defining
    property of stream-static joins) must emit exactly the batch join's
    rows."""
    from rpa_etl_investing_spark.streaming import static_enrich

    dim = tbl(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    batch_events = tbl(spark, sf_dir, "events")
    expected = {
        (r["event_id"], r["c_mktsegment"])
        for r in static_enrich(batch_events, dim)
        .select("event_id", "c_mktsegment")
        .collect()
    }

    stream_dir = tmp_path / "events_stream"
    stream_dir.mkdir()
    (stream_dir / "events.parquet").symlink_to(f"{sf_dir}/events.parquet")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = _stream_events(spark, raw_schema, stream_dir)
    q = (
        static_enrich(stream, dim)
        .select("event_id", "c_mktsegment")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("static_enrich_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["event_id"], r["c_mktsegment"])
            for r in spark.sql("SELECT * FROM static_enrich_out").collect()
        }
    finally:
        q.stop()
    assert got == expected


def test_transform_with_state_running_max_matches_batch(spark, sf_dir, tmp_path):
    """ST6 on the NEW Spark 4 arbitrary-state API
    (transformWithStateInPandas + ValueState on the RocksDB store,
    the successor to applyInPandasWithState): per-user running max
    event value; after the stream drains, the final state per user must
    equal the batch groupBy max.

    Environment gate: the transformWithState driver worker speaks
    protobuf to the JVM state server; this container ships no
    google.protobuf, so the test skips here and runs wherever protobuf
    is present (the applyInPandasWithState path above covers stateful
    processing in-container)."""
    import pandas as pd
    import pytest

    pytest.importorskip("google.protobuf.descriptor")
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningMax(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("mx", "mx double")

        def handleInputRows(self, key, rows, timerValues):
            mx = self._state.get()[0] if self._state.exists() else None
            for pdf in rows:
                m = pdf["value"].max()
                mx = m if mx is None else max(mx, m)
            self._state.update((float(mx),))
            yield pd.DataFrame({"user_id": [key[0]], "max_value": [float(mx)]})

        def close(self) -> None:
            pass

    batch_events = tbl(spark, sf_dir, "events")
    expected = {
        (r["user_id"], r["max_value"])
        for r in batch_events.groupBy("user_id")
        .agg(F.max("value").alias("max_value"))
        .collect()
    }

    stream_dir = tmp_path / "events_stream"
    stream_dir.mkdir()
    (stream_dir / "events.parquet").symlink_to(f"{sf_dir}/events.parquet")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = _stream_events(spark, raw_schema, stream_dir)
        # capture with foreachBatch so every emission carries its
        # batch_id: memory-sink collect() order does not reflect
        # micro-batch emission order, so "last collected row wins"
        # could pick a stale update and flake — reduce by max batch_id
        # per user instead
        captured: list[tuple[int, list]] = []

        def capture(bdf, batch_id: int) -> None:
            captured.append((batch_id, bdf.collect()))

        q = (
            stream.select("user_id", "value")
            .groupBy("user_id")
            .transformWithStateInPandas(
                RunningMax(),
                outputStructType="user_id bigint, max_value double",
                outputMode="Update",
                timeMode="None",
            )
            .writeStream.outputMode("update")
            .foreachBatch(capture)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
    # update mode may emit several rows per user across micro-batches;
    # the emission from the HIGHEST batch_id per user is the final
    # state (within one batch, update mode emits at most one row/key)
    last: dict[int, tuple[int, float]] = {}
    for batch_id, rows in captured:
        for r in rows:
            prev = last.get(r["user_id"])
            if prev is None or batch_id >= prev[0]:
                last[r["user_id"]] = (batch_id, r["max_value"])
    got = {(u, v) for u, (_, v) in last.items()}
    assert got == expected


def test_windowed_topk_readstream_matches_batch(spark, sf_dir, tmp_path):
    """ST11 under a REAL readStream (r8, verdict item #2): the windowed
    counts run incrementally in complete mode over maxFilesPerTrigger=1
    chunks into a memory sink — the state the docstring claims the
    store holds — and the top-k rank is computed as the SINK-side read
    query, exactly the append-mode boundary stream_windowed_topk
    documents. The leaderboard must equal the batch-form query (the
    oracle-checked registry entry) row for row."""
    from pyspark.sql import Window as W

    import rpa_etl_investing_spark.plans as plans

    expected = {
        (r["window_start"], r["event_type"], r["n_events"], r["rnk"])
        for r in plans.QUERIES["stream_windowed_topk"].fn(spark, sf_dir).collect()
    }
    assert expected, "batch leaderboard is empty — fixture problem"

    # several micro-batches: chunk the fixture and trigger per file
    chunks = tmp_path / "chunks"
    events = tbl(spark, sf_dir, "events").select("event_id", "ts", "event_type")
    events.withColumn("chunk", (F.col("event_id") % 3).cast("int")).coalesce(
        1
    ).write.partitionBy("chunk").parquet(str(chunks))

    stream = (
        spark.readStream.schema("event_id bigint, ts timestamp, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(chunks))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    counts = stream.groupBy(
        F.window(F.col("ts"), "30 minutes").getField("start").alias("window_start"),
        "event_type",
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    q = (
        counts.writeStream.outputMode("complete")
        .format("memory")
        .queryName("topk_state")
        .start()
    )
    try:
        q.processAllAvailable()
        # at least 3 micro-batches ran (one per chunk file)
        assert len(q.recentProgress) >= 3, [p.numInputRows for p in q.recentProgress]
        rank_w = W.partitionBy("window_start").orderBy(
            F.desc("n_events"), F.asc("event_type")
        )
        got = {
            (r["window_start"], r["event_type"], r["n_events"], r["rnk"])
            for r in spark.table("topk_state")
            .withColumn("rnk", F.row_number().over(rank_w).cast("int"))
            .filter(F.col("rnk") <= 2)
            .collect()
        }
    finally:
        q.stop()
    assert got == expected


def test_streaming_dedup_admission_matches_batch(spark, sf_dir, tmp_path):
    """r9 stretch (verdict item #8): the minhash+exact-hash ADMISSION
    gate (`llm_incremental_dedup` / operators/dedup.admission_screen)
    run as a STREAMING foreachBatch leg — new documents arrive as a
    file stream one file per trigger, each micro-batch is screened
    against the PRECOMPUTED static corpus relations, admissions append
    to a sink. The union over micro-batches must equal the one-shot
    batch admission row-for-row: the screen joins corpus-side relations
    only (never batch-to-batch), so it decomposes over any partition of
    the arrivals — bounded state (the corpus hash/signature relations),
    O(batch) per trigger."""
    import threading

    from rpa_etl_investing_spark.operators.dedup import admission_screen

    docs = tbl(spark, sf_dir, "documents")
    newb = docs.filter(F.col("doc_id") % 3 == 0)
    corp = docs.filter(F.col("doc_id") % 3 != 0)

    expected = {
        r["doc_id"]: (r["is_exact_dup"], r["is_near_dup"], r["admitted"])
        for r in admission_screen(newb, corp).collect()
    }

    # arrivals: the new batch split over 4 files, one file per trigger
    arrive_dir = str(tmp_path / "arrivals")
    newb.repartition(4).write.parquet(arrive_dir)
    # a deployment keeps the corpus-side relations hot across triggers;
    # here the static DataFrame is simply reused by every micro-batch
    got: dict = {}
    lock = threading.Lock()

    def screen_batch(batch_df, batch_id: int) -> None:
        rows = admission_screen(batch_df, corp).collect()
        with lock:
            for r in rows:
                assert r["doc_id"] not in got, "doc seen in two batches"
                got[r["doc_id"]] = (
                    r["is_exact_dup"], r["is_near_dup"], r["admitted"]
                )

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(arrive_dir)
    )
    q = stream.writeStream.foreachBatch(screen_batch).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert got == expected
