"""Batch-checkable forms of the streaming operators (SURVEY §2.9 note:
the driver oracle is DuckDB over static parquet, so correctness checks
run the window logic in batch mode; tests/test_streaming.py runs the
same plans under readStream)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rpa_etl_investing_spark.catalog import tbl
from rpa_etl_investing_spark.plans.registry import register
from rpa_etl_investing_spark.streaming import (
    dedup_first_event,
    drop_late_events,
    sessionize,
    sliding_window_counts,
    tumbling_window_counts,
)

# DuckDB's time_bucket origin (2000-01-03 00:00:00 UTC) sits on every
# whole-minute grid we use, so buckets align with Spark's epoch-aligned
# window() for these durations.


def _link_events(stream_dir: str, sf_dir: str) -> None:
    """Populate a file-stream source directory with links to the events
    fixture. Driver fixtures are SINGLE parquet files; derived scale
    fixtures (scripts/make_scale_fixture.py) are Spark-written
    DIRECTORIES — a symlink to the directory itself is invisible to the
    file-stream source's listing (sf1 stress: both stateful streaming
    queries read 0 rows), so directory fixtures get one link per part
    file instead.

    Reconciliation (r8 advice #4): the dir is synced against the
    CURRENT fixture shape, not just appended to — a regenerated
    directory fixture with different part-file names, or a fixture
    that switched between file and directory shape at the same path,
    would otherwise leave stale/dangling links that make the stream
    double-count or fail. Every existing entry whose name or link
    target no longer matches the expected mapping is removed before
    the missing links are created."""
    import os

    os.makedirs(stream_dir, exist_ok=True)
    src = f"{sf_dir}/events.parquet"
    if os.path.isdir(src):
        expected = {
            f: os.path.join(src, f)
            for f in sorted(os.listdir(src))
            if f.endswith(".parquet")
        }
    else:
        expected = {"events.parquet": src}
    for name in os.listdir(stream_dir):
        link = os.path.join(stream_dir, name)
        target = os.readlink(link) if os.path.islink(link) else None
        if target != expected.get(name):
            os.remove(link)
    for name, target in expected.items():
        link = os.path.join(stream_dir, name)
        if not os.path.lexists(link):
            os.symlink(target, link)


@register(
    "stream_tumbling_window",
    oracle="""
    SELECT TIME_BUCKET(INTERVAL '10 minutes', CAST(ts AS TIMESTAMP)) AS window_start,
           TIME_BUCKET(INTERVAL '10 minutes', CAST(ts AS TIMESTAMP)) + INTERVAL 10 MINUTE AS window_end,
           event_type,
           COUNT(*) AS n_events,
           (CAST(CAST(SUM(CAST(value AS DECIMAL(27,6))) * 1000000 AS BIGINT) AS DOUBLE) / 1000000.0) AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST1: tumbling event-time windows (batch form)."""
    return tumbling_window_counts(tbl(spark, sf_dir, "events"))


@register(
    "stream_sliding_window",
    oracle="""
    SELECT start AS window_start,
           start + INTERVAL 10 MINUTE AS window_end,
           COUNT(*) AS n_events
    FROM (
      SELECT TIME_BUCKET(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP))
               - o * INTERVAL 5 MINUTE AS start
      FROM events CROSS JOIN (VALUES (0), (1)) AS offs(o))
    GROUP BY start
    """,
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST2: sliding windows (10 min / 5 min — every event in 2 windows)."""
    return sliding_window_counts(tbl(spark, sf_dir, "events"))


@register(
    "stream_session_window",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE OR
                  LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events)),
    numbered AS (
      SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS session_no
      FROM flagged)
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events,
           MIN(event_id) AS first_event_id
    FROM numbered
    GROUP BY user_id, session_no
    """,
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST3: session windows (30-min gap) per user — the oracle hand-rolls
    gaps-and-islands sessionization (SURVEY §7.4 dialect note)."""
    return sessionize(tbl(spark, sf_dir, "events"))


@register(
    "stream_dedup",
    oracle="""
    SELECT user_id, event_type,
           MIN(event_id) AS first_event_id,
           MIN(CAST(ts AS TIMESTAMP)) AS first_ts,
           COUNT(*) AS n_duplicates
    FROM events
    GROUP BY user_id, event_type
    """,
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST5: deterministic streaming-dedup batch form (first event per key)."""
    return dedup_first_event(tbl(spark, sf_dir, "events"))


@register(
    "stream_late_data",
    oracle="""
    SELECT event_type, COUNT(*) AS n_on_time,
           MIN(CAST(ts AS TIMESTAMP)) AS earliest_kept
    FROM events
    WHERE CAST(ts AS TIMESTAMP) >=
          (SELECT MAX(CAST(ts AS TIMESTAMP)) - INTERVAL 1 HOUR FROM events)
    GROUP BY event_type
    """,
)
def stream_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST4: watermark late-data semantics in batch form."""
    kept = drop_late_events(tbl(spark, sf_dir, "events"))
    return kept.groupBy("event_type").agg(
        F.count("*").alias("n_on_time"),
        F.min("ts").alias("earliest_kept"),
    )


@register(
    "stream_stateful_running_totals",
    oracle="""
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY user_id
    """,
)
def stream_stateful_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST6: custom stateful operator (applyInPandasWithState) executed as
    a real streaming query — file-stream source over the events fixture,
    memory sink, final per-user emission returned. The count field is
    exactly the batch ``GROUP BY user_id`` (oracle); the float total is
    checked with tolerance in tests/test_streaming.py."""
    import os
    import uuid

    from rpa_etl_investing_spark.sources import scratch_dir
    from rpa_etl_investing_spark.streaming import running_user_totals

    stream_dir = scratch_dir(
        os.path.basename(os.path.normpath(sf_dir)), "events_stateful", "x"
    )
    _link_events(stream_dir, sf_dir)

    from rpa_etl_investing_spark.catalog import normalize_events_ts

    # The schema probe must tolerate BOTH fixture layouts (catalog.tbl
    # docstring): under the legacy TIMESTAMP(NANOS) layout a bare session
    # throws "Illegal Parquet type" unless nanosAsLong is set first —
    # this is a raw read, so it can't rely on tbl() having run earlier
    # in the same session.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = normalize_events_ts(
        spark.readStream.schema(raw_schema).parquet(stream_dir)
    )
    sink = f"stateful_totals_{uuid.uuid4().hex[:8]}"
    q = (
        running_user_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(sink)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(
        f"""
        SELECT user_id, n_events FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                       ORDER BY n_events DESC) AS rn
          FROM {sink}) WHERE rn = 1
        """
    )


@register(
    "stream_interval_join",
    oracle="""
    WITH clicks AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'click'),
    purchases AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
      FROM events WHERE event_type = 'purchase')
    SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
           CAST(DATE_DIFF('second', c.ts, p.ts) AS BIGINT) AS lag_seconds,
           p.value AS purchase_value
    FROM clicks c JOIN purchases p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join in its batch form: each click paired
    with the same user's purchases in the following 30 minutes
    (streaming/joins.py interval_join; the watermarked readStream run of
    the same plan is asserted equal in tests/test_streaming.py)."""
    from rpa_etl_investing_spark.streaming import interval_join

    ev = tbl(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    j = interval_join(clicks, purchases, upper="30 minutes", right_prefix="p_")
    return j.select(
        F.col("event_id").alias("click_id"),
        F.col("p_event_id").alias("purchase_id"),
        "user_id",
        (F.unix_timestamp(F.col("p_ts").cast("timestamp"))
         - F.unix_timestamp(F.col("ts").cast("timestamp"))).alias("lag_seconds"),
        F.col("p_value").alias("purchase_value"),
    )


@register(
    "stream_static_enrich",
    oracle="""
    SELECT COALESCE(c.c_mktsegment, 'UNKNOWN') AS segment,
           e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           (CAST(CAST(SUM(CAST(e.value AS DECIMAL(27,6))) * 1000000 AS BIGINT) AS DOUBLE) / 1000000.0) AS total_value
    FROM events e
    LEFT JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast enrichment (batch form): every event
    left-joined to the static customer dim on user_id = c_custkey, then
    rolled up per (market segment, event type). Unmatched users land in
    'UNKNOWN' — enrichment never drops facts. The identical enrich plan
    runs stateless under readStream (no watermark, no join state — the
    dim is broadcast and probed map-side per micro-batch); the readStream
    row-level parity test lives in tests/test_streaming.py."""
    from rpa_etl_investing_spark.plans.aggregates import dsum
    from rpa_etl_investing_spark.streaming import static_enrich

    ev = tbl(spark, sf_dir, "events")
    dim = tbl(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    enriched = static_enrich(ev, dim)
    return enriched.groupBy(
        F.coalesce(F.col("c_mktsegment"), F.lit("UNKNOWN")).alias("segment"),
        F.col("event_type"),
    ).agg(
        F.count("*").alias("n_events"),
        dsum("value", 6).alias("total_value"),
    )


@register(
    "stream_upsert_journal",
    oracle="""
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY user_id
    """,
)
def stream_upsert_journal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST6+: exactly-once sink pattern — update-mode per-user counts
    journaled by a foreachBatch writer into batch_id-named partitions
    (replay overwrites, never duplicates), compacted latest-per-key on
    read (streaming/sinks.py). The fixture is split into three chunk
    files and streamed with maxFilesPerTrigger=1 so the journal really
    sees multiple batches; the compacted state must equal the plain
    batch GROUP BY (the oracle)."""
    import os
    import shutil
    import uuid

    from rpa_etl_investing_spark.sources import scratch_dir
    from rpa_etl_investing_spark.streaming import (
        compact_journal,
        journal_upsert_sink,
    )

    base = scratch_dir(
        os.path.basename(os.path.normpath(sf_dir)), "upsert_journal", "x"
    )
    # fresh run dir per call (a reused checkpoint would skip the files it
    # already processed); the previous call's tree is reaped here instead
    # of at return, so the result can stay a lazy DataFrame
    shutil.rmtree(base, ignore_errors=True)
    run_dir = os.path.join(base, uuid.uuid4().hex)
    chunks_dir = os.path.join(run_dir, "chunks")
    events = tbl(spark, sf_dir, "events").select("event_id", "user_id")
    # one FILE per chunk (so maxFilesPerTrigger=1 yields exactly three
    # deterministic micro-batches) WITHOUT funneling the whole table
    # through a single task (r6 verdict item #7): hash-repartitioning on
    # the partition column routes each chunk value to exactly one of
    # three parallel tasks, and partitionBy then emits one file per
    # chunk value per task — 3 writers instead of coalesce(1)'s 1, and
    # the shape stays per-key-bounded at any fixture scale.
    events.withColumn(
        "chunk", (F.col("event_id") % 3).cast("int")
    ).repartition(3, "chunk").write.partitionBy("chunk").parquet(chunks_dir)

    stream = (
        spark.readStream.schema("event_id bigint, user_id bigint, chunk int")
        .option("maxFilesPerTrigger", 1)
        .parquet(chunks_dir)
        .drop("chunk")
    )
    agg = stream.groupBy("user_id").agg(F.count("*").alias("n_events"))
    sink_dir = os.path.join(run_dir, "journal")
    q = journal_upsert_sink(agg, sink_dir, os.path.join(run_dir, "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return compact_journal(spark, sink_dir, ["user_id"]).select(
        "user_id", F.col("n_events").cast("bigint").alias("n_events")
    )


@register(
    "stream_stateful_ewma",
    oracle="""
    WITH daily AS (
      SELECT event_type, DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS day,
             CAST(SUM(CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
               AS xq
      FROM events WHERE event_type IS NOT NULL
      GROUP BY 1, 2),
    agg AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
             list(xq / 1e6 ORDER BY day) AS xs
      FROM daily GROUP BY event_type)
    SELECT event_type, n_days,
           CAST(FLOOR(1e6 * list_reduce(
                  list_prepend(CAST(0.0 AS DOUBLE), xs),
                  (acc, v) -> 0.25 * v + 0.75 * acc) + 0.5)
                AS BIGINT) AS ewma_q
    FROM agg
    ORDER BY event_type
    """,
)
def stream_stateful_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST6 gen: stateful NUMERIC streaming — per-event-type EWMA of the
    daily value total maintained in ``applyInPandasWithState`` state
    (constant-size (n_days, ewma) per key), run as a real readStream →
    memory-sink query over the events fixture. Day totals are exact
    integer micro-units before the fold (the float-sum-order trap the
    operator docstring documents), so the final streaming emission is
    bit-reconcilable with the oracle's strict scalar left fold on the
    1e-6 grid. The batch twin of this state machine is the distributed
    affine scan (timeseries_ewma) — same recurrence, two execution
    models."""
    import os
    import uuid

    from rpa_etl_investing_spark.catalog import normalize_events_ts
    from rpa_etl_investing_spark.sources import scratch_dir
    from rpa_etl_investing_spark.streaming import running_type_ewma

    stream_dir = scratch_dir(
        os.path.basename(os.path.normpath(sf_dir)), "events_ewma", "x"
    )
    _link_events(stream_dir, sf_dir)

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = normalize_events_ts(
        spark.readStream.schema(raw_schema).parquet(stream_dir)
    )
    sink = f"stateful_ewma_{uuid.uuid4().hex[:8]}"
    q = (
        running_type_ewma(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(sink)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # keep the emission from the most advanced state per key (n_days is
    # monotone across a key's emissions, so max-n_days = final)
    return spark.sql(
        f"""
        SELECT event_type, n_days,
               CAST(FLOOR(1e6 * ewma + 0.5) AS BIGINT) AS ewma_q
        FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                       ORDER BY n_days DESC) AS rn
          FROM {sink}) WHERE rn = 1
        ORDER BY event_type
        """
    )


@register(
    "stream_windowed_distinct",
    oracle="""
    WITH w AS (
      SELECT TIMESTAMP '1970-01-01'
               + INTERVAL (FLOOR(EPOCH(CAST(ts AS TIMESTAMP)) / 604800) * 604800)
                 SECOND AS window_start,
             user_id
      FROM events)
    SELECT window_start,
           window_start + INTERVAL 7 DAY AS window_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_exact,
           TRUE AS hll_within_tol
    FROM w GROUP BY window_start
    """,
)
def stream_windowed_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST10 (r6): distinct users per 7-day tumbling event-time window —
    the windowed form of the distinct-counting story: EXACT counts via
    the mergeable bitmap aggregation (`agg_bitmap_distinct`'s
    machinery, running INSIDE the window groupBy: bounded 4 KB state
    per (window, bucket), never an expand rewrite), alongside the
    HLL++ estimate with the 5σ tolerance verdict (the
    `agg_approx_distinct` convention — raw sketch estimates are
    engine-specific, so the boolean is what crosses the comparator).

    Batch ≡ stream: `F.window('ts', '7 days')` is the streaming
    operator — the identical plan runs under readStream with a
    watermark (ST1's convention); in streaming mode the HLL/bitmap
    states are exactly what the state store would hold per window.
    The oracle floors epoch seconds to the 604800 grid explicitly
    because DuckDB's TIME_BUCKET anchors weekly buckets at 2000-01-03
    while Spark's window() anchors at the 1970 epoch — the two grids
    only coincide for divisors of a day."""
    ev = tbl(spark, sf_dir, "events")
    per_bucket = (
        ev.select(F.window(F.col("ts").cast("timestamp"), "7 days").alias("w"), "user_id")
        .groupBy("w", F.expr("bitmap_bucket_number(user_id)").alias("bkt"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_ev"),
            F.expr(
                "bitmap_count(bitmap_construct_agg(bitmap_bit_position(user_id)))"
            ).alias("n_in_bucket"),
            F.expr("approx_count_distinct(user_id, 0.01)").alias("hll_part"),
        )
    )
    # exact distinct sums bucket popcounts; the HLL verdict re-runs the
    # sketch at window grain (cheap second pass over the same shuffle)
    exact = per_bucket.groupBy("w").agg(
        F.sum("n_ev").cast("bigint").alias("n_events"),
        F.sum("n_in_bucket").cast("bigint").alias("n_users_exact"),
    )
    est = (
        ev.select(F.window(F.col("ts").cast("timestamp"), "7 days").alias("w"), "user_id")
        .groupBy("w")
        .agg(F.expr("approx_count_distinct(user_id, 0.01)").alias("est"))
    )
    return (
        exact.join(est, "w")
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "n_users_exact",
            (
                F.abs(F.col("est") - F.col("n_users_exact"))
                <= F.lit(0.05) * F.col("n_users_exact") + F.lit(5)
            ).alias("hll_within_tol"),
        )
    )


@register(
    "stream_windowed_topk",
    oracle="""
    WITH cells AS (
      SELECT TIME_BUCKET(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP))
               AS window_start,
             event_type, CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY window_start
                                   ORDER BY n_events DESC, event_type)
                AS rnk
      FROM cells)
    SELECT window_start, event_type, n_events, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 2
    ORDER BY window_start, rnk
    """,
)
def stream_windowed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST11 (r7): top-k event types per tumbling window — the trending
    leaderboard every streaming dashboard maintains. Batch-checkable
    form of the complete-mode pattern: windowed counts (the ST1
    aggregate) ranked within each window with a deterministic
    tie-break, k=2. In live streaming the windowed counts run
    incrementally under a watermark and the rank is the SINK-side read
    query (rank-over-state is not incrementally maintainable in append
    mode — the documented Structured Streaming boundary; the state
    store holds only the (window, type) counts, which IS the
    leaderboard's input).

    Scale shape: one fact pass into a (window × type)-bounded cell
    relation; the rank window sorts |types| rows per window cell —
    never the fact."""
    ev = tbl(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    cells = ev.groupBy(
        F.window(F.col("ts").cast("timestamp"), "30 minutes")
        .getField("start")
        .alias("window_start"),
        "event_type",
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    w = W.partitionBy("window_start").orderBy(
        F.desc("n_events"), F.asc("event_type")
    )
    return (
        cells.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 2)
        .orderBy("window_start", "rnk")
    )
