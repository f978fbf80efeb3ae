"""Time-series surface: calendar spines, gap filling, LOCF.

The reference's fact table is an append-only timeline of snapshots
(``/root/reference/main.py:44``); real consumers of that timeline need
*dense* series — every (entity, period) present, missing periods
carried forward — before charting or joining. These queries build the
spine and fill it, the hypertable-rollup companion to the as-of join
(operators/asof.py).

Scale shape: the spine is rows-per-entity × periods, generated
executor-side (``sequence``+``explode`` — no driver loop); the fill is
one window pass per entity partition. At 100 TB the spine join keys on
(entity, period) and shuffles once; ``last(..., ignorenulls)`` is a
running frame, not a self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rpa_etl_investing_spark.catalog import tbl
from rpa_etl_investing_spark.plans.aggregates import dsum
from rpa_etl_investing_spark.plans.registry import register


def gap_fill_locf(
    ev: DataFrame, start: str | None = None, end: str | None = None
) -> DataFrame:
    """Dense daily series per entity with last-observation-carried-forward:
    build the full (user × day) spine executor-side, left-join the
    day's total, and fill holes with a running ``last(ignorenulls)``
    frame. Days before a user's first event stay NULL (nothing to
    carry).

    Spine bounds: pass ``start``/``end`` literals for a pinned window
    (the oracle-checked registered query does — the fixture window is
    fixed across scale factors); omit them to derive the bounds from the
    data — the min/max event day rides in as a 1-row broadcast scalar
    (crossJoin of an aggregate, no driver collect), the same scalar
    plumbing as the dim upsert's max-id (r3 verdict item #6)."""
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(dsum("value", 4).alias("v"))
    users = ev.select("user_id").distinct()
    if start is None or end is None:
        bounds = ev.agg(
            F.date_trunc("day", F.min("ts")).alias("_day_lo"),
            F.date_trunc("day", F.max("ts")).alias("_day_hi"),
        )
        spine = users.crossJoin(F.broadcast(bounds)).select(
            "user_id",
            F.explode(
                F.sequence(
                    F.col("_day_lo"), F.col("_day_hi"), F.expr("INTERVAL 1 DAY")
                )
            ).alias("day"),
        )
    else:
        spine = users.select(
            "user_id",
            F.explode(
                F.sequence(
                    F.lit(start).cast("timestamp"),
                    F.lit(end).cast("timestamp"),
                    F.expr("INTERVAL 1 DAY"),
                )
            ).alias("day"),
        )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return spine.join(daily, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        F.last("v", ignorenulls=True).over(w).alias("v_filled"),
    )


@register(
    "timeseries_gap_fill_locf",
    oracle="""
    WITH daily AS (
      SELECT user_id, DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS day,
             (CAST(CAST(SUM(CAST(value AS DECIMAL(27,4))) * 10000 AS BIGINT) AS DOUBLE) / 10000.0) AS v
      FROM events GROUP BY 1, 2),
    users AS (SELECT DISTINCT user_id FROM events),
    spine AS (
      SELECT user_id,
             UNNEST(generate_series(TIMESTAMP '2024-01-01',
                                    TIMESTAMP '2024-01-30',
                                    INTERVAL 1 DAY)) AS day
      FROM users),
    j AS (
      SELECT s.user_id, s.day, d.v
      FROM spine s LEFT JOIN daily d
        ON d.user_id = s.user_id AND d.day = s.day)
    SELECT user_id, day,
           last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
    FROM j
    """,
)
def timeseries_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered (pinned-bounds) form of :func:`gap_fill_locf` — the
    fixture window 2024-01-01..30 is fixed across scale factors, so the
    spine bounds are literals and the oracle is deterministic. The
    data-derived-bounds path is exercised by tests."""
    return gap_fill_locf(tbl(spark, sf_dir, "events"), "2024-01-01", "2024-01-30")


@register(
    "timeseries_gap_fill_locf_derived",
    oracle="""
    WITH daily AS (
      SELECT user_id, DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS day,
             (CAST(CAST(SUM(CAST(value AS DECIMAL(27,4))) * 10000 AS BIGINT) AS DOUBLE) / 10000.0) AS v
      FROM events GROUP BY 1, 2),
    users AS (SELECT DISTINCT user_id FROM events),
    bounds AS (
      SELECT DATE_TRUNC('day', MIN(CAST(ts AS TIMESTAMP))) AS lo,
             DATE_TRUNC('day', MAX(CAST(ts AS TIMESTAMP))) AS hi
      FROM events),
    spine AS (
      SELECT user_id,
             UNNEST(generate_series(b.lo, b.hi, INTERVAL 1 DAY)) AS day
      FROM users CROSS JOIN bounds b),
    j AS (
      SELECT s.user_id, s.day, d.v
      FROM spine s LEFT JOIN daily d
        ON d.user_id = s.user_id AND d.day = s.day)
    SELECT user_id, day,
           last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
    FROM j
    """,
)
def timeseries_gap_fill_locf_derived(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-derived-bounds form of :func:`gap_fill_locf` (r3 verdict item
    #6): the spine window is the corpus's actual min/max event day,
    carried as a 1-row broadcast scalar on both engines (the oracle
    cross-joins the same bounds aggregate), so the operator needs no
    fixture-coupled literals."""
    return gap_fill_locf(tbl(spark, sf_dir, "events"))


_MONTH_SPINE_SQL = """
    WITH RECURSIVE months(month_start) AS (
      SELECT TIMESTAMP '1995-01-01'
      UNION ALL
      SELECT month_start + INTERVAL 1 MONTH FROM months
      WHERE month_start < TIMESTAMP '2001-12-01')
    SELECT m.month_start,
           CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
    FROM months m
    LEFT JOIN orders o ON DATE_TRUNC('month', o.o_orderdate) = m.month_start
    GROUP BY m.month_start
    ORDER BY m.month_start
"""


@register("sql_recursive_month_spine", oracle=_MONTH_SPINE_SQL)
def sql_recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE through the SQL front-end (Spark ≥4.0
    ``WITH RECURSIVE``): generate the 1995-2001 month spine by
    recursion, then left-join order counts so empty months surface as
    zero — the same SQL text runs verbatim on both engines. The
    recursion is bounded (84 rows) and evaluated iteratively by
    Catalyst's UnionLoop; data-sized work stays in the join, not the
    recursion."""
    from rpa_etl_investing_spark.catalog import register_views

    register_views(spark, sf_dir, ["orders"])
    return spark.sql(_MONTH_SPINE_SQL)


@register(
    "timeseries_ohlc_resample",
    oracle="""
    WITH b AS (
      SELECT user_id, DATE_TRUNC('hour', ts) AS bucket, ts, event_id, value
      FROM events WHERE event_type = 'purchase'),
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY user_id, bucket
                                ORDER BY ts, event_id) AS rn_open,
             ROW_NUMBER() OVER (PARTITION BY user_id, bucket
                                ORDER BY ts DESC, event_id DESC) AS rn_close
      FROM b)
    SELECT user_id, bucket,
           MAX(CASE WHEN rn_open = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_close = 1 THEN value END) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_trades,
           (CAST(CAST(SUM(CAST(value AS DECIMAL(27,6))) * 1000000 AS BIGINT) AS DOUBLE) / 1000000.0) AS volume
    FROM ranked
    GROUP BY user_id, bucket
    """,
)
def timeseries_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC resampling — the investing-domain downsample: per user and
    hour bucket, the opening (earliest) and closing (latest) purchase
    value, the high/low, the trade count, and the decimal-exact volume.

    Open/close use the struct-min/max trick — ``min(struct(ts,
    event_id, value))`` picks the lexicographically-first event with
    event_id as the total-order tie-break, so first/last are
    deterministic without a window pass: the whole resample is ONE
    aggregate with a single (user, bucket) exchange. Struct-typed
    min/max buffers make Spark plan it as a partial+final
    SortAggregate rather than a HashAggregate — still map-side
    combinable, so the shuffle carries one row per (user, bucket) per
    mapper, which is the shape that survives a 100 TB tick stream; the
    oracle spells the same first/last via ROW_NUMBER. The same
    commutative-aggregate shape runs unchanged under readStream
    (tests/test_streaming.py), where the struct min/max IS the
    incremental state merge."""
    return ohlc_resample(tbl(spark, sf_dir, "events"))


def ohlc_resample(ev: DataFrame) -> DataFrame:
    """Batch ≡ stream OHLC: one struct-min/max aggregate per (user,
    hour), usable directly on a streaming DataFrame (complete/update
    mode) because every aggregate is commutative-mergeable state."""
    b = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.date_trunc("hour", F.col("ts")).alias("bucket"),
        "ts",
        "event_id",
        "value",
    )
    return b.groupBy("user_id", "bucket").agg(
        F.min(F.struct("ts", "event_id", "value")).getField("value").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.struct("ts", "event_id", "value")).getField("value").alias("close"),
        F.count("*").alias("n_trades"),
        F.sum(F.col("value").cast("decimal(27,6)")).cast("double").alias("volume"),
    )


def daily_close(ev: DataFrame) -> DataFrame:
    """Daily closing value per event_type: latest purchase of the day
    (event_id total-order tie-break) via the same struct-max trick as
    the OHLC resample — one aggregate, one (type, day) exchange."""
    b = ev.filter(F.col("event_type").isNotNull()).select(
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("day"),
        "ts",
        "event_id",
        "value",
    )
    return b.groupBy("event_type", "day").agg(
        F.max(F.struct("ts", "event_id", "value")).getField("value").alias("close")
    )


_DAILY_CLOSE_SQL = """
    b AS (
      SELECT event_type, DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS day,
             ts, event_id, value
      FROM events WHERE event_type IS NOT NULL),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type, day
                                   ORDER BY CAST(ts AS TIMESTAMP) DESC,
                                            event_id DESC) AS rn
      FROM b),
    closes AS (
      SELECT event_type, day, value AS close FROM ranked WHERE rn = 1),
    rets AS (
      SELECT event_type, day, close,
             CAST(FLOOR(1e6 * (close / LAG(close) OVER
                    (PARTITION BY event_type ORDER BY day) - 1) + 0.5)
                  AS BIGINT) AS qret
      FROM closes)
"""


@register(
    "timeseries_rolling_volatility",
    oracle=f"""
    WITH {_DAILY_CLOSE_SQL},
    win AS (
      SELECT event_type, day, qret,
             CAST(COUNT(qret) OVER w AS BIGINT) AS n_obs,
             CAST(SUM(qret) OVER w AS BIGINT) AS s1,
             CAST(SUM(qret * qret) OVER w AS BIGINT) AS s2
      FROM rets
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
    SELECT event_type, day, qret, n_obs,
           CASE WHEN n_obs >= 2
                THEN CAST(n_obs * s2 - s1 * s1 AS BIGINT) END AS var_num,
           CASE WHEN n_obs >= 2
                THEN CAST(n_obs * s2 - s1 * s1 AS BIGINT)
                     / (n_obs * (n_obs - 1)) / 1e12 END AS rolling_var
    FROM win
    """,
)
def timeseries_rolling_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day return volatility per event_type — the investing
    consumer's risk metric over the reference's snapshot timeline.
    Daily simple returns are quantized once to the 1e-6 grid (pure
    IEEE division, no transcendental — bit-exact across engines), and
    the rolling variance derives from exact integer power sums over a
    7-row frame: ``(n·Σq² − (Σq)²) / (n(n−1)) / 1e12``, so partitioning
    and frame evaluation order cannot change a bit.

    Scale shape: one (type, day) aggregate for closes, then one window
    pass per type — daily closes are ~365 rows/type/year regardless of
    raw tick volume, so the window partition is tiny even at 100 TB of
    input events."""
    from pyspark.sql.window import Window as W

    closes = daily_close(tbl(spark, sf_dir, "events"))
    wl = W.partitionBy("event_type").orderBy("day")
    rets = closes.withColumn(
        "qret",
        F.floor(
            F.lit(1e6) * (F.col("close") / F.lag("close").over(wl) - F.lit(1))
            + F.lit(0.5)
        ).cast("bigint"),
    )
    wf = W.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    win = rets.select(
        "event_type",
        "day",
        "qret",
        F.count("qret").over(wf).cast("bigint").alias("n_obs"),
        F.sum("qret").over(wf).cast("bigint").alias("s1"),
        F.sum(F.col("qret") * F.col("qret")).over(wf).cast("bigint").alias("s2"),
    )
    var_num = (F.col("n_obs") * F.col("s2") - F.col("s1") * F.col("s1")).cast("bigint")
    ok = F.col("n_obs") >= 2
    return win.select(
        "event_type",
        "day",
        "qret",
        "n_obs",
        F.when(ok, var_num).alias("var_num"),
        F.when(
            ok, var_num / (F.col("n_obs") * (F.col("n_obs") - 1)) / F.lit(1e12)
        ).alias("rolling_var"),
    )


@register(
    "timeseries_vwap_anomaly",
    oracle="""
    WITH daily AS (
      SELECT l_returnflag AS flag,
             DATE_TRUNC('day', CAST(l_shipdate AS TIMESTAMP)) AS day,
             (CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,2))) * 100 AS BIGINT) AS DOUBLE) / 100.0) AS notional,
             (CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(27,2))) * 100 AS BIGINT) AS DOUBLE) / 100.0) AS qty
      FROM lineitem GROUP BY 1, 2),
    vq AS (
      SELECT flag, day,
             CAST(FLOOR(1e3 * notional / qty + 0.5) AS BIGINT) AS vwap_q
      FROM daily),
    win AS (
      SELECT flag, day, vwap_q,
             CAST(COUNT(*) OVER w AS BIGINT) AS n_obs,
             CAST(SUM(vwap_q) OVER w AS BIGINT) AS s1,
             CAST(SUM(vwap_q * vwap_q) OVER w AS BIGINT) AS s2
      FROM vq
      WINDOW w AS (PARTITION BY flag ORDER BY day
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
    SELECT flag, day, vwap_q, vwap_q / 1e3 AS vwap, n_obs,
           CASE WHEN n_obs >= 3 THEN
             (n_obs * vwap_q - s1) * (n_obs * vwap_q - s1) * (n_obs - 1)
               > 4 * n_obs * (n_obs * s2 - s1 * s1)
           END AS is_anomaly
    FROM win
    """,
)
def timeseries_vwap_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily VWAP per return-flag with an integer-exact rolling z-score
    anomaly flag — the investing consumer's "did today's volume-weighted
    price break 2σ from its trailing week" alert over the reference's
    snapshot timeline (``/root/reference/main.py:44`` fact grain).

    Determinism: VWAP = Σ(extendedprice)/Σ(quantity) from exact decimal
    sums, quantized once to the 1e-3 grid (coarse enough that the
    squared integer power sums stay far below 2**63); the 2σ test is then the pure
    integer inequality ``(n·q − s1)²·(n−1) > 4·n·(n·s2 − s1²)`` —
    algebraically z² > 4 with no division, no sqrt, no float compare,
    so Spark and the oracle cannot disagree by a ULP.

    Scale shape: the heavy work is one (flag, day) hash-aggregate over
    the fact (map-side partials, one shuffle); the window pass runs over
    the *aggregated* daily series — ~365 rows/flag/year regardless of
    raw fact volume, so the low-cardinality partition is harmless (same
    argument as ``timeseries_rolling_volatility``)."""
    from pyspark.sql.window import Window as W

    li = tbl(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.date_trunc("day", F.col("l_shipdate")).alias("day"),
    ).agg(
        dsum("l_extendedprice").alias("notional"),
        dsum("l_quantity").alias("qty"),
    )
    vq = daily.select(
        "flag",
        "day",
        F.floor(F.lit(1e3) * F.col("notional") / F.col("qty") + F.lit(0.5))
        .cast("bigint")
        .alias("vwap_q"),
    )
    wf = W.partitionBy("flag").orderBy("day").rowsBetween(-6, 0)
    win = vq.select(
        "flag",
        "day",
        "vwap_q",
        F.count("*").over(wf).cast("bigint").alias("n_obs"),
        F.sum("vwap_q").over(wf).cast("bigint").alias("s1"),
        F.sum(F.col("vwap_q") * F.col("vwap_q")).over(wf).cast("bigint").alias("s2"),
    )
    dev = F.col("n_obs") * F.col("vwap_q") - F.col("s1")
    var_num = F.col("n_obs") * F.col("s2") - F.col("s1") * F.col("s1")
    return win.select(
        "flag",
        "day",
        "vwap_q",
        (F.col("vwap_q") / F.lit(1e3)).alias("vwap"),
        "n_obs",
        F.when(
            F.col("n_obs") >= 3,
            dev * dev * (F.col("n_obs") - 1) > F.lit(4) * F.col("n_obs") * var_num,
        ).alias("is_anomaly"),
    )


@register(
    "timeseries_ewma",
    oracle="""
    WITH daily AS (
      SELECT event_type, DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS day,
             (CAST(CAST(SUM(CAST(value AS DECIMAL(27,6))) * 1000000 AS BIGINT) AS DOUBLE) / 1000000.0) AS x
      FROM events WHERE event_type IS NOT NULL
      GROUP BY 1, 2),
    pre AS (
      SELECT event_type, day, x,
             list(x) OVER (PARTITION BY event_type ORDER BY day
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS xs
      FROM daily)
    SELECT event_type, day, x,
           CAST(FLOOR(1e6 * list_reduce(
                  list_prepend(CAST(0.0 AS DOUBLE), xs),
                  (acc, v) -> 0.25 * v + (1.0 - 0.25) * acc) + 0.5)
                AS BIGINT) AS ewma_q,
           CAST(FLOOR(1e6 * list_reduce(
                  list_prepend(CAST(0.0 AS DOUBLE), xs),
                  (acc, v) -> 0.25 * v + (1.0 - 0.25) * acc) + 0.5)
                AS BIGINT) / 1e6 AS ewma
    FROM pre
    """,
)
def timeseries_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of the daily volume series
    per event_type — the smoothed-price consumer of the reference's
    snapshot timeline, computed by the DISTRIBUTED two-level affine
    scan (operators/recurrence.py): JVM-side shard folds + a
    constant-sized shard-summary composition, never one sequential
    task per key.

    alpha = 0.25 so both alpha and 1-alpha are exact binary doubles
    (no literal-parsing skew between engines); the scan's re-associated
    arithmetic is reconciled with the oracle's strict left fold
    (``list_reduce``) on the 1e-6 grid — the same quantization
    discipline as every transcendental in this package.

    Scale shape: the heavy pass is the (type, day) hash-aggregate over
    raw events (map-side partials, one shuffle); the recurrence then
    runs over the aggregated daily series, sharded by day range, with
    no per-key global sort anywhere in the plan."""
    from rpa_etl_investing_spark.operators.caching import keep
    from rpa_etl_investing_spark.operators.prefix import with_id_range_shard
    from rpa_etl_investing_spark.operators.recurrence import ewma

    ev = tbl(spark, sf_dir, "events")
    # persist the aggregated daily series: the recurrence references it
    # through several branches (fold, summaries, final join-back) and a
    # re-expansion would rescan the raw fact per branch
    daily = keep(
        ev.filter(F.col("event_type").isNotNull())
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(dsum("value", 6).alias("x"))
        .withColumn(
            "ord", F.datediff(F.col("day"), F.lit("1970-01-01")).cast("bigint")
        )
    )
    sharded = with_id_range_shard(daily, "ord", n_shards=8)
    sm = ewma(sharded, ["event_type"], "ord", "x", alpha=0.25)
    q = F.floor(F.lit(1e6) * F.col("ewma") + F.lit(0.5)).cast("bigint")
    return (
        daily.join(sm, ["event_type", "ord"])
        .select(
            "event_type",
            "day",
            "x",
            q.alias("ewma_q"),
            (q / F.lit(1e6)).alias("ewma"),
        )
    )


@register(
    "timeseries_sessionize",
    oracle="""
    WITH e AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value
      FROM events),
    l AS (
      SELECT *, LAG(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS pts
      FROM e),
    f AS (
      SELECT *, CASE WHEN pts IS NULL
                       OR epoch_us(ts) - epoch_us(pts) > 1800000000
                     THEN 1 ELSE 0 END AS ns
      FROM l),
    s AS (
      SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS sid
      FROM f)
    SELECT user_id, CAST(sid AS BIGINT) AS session_seq,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           (CAST(CAST(SUM(CAST(value AS DECIMAL(27,6))) * 1000000 AS BIGINT) AS DOUBLE) / 1000000.0) AS volume
    FROM s
    GROUP BY user_id, sid
    """,
)
def timeseries_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization — the gap-based analogue of the streaming
    session window (streaming/windows.py): a new session starts when a
    user is idle for more than 30 minutes. One lag pass marks session
    starts, a running sum numbers them, one aggregate collapses each
    session to (start, end, count, exact-decimal volume). Gap compare
    is integer microseconds (``unix_micros``) on both engines; (ts,
    event_id) is the total order so ties cannot reshuffle sessions.

    Scale shape: both windows and the final aggregate share the
    user_id partitioning — ONE shuffle for the whole query, and the
    parallelism axis (users) grows with the data. Per-user history is
    bounded by retention, so no per-key global-sort pathology; a
    hot-key user would shard by time range with the
    operators/prefix.py machinery."""
    from pyspark.sql.window import Window as W

    e = tbl(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    wo = W.partitionBy("user_id").orderBy("ts", "event_id")
    # events.ts arrives TIMESTAMP_NTZ; the session TZ is pinned UTC
    # (session.py) so the LTZ cast unix_micros requires is an identity
    us = lambda c: F.unix_micros(c.cast("timestamp_ltz"))  # noqa: E731
    ns = F.when(
        F.lag("ts").over(wo).isNull()
        | (us(F.col("ts")) - us(F.lag("ts").over(wo)) > F.lit(1800000000)),
        F.lit(1),
    ).otherwise(F.lit(0))
    s = e.withColumn(
        "sid",
        F.sum(ns).over(wo.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return s.groupBy("user_id", F.col("sid").cast("bigint").alias("session_seq")).agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").cast("bigint").alias("n_events"),
        dsum("value", 6).alias("volume"),
    )


@register(
    "timeseries_interval_coverage",
    oracle="""
    WITH iv AS (
      SELECT l.l_suppkey AS supp,
             CAST(o.o_orderdate AS DATE) AS ivl_start,
             CAST(l.l_shipdate AS DATE) AS ivl_end,
             l.l_orderkey, l.l_linenumber
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderdate <= l.l_shipdate),
    m AS (
      SELECT *, MAX(ivl_end) OVER (
               PARTITION BY supp
               ORDER BY ivl_start, ivl_end, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
      FROM iv),
    f AS (
      SELECT *, CASE WHEN pmax IS NULL OR ivl_start > pmax
                     THEN 1 ELSE 0 END AS ni
      FROM m),
    isl AS (
      SELECT *, SUM(ni) OVER (
               PARTITION BY supp
               ORDER BY ivl_start, ivl_end, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM f),
    merged AS (
      SELECT supp, island, MIN(ivl_start) AS i_start, MAX(ivl_end) AS i_end
      FROM isl GROUP BY supp, island)
    SELECT supp,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(date_diff('day', i_start, i_end) + 1) AS BIGINT)
             AS covered_days,
           CAST(MAX(date_diff('day', i_start, i_end) + 1) AS BIGINT)
             AS longest_island_days
    FROM merged
    GROUP BY supp
    """,
)
def timeseries_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval union per supplier — merge every overlapping
    [order-placed, shipped] fulfilment window into maximal busy
    "islands" and report how many there are and how many distinct
    calendar days they cover. The gaps-and-islands classic: a strict
    1-PRECEDING running max of interval ends marks island starts, a
    running sum numbers islands, two aggregates finish.

    Scale shape: the only data-sized join is lineitem-orders on the
    orderkey both tables are naturally keyed by; the windows and both
    aggregates all share the supplier partitioning (one shuffle), and
    supplier cardinality grows with SF so the window axis stays
    parallel. All arithmetic is DATE/BIGINT-exact."""
    from pyspark.sql.window import Window as W

    li = tbl(spark, sf_dir, "lineitem")
    o = tbl(spark, sf_dir, "orders")
    iv = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .filter(F.col("o_orderdate") <= F.col("l_shipdate"))
        .select(
            F.col("l_suppkey").alias("supp"),
            F.col("o_orderdate").cast("date").alias("ivl_start"),
            F.col("l_shipdate").cast("date").alias("ivl_end"),
            "l_orderkey",
            "l_linenumber",
        )
    )
    order_cols = ["ivl_start", "ivl_end", "l_orderkey", "l_linenumber"]
    wm = (
        W.partitionBy("supp")
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    ws = (
        W.partitionBy("supp")
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    pmax = F.max("ivl_end").over(wm)
    ni = F.when(pmax.isNull() | (F.col("ivl_start") > pmax), 1).otherwise(0)
    isl = iv.withColumn("island", F.sum(ni).over(ws))
    merged = isl.groupBy("supp", "island").agg(
        F.min("ivl_start").alias("i_start"), F.max("ivl_end").alias("i_end")
    )
    days = F.datediff("i_end", "i_start") + F.lit(1)
    return merged.groupBy("supp").agg(
        F.count("*").cast("bigint").alias("n_islands"),
        F.sum(days).cast("bigint").alias("covered_days"),
        F.max(days).cast("bigint").alias("longest_island_days"),
    )


@register(
    "timeseries_cusum_alarm",
    oracle="""
    WITH daily AS (
      SELECT event_type, DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS day,
             (CAST(CAST(SUM(CAST(value AS DECIMAL(27,6))) * 1000000 AS BIGINT) AS DOUBLE) / 1000000.0) AS x
      FROM events WHERE event_type IS NOT NULL
      GROUP BY 1, 2),
    q AS (
      SELECT event_type, day,
             CAST(FLOOR(1e6 * x + 0.5) AS BIGINT) AS x_q
      FROM daily),
    k AS (
      SELECT event_type,
             CAST(SUM(x_q) // COUNT(*) AS BIGINT) AS k_q
      FROM q GROUP BY event_type),
    d AS (
      SELECT q.event_type, q.day, q.x_q, k.k_q, q.x_q - k.k_q AS dd
      FROM q JOIN k ON q.event_type = k.event_type),
    p AS (
      SELECT *, CAST(SUM(dd) OVER w AS BIGINT) AS pp
      FROM d
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    m AS (
      SELECT *, LEAST(CAST(0 AS BIGINT), MIN(pp) OVER w) AS mm
      FROM p
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    SELECT event_type, day, x_q, k_q,
           CAST(pp - mm AS BIGINT) AS cusum_q,
           (pp - mm) > 3 * k_q AS alarm
    FROM m
    """,
)
def timeseries_cusum_alarm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM change-point alarm per event_type: accumulate
    positive drift of the daily volume above its own mean and alarm
    when the cumulative excess tops 3× the mean daily level (Page
    1954's control chart). The sequential-looking recursion
    ``s_i = max(0, s_{i-1} + x_i − k)`` is rewritten by its closed
    form ``s_i = P_i − min(0, min_{j≤i} P_j)`` — a running SUM plus a
    running MIN of that sum — so the whole detector is two sharded
    two-level scans (operators/prefix.py), entirely in exact BIGINT
    once the daily value is quantized to the 1e-6 grid: no recursion,
    no floats, no per-key sequential task.

    Scale shape: one (type, day) fact aggregate, then both prefix
    passes run inside day-range shards sharing one partitioning; the
    only unsharded windows are over the constant-sized per-shard
    totals frames."""
    from rpa_etl_investing_spark.operators.caching import keep
    from rpa_etl_investing_spark.operators.prefix import (
        sharded_running_max,
        sharded_running_sum,
        with_id_range_shard,
    )

    ev = tbl(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type").isNotNull())
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(dsum("value", 6).alias("x"))
        .withColumn(
            "x_q", F.floor(F.lit(1e6) * F.col("x") + F.lit(0.5)).cast("bigint")
        )
        .withColumn(
            "ord", F.datediff(F.col("day"), F.lit("1970-01-01")).cast("bigint")
        )
    )
    k = daily.groupBy("event_type").agg(
        F.expr("sum(x_q) div count(*)").cast("bigint").alias("k_q")
    )
    # persist the AGGREGATED series (rows = types × days, fact-decoupled):
    # both sharded scans reference it repeatedly and would otherwise
    # re-expand the fact aggregation — and its raw scan — per branch
    d = keep(
        daily.join(k, "event_type").withColumn("dd", F.col("x_q") - F.col("k_q"))
    )
    sharded = with_id_range_shard(d, "ord", n_shards=8)
    p = sharded_running_sum(sharded, ["event_type"], ["ord"], "dd", "pp")
    m = sharded_running_max(
        p, ["event_type"], ["ord"], -F.col("pp"), "neg_min"
    ).withColumn("mm", F.least(F.lit(0).cast("bigint"), -F.col("neg_min")))
    return m.select(
        "event_type",
        "day",
        "x_q",
        "k_q",
        (F.col("pp") - F.col("mm")).cast("bigint").alias("cusum_q"),
        ((F.col("pp") - F.col("mm")) > 3 * F.col("k_q")).alias("alarm"),
    )


@register(
    "timeseries_max_drawdown",
    oracle=f"""
    WITH {_DAILY_CLOSE_SQL},
    dd AS (
      SELECT event_type, day, close,
             MAX(close) OVER (PARTITION BY event_type ORDER BY day
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS peak
      FROM closes),
    q AS (
      SELECT event_type, day, close, peak,
             CAST(FLOOR(1e6 * (peak - close) / peak + 0.5) AS BIGINT) AS dd_q
      FROM dd)
    SELECT event_type, day AS trough_day, close, peak,
           dd_q, dd_q / 1e6 AS max_drawdown
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                       ORDER BY dd_q DESC, day) AS rn FROM q)
    WHERE rn = 1
    """,
)
def timeseries_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per event_type: running peak of the daily close,
    per-day drawdown (peak − close)/peak on the 1e-6 integer grid (pure
    IEEE arithmetic — no libm), and the worst day per type picked with
    a deterministic earliest-day tie-break. Two window passes over the
    tiny daily-close series, then a per-type argmax."""
    from pyspark.sql.window import Window as W

    closes = daily_close(tbl(spark, sf_dir, "events"))
    wp = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    q = closes.withColumn("peak", F.max("close").over(wp)).withColumn(
        "dd_q",
        F.floor(
            F.lit(1e6) * (F.col("peak") - F.col("close")) / F.col("peak") + F.lit(0.5)
        ).cast("bigint"),
    )
    wr = W.partitionBy("event_type").orderBy(F.desc("dd_q"), F.asc("day"))
    return (
        q.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("day").alias("trough_day"),
            "close",
            "peak",
            "dd_q",
            (F.col("dd_q") / F.lit(1e6)).alias("max_drawdown"),
        )
    )


@register(
    "timeseries_interpolate_linear",
    oracle="""
    WITH daily AS (
      SELECT user_id, DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS day,
             (CAST(CAST(SUM(CAST(value AS DECIMAL(27,4))) * 10000 AS BIGINT) AS DOUBLE) / 10000.0) AS v
      FROM events GROUP BY 1, 2),
    users AS (SELECT DISTINCT user_id FROM events),
    spine AS (
      SELECT user_id,
             UNNEST(generate_series(TIMESTAMP '2024-01-01',
                                    TIMESTAMP '2024-01-30',
                                    INTERVAL 1 DAY)) AS day
      FROM users),
    j AS (
      SELECT s.user_id, s.day, d.v
      FROM spine s LEFT JOIN daily d
        ON d.user_id = s.user_id AND d.day = s.day),
    br AS (
      SELECT user_id, day, v,
             last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
             first_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY day
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
      FROM j)
    SELECT user_id, day, v AS v_obs,
           CASE
             WHEN v IS NOT NULL THEN CAST(FLOOR(1e6 * v + 0.5) AS BIGINT)
             WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
               CAST(FLOOR(1e6 * (pv + (nv - pv) *
                    (CAST(DATE_DIFF('day', pd, day) AS DOUBLE) /
                     CAST(DATE_DIFF('day', pd, nd) AS DOUBLE))) + 0.5) AS BIGINT)
             ELSE NULL
           END AS v_lin_q
    FROM br
    ORDER BY user_id, day
    """,
)
def timeseries_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3/F9 gen: dense daily spine with LINEAR interpolation across
    gaps — the numeric sibling of LOCF gap-fill for model-feature
    series (smoothed price/activity inputs; the reference's snapshot
    timeline consumers, /root/reference/main.py:44, want exactly this
    once gaps appear). Interior holes get the straight line between the
    bracketing observations; days before the first / after the last
    observation stay NULL (no extrapolation).

    Exactness discipline: the interpolation weight is a ratio of small
    day-count INTEGERS cast to double, the line is evaluated in the
    identical association on both engines, and the reported value is
    quantized to the 1e-6 grid — so the cross-engine hash compare is
    byte-stable despite the float multiply.

    Scale shape: one (user × day) spine join + TWO frames over ONE
    `user_id` shuffle+sort (Spark plans both the backward and forward
    frame inside the same Window exchange); no self-join, no Python.
    At 100 TB the spine explode is executor-side and the per-user
    series is the only sorted unit — same contract as gap_fill_locf."""
    ev = tbl(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(dsum("value", 4).alias("v"))
    users = ev.select("user_id").distinct()
    spine = users.select(
        "user_id",
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("timestamp"),
                F.lit("2024-01-30").cast("timestamp"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day"),
    )
    j = spine.join(daily, ["user_id", "day"], "left")
    wb = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("v").isNotNull(), F.col("day"))
    br = j.select(
        "user_id",
        "day",
        "v",
        F.last("v", ignorenulls=True).over(wb).alias("pv"),
        F.last(obs_day, ignorenulls=True).over(wb).alias("pd"),
        F.first("v", ignorenulls=True).over(wf).alias("nv"),
        F.first(obs_day, ignorenulls=True).over(wf).alias("nd"),
    )
    frac = F.datediff("day", "pd").cast("double") / F.datediff(
        "nd", "pd"
    ).cast("double")
    line = F.col("pv") + (F.col("nv") - F.col("pv")) * frac
    return br.select(
        "user_id",
        "day",
        F.col("v").alias("v_obs"),
        F.when(
            F.col("v").isNotNull(),
            F.floor(F.lit(1e6) * F.col("v") + F.lit(0.5)).cast("bigint"),
        )
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            F.floor(F.lit(1e6) * line + F.lit(0.5)).cast("bigint"),
        )
        .alias("v_lin_q"),
    ).orderBy("user_id", "day")


@register(
    "timeseries_holt_trend",
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT event_type, DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS day,
             (CAST(CAST(SUM(CAST(value AS DECIMAL(27,6))) * 1000000 AS BIGINT) AS DOUBLE) / 1000000.0) AS x
      FROM events WHERE event_type IS NOT NULL
      GROUP BY 1, 2),
    r AS (
      SELECT event_type, day, x,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn
      FROM daily),
    -- strict sequential replay (NOTE: list_reduce with a STRUCT
    -- accumulator miscomputes multi-step folds in DuckDB 1.0.0, so the
    -- 2-state recurrence recurses row-by-row instead)
    rec AS (
      SELECT event_type, day, x, rn,
             0.25 * x AS l, 0.125 * x AS b
      FROM r WHERE rn = 1
      UNION ALL
      SELECT r.event_type, r.day, r.x, r.rn,
             0.75 * rec.l + 0.75 * rec.b + 0.25 * r.x,
             -0.125 * rec.l + 0.875 * rec.b + 0.125 * r.x
      FROM rec JOIN r ON r.event_type = rec.event_type
                     AND r.rn = rec.rn + 1)
    SELECT event_type, day, x,
           CAST(FLOOR(1e6 * l + 0.5) AS BIGINT) AS level_q,
           CAST(FLOOR(1e6 * b + 0.5) AS BIGINT) AS trend_q,
           CAST(FLOOR(1e6 * (l + b) + 0.5) AS BIGINT) AS forecast_q
    FROM rec
    """,
)
def timeseries_holt_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8 gen: Holt double-exponential smoothing — level + trend + the
    one-step-ahead forecast (l + b) per event_type's daily volume
    series, computed by the SECOND-ORDER distributed affine scan
    (operators/recurrence.py `affine2_recurrence`): the (level, trend)
    state pair evolves as one constant 2×2 matrix recurrence, and
    affine maps on R² compose, so the same two-level shard-fold +
    summary-composition shape as the scalar EWMA applies — no per-key
    sequential task, no Window, no Python.

    α = 0.25, β = 0.5 — both exact binary doubles, so every matrix
    entry (0.75, −0.125, 0.875) is too; the re-associated scan is
    reconciled with the oracle's strict left fold on the 1e-6 grid
    (the EWMA discipline, unchanged)."""
    from rpa_etl_investing_spark.operators.caching import keep
    from rpa_etl_investing_spark.operators.prefix import with_id_range_shard
    from rpa_etl_investing_spark.operators.recurrence import holt

    ev = tbl(spark, sf_dir, "events")
    daily = keep(
        ev.filter(F.col("event_type").isNotNull())
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(dsum("value", 6).alias("x"))
        .withColumn(
            "ord", F.datediff(F.col("day"), F.lit("1970-01-01")).cast("bigint")
        )
    )
    sharded = with_id_range_shard(daily, "ord", n_shards=8)
    sm = holt(sharded, ["event_type"], "ord", "x", alpha=0.25, beta=0.5)
    lq = F.floor(F.lit(1e6) * F.col("level") + F.lit(0.5)).cast("bigint")
    tq = F.floor(F.lit(1e6) * F.col("trend") + F.lit(0.5)).cast("bigint")
    fq = F.floor(
        F.lit(1e6) * (F.col("level") + F.col("trend")) + F.lit(0.5)
    ).cast("bigint")
    return daily.join(sm, ["event_type", "ord"]).select(
        "event_type",
        "day",
        "x",
        lq.alias("level_q"),
        tq.alias("trend_q"),
        fq.alias("forecast_q"),
    )


@register(
    "timeseries_seasonal_naive_eval",
    oracle="""
    WITH daily AS (
      SELECT event_type, DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS day,
             CAST(SUM(CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
               AS xq
      FROM events WHERE event_type IS NOT NULL
      GROUP BY 1, 2),
    j AS (
      SELECT a.event_type, a.day, a.xq, f.xq AS fq
      FROM daily a JOIN daily f
        ON a.event_type = f.event_type
       AND f.day = a.day - INTERVAL 7 DAY)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(ABS(xq - fq)) AS BIGINT) AS sum_abs_err_q,
           CAST(FLOOR(1e6 * (CAST(SUM(ABS(xq - fq)) AS DOUBLE)
                             / SUM(ABS(xq))) + 0.5) AS BIGINT) AS wape_q
    FROM j
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def timeseries_seasonal_naive_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W-gen: forecast-baseline evaluation — the seasonal-naive forecast
    (ŷ_t = y_{t−7}, the weekly-seasonality baseline every real forecast
    must beat) scored per event_type with exact integer errors: day
    totals in 1e-6 micro-units (BIGINT), absolute errors summed as
    BIGINTs, and WAPE (Σ|err|/Σ|y|, the scale-free accuracy metric
    robust to zero days) quantized once at the end.

    Scale shape: the lag-7 lookup is a keyed SELF-JOIN on
    (type, day−7) — no ordered window over an unbounded per-type
    timeline, so the plan is two hash shuffles of the aggregated daily
    table regardless of history length; the raw fact is touched once by
    the daily aggregate."""
    ev = tbl(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type").isNotNull())
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.sum(
                F.floor(F.col("value") * 1e6 + F.lit(0.5)).cast("bigint")
            )
            .cast("bigint")
            .alias("xq")
        )
    )
    f = daily.select(
        "event_type",
        (F.col("day") + F.expr("INTERVAL 7 DAY")).alias("day"),
        F.col("xq").alias("fq"),
    )
    j = daily.join(f, ["event_type", "day"])
    return (
        j.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_days"),
            F.sum(F.abs(F.col("xq") - F.col("fq")))
            .cast("bigint")
            .alias("sum_abs_err_q"),
            F.floor(
                F.lit(1e6)
                * (
                    F.sum(F.abs(F.col("xq") - F.col("fq"))).cast("double")
                    / F.sum(F.abs(F.col("xq")))
                )
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("wape_q"),
        )
        .orderBy("event_type")
    )


@register(
    "timeseries_autocorrelation",
    oracle="""
    WITH daily AS (
      SELECT event_type, DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS day,
             CAST(SUM(CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
               AS xq
      FROM events WHERE event_type IS NOT NULL
      GROUP BY 1, 2),
    shifted AS (
      SELECT event_type, day + TO_DAYS(CAST(lag AS INT)) AS day,
             lag, xq AS yq
      FROM daily CROSS JOIN UNNEST(RANGE(1, 8)) AS t(lag)),
    p AS (
      SELECT d.event_type, s.lag, d.xq, s.yq
      FROM daily d JOIN shifted s
        ON d.event_type = s.event_type AND d.day = s.day),
    m AS (
      SELECT event_type, lag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(xq) AS DECIMAL(38,0)) AS sx,
             CAST(SUM(yq) AS DECIMAL(38,0)) AS sy,
             CAST(SUM(CAST(xq AS DECIMAL(19,0)) * yq) AS DECIMAL(38,0)) AS sxy,
             CAST(SUM(CAST(xq AS DECIMAL(19,0)) * xq) AS DECIMAL(38,0)) AS sxx,
             CAST(SUM(CAST(yq AS DECIMAL(19,0)) * yq) AS DECIMAL(38,0)) AS syy
      FROM p GROUP BY event_type, lag)
    SELECT event_type, CAST(lag AS BIGINT) AS lag, n,
           CAST(FLOOR(1e6 * ((n * CAST(sxy AS DOUBLE)
                              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                             / SQRT((n * CAST(sxx AS DOUBLE)
                                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                                    * (n * CAST(syy AS DOUBLE)
                                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))
                      + 0.5) AS BIGINT) AS acf_q
    FROM m
    ORDER BY event_type, lag
    """,
)
def timeseries_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W-gen: lag-1..7 autocorrelation (the ACF head — the seasonality
    detector that justifies the seasonal-naive baseline's lag choice)
    per event_type, computed with ZERO ordered windows: the lagged
    pairing is ONE keyed join of the daily table against a 7×-exploded
    day-shifted copy, so the plan is two hash shuffles of the
    aggregated series whatever the history length. Day totals are
    exact 1e-6 integer units; all power sums accumulate in DECIMAL(38)
    (cross-products of 1e12-scale units overflow BIGINT); Pearson r
    per (type, lag) is one deterministic IEEE expression — sqrt is
    correctly rounded by IEEE 754, identical on both engines —
    quantized to 1e-6 at the end."""
    ev = tbl(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type").isNotNull())
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.sum(
                F.floor(F.col("value") * 1e6 + F.lit(0.5)).cast("bigint")
            )
            .cast("bigint")
            .alias("xq")
        )
    )
    shifted = daily.select(
        "event_type",
        F.explode(F.sequence(F.lit(1), F.lit(7))).alias("lag"),
        "day",
        F.col("xq").alias("yq"),
    ).select(
        "event_type",
        F.expr("day + make_interval(0, 0, 0, lag)").alias("day"),
        "lag",
        "yq",
    )
    p = daily.join(shifted, ["event_type", "day"])
    m = p.groupBy("event_type", "lag").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("xq").cast("decimal(38,0)").alias("sx"),
        F.sum("yq").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("xq").cast("decimal(19,0)") * F.col("yq"))
        .cast("decimal(38,0)")
        .alias("sxy"),
        F.sum(F.col("xq").cast("decimal(19,0)") * F.col("xq"))
        .cast("decimal(38,0)")
        .alias("sxx"),
        F.sum(F.col("yq").cast("decimal(19,0)") * F.col("yq"))
        .cast("decimal(38,0)")
        .alias("syy"),
    )
    num = F.col("n") * F.col("sxy").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sy").cast("double")
    den = F.sqrt(
        (
            F.col("n") * F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx").cast("double")
        )
        * (
            F.col("n") * F.col("syy").cast("double")
            - F.col("sy").cast("double") * F.col("sy").cast("double")
        )
    )
    return m.select(
        "event_type",
        F.col("lag").cast("bigint").alias("lag"),
        "n",
        F.floor(F.lit(1e6) * (num / den) + F.lit(0.5))
        .cast("bigint")
        .alias("acf_q"),
    ).orderBy("event_type", "lag")


@register(
    "timeseries_downsample_lttb",
    oracle="""
    WITH daily AS (
      SELECT event_type, DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS day,
             CAST(SUM(CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
               AS yq
      FROM events WHERE event_type IS NOT NULL
      GROUP BY 1, 2),
    r AS (
      SELECT event_type, day, yq,
             CAST(DATE_DIFF('day', DATE '1970-01-01', CAST(day AS DATE))
                  AS BIGINT) AS xd,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) - 1
               AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM daily),
    b AS (SELECT *, CAST((rn * 10) // n AS BIGINT) AS bucket FROM r),
    nb AS (
      SELECT event_type, bucket,
             CAST(COUNT(*) AS BIGINT) AS bn,
             CAST(SUM(xd) AS BIGINT) AS sx,
             CAST(SUM(yq) AS BIGINT) AS sy
      FROM b GROUP BY event_type, bucket),
    a AS (
      SELECT b.event_type, b.bucket, b.day, b.yq,
             CASE WHEN p.bn IS NULL OR q.bn IS NULL THEN NULL
                  ELSE ABS((CAST(p.sx AS HUGEINT) * q.bn
                            - CAST(q.sx AS HUGEINT) * p.bn)
                           * (CAST(b.yq AS HUGEINT) * p.bn - p.sy)
                           - (CAST(p.sx AS HUGEINT) - CAST(b.xd AS HUGEINT) * p.bn)
                           * (CAST(q.sy AS HUGEINT) * p.bn
                              - CAST(p.sy AS HUGEINT) * q.bn)) END AS area2
      FROM b
      LEFT JOIN nb p ON b.event_type = p.event_type AND p.bucket = b.bucket - 1
      LEFT JOIN nb q ON b.event_type = q.event_type AND q.bucket = b.bucket + 1)
    SELECT event_type, bucket, day, yq
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                                   ORDER BY area2 DESC NULLS LAST, day) AS rk
      FROM a)
    WHERE rk = 1
    ORDER BY event_type, bucket
    """,
)
def timeseries_downsample_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W-gen: LTTB downsampling (Steinarsson's Largest-Triangle-Three-
    Buckets — the standard chart-rendering reducer: keep the point per
    bucket that subtends the largest triangle with its neighbors, so
    peaks and shape survive where naive striding flattens them). This
    is the PARALLEL mean-neighbor variant: neighbors are the adjacent
    buckets' centroids rather than the previously-selected point —
    strict LTTB's selection chain is sequential; the mean-neighbor form
    is the one a distributed engine can run in two hash aggregates +
    one per-bucket argmax, and is the variant charting libraries ship
    for exactly that reason.

    Exactness: the triangle area comparison is cleared of denominators
    (multiply by pbn²·nbn > 0, constant within a bucket, so the argmax
    is unchanged) — every candidate's score is an exact INTEGER in
    DECIMAL(38,0)/HUGEINT, ties break on earliest day, and edge buckets
    (no neighbor on one side) deterministically fall back to their
    earliest point. No float exists anywhere in the query."""
    ev = tbl(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type").isNotNull())
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.sum(
                F.floor(F.col("value") * 1e6 + F.lit(0.5)).cast("bigint")
            )
            .cast("bigint")
            .alias("yq")
        )
    )
    w = Window.partitionBy("event_type").orderBy("day")
    r = daily.select(
        "event_type",
        "day",
        "yq",
        F.datediff(F.col("day"), F.lit("1970-01-01")).cast("bigint").alias("xd"),
        (F.row_number().over(w) - 1).alias("rn"),
        F.count("*").over(Window.partitionBy("event_type")).alias("n"),
    )
    b = r.withColumn("bucket", F.expr("CAST((rn * 10) div n AS BIGINT)"))
    nb = b.groupBy("event_type", "bucket").agg(
        F.count("*").cast("bigint").alias("bn"),
        F.sum("xd").cast("bigint").alias("sx"),
        F.sum("yq").cast("bigint").alias("sy"),
    )
    p = nb.select(
        "event_type",
        (F.col("bucket") + 1).alias("bucket"),
        F.col("bn").alias("pbn"),
        F.col("sx").alias("psx"),
        F.col("sy").alias("psy"),
    )
    q = nb.select(
        "event_type",
        (F.col("bucket") - 1).alias("bucket"),
        F.col("bn").alias("nbn"),
        F.col("sx").alias("nsx"),
        F.col("sy").alias("nsy"),
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    area2 = F.when(
        F.col("pbn").isNull() | F.col("nbn").isNull(), F.lit(None)
    ).otherwise(
        F.abs(
            (d38("psx") * F.col("nbn") - d38("nsx") * F.col("pbn"))
            * (d38("yq") * F.col("pbn") - F.col("psy"))
            - (d38("psx") - d38("xd") * F.col("pbn"))
            * (d38("nsy") * F.col("pbn") - d38("psy") * F.col("nbn"))
        )
    )
    a = (
        b.join(p, ["event_type", "bucket"], "left")
        .join(q, ["event_type", "bucket"], "left")
        .withColumn("area2", area2)
    )
    wk = Window.partitionBy("event_type", "bucket").orderBy(
        F.desc_nulls_last("area2"), F.asc("day")
    )
    return (
        a.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") == 1)
        .select("event_type", "bucket", "day", "yq")
        .orderBy("event_type", "bucket")
    )


@register(
    "timeseries_time_weighted_avg",
    oracle="""
    WITH e AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
             CAST(CAST(value AS DECIMAL(9,2)) * 100 AS BIGINT) AS v_q
      FROM events),
    w AS (
      SELECT user_id, v_q, epoch_us(ts) AS t_us,
             LEAD(epoch_us(ts)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS t_next
      FROM e)
    SELECT user_id,
           CAST(SUM(t_next - t_us) AS BIGINT) AS dt_us,
           CAST(CAST(SUM(CAST(v_q AS DECIMAL(18,0))
                         * CAST(t_next - t_us AS DECIMAL(18,0))) AS DOUBLE)
                / CAST(SUM(t_next - t_us) * 100 AS DOUBLE) AS DOUBLE) AS twap
    FROM w WHERE t_next IS NOT NULL
    GROUP BY user_id ORDER BY user_id
    """,
)
def timeseries_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3+/T-series: time-weighted average value per user (TWAP) — each
    observation holds until the next one, so its weight is the exact
    microsecond interval to the successor (the last observation of a
    user carries no weight; an interval-to-window-end variant just adds
    a COALESCE bound). The money-grain value is quantized once to the
    1e-2 grid; the numerator Σ(v·Δt) accumulates in DECIMAL(38,0) —
    per-row products up to 1e36 stay exact, so no value/interval
    combination can silently wrap a BIGINT — and the denominator Σ(Δt)
    is a BIGINT bounded by the observation SPAN (a user's intervals are
    disjoint, so the sum telescopes) regardless of row count. Both are
    exact in any accumulation order; the single double division at the
    end cannot differ between engines.

    Scale shape: one lead() window per user partition (high-cardinality
    key — scales out), then one hash aggregate on the same key, which
    the window's shuffle already satisfies: one exchange total."""
    e = tbl(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        (F.col("value").cast("decimal(9,2)") * 100).cast("bigint").alias("v_q"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet ts arrives NTZ; the session TZ is pinned UTC, so the cast
    # to instant is lossless and matches the oracle's epoch_us
    t_us = F.unix_micros(F.col("ts").cast("timestamp"))
    d = e.select(
        "user_id",
        "v_q",
        t_us.alias("t_us"),
        F.lead(t_us).over(w).alias("t_next"),
    ).where(F.col("t_next").isNotNull())
    dt = F.col("t_next") - F.col("t_us")
    return (
        d.groupBy("user_id")
        .agg(
            F.sum(
                F.col("v_q").cast("decimal(18,0)") * dt.cast("decimal(18,0)")
            ).alias("vt_dec"),
            F.sum(dt).alias("dt_us"),
        )
        .select(
            "user_id",
            "dt_us",
            (
                F.col("vt_dec").cast("double")
                / (F.col("dt_us") * 100).cast("double")
            ).cast("double").alias("twap"),
        )
        .orderBy("user_id")
    )


@register(
    "timeseries_cumulative_distinct_users",
    oracle="""
    WITH u AS (
      SELECT user_id, MIN(DATE_TRUNC('day', CAST(ts AS TIMESTAMP))) AS first_day
      FROM events GROUP BY 1),
    d AS (SELECT first_day AS day, CAST(COUNT(*) AS BIGINT) AS new_users
          FROM u GROUP BY 1)
    SELECT day, new_users,
           CAST(SUM(new_users) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_users
    FROM d ORDER BY day
    """,
)
def timeseries_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3+/A3+: cumulative distinct users per day — the growth curve
    every analytics consumer asks for, computed WITHOUT a running
    COUNT(DISTINCT) window (which would carry a per-day distinct state
    proportional to the user base): a user contributes exactly on their
    FIRST-seen day, so one per-user MIN aggregate reduces the fact to
    one row per user, daily news are a second tiny aggregate, and the
    running total is a window over the day spine (≤ observation span
    rows regardless of user count).

    Scale shape: one user_id hash aggregate over the fact (the only
    fact-sized shuffle), then day-level work; the unpartitioned window
    is bounded by calendar days, the same argument as
    timeseries_vwap_anomaly."""
    ev = tbl(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", F.col("ts").cast("timestamp"))).alias(
            "first_day"
        )
    )
    d = u.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    # bounded-window: calendar-day relation (one row per day)
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return d.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).alias("cum_users"),
    ).orderBy("day")


@register(
    "timeseries_holt_damped",
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT event_type, DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS day,
             (CAST(CAST(SUM(CAST(value AS DECIMAL(27,6))) * 1000000 AS BIGINT) AS DOUBLE) / 1000000.0) AS x
      FROM events WHERE event_type IS NOT NULL
      GROUP BY 1, 2),
    r AS (
      SELECT event_type, day, x,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn
      FROM daily),
    -- strict sequential replay, row-by-row (the DuckDB list_reduce
    -- STRUCT-accumulator caveat from timeseries_holt_trend applies)
    rec AS (
      SELECT event_type, day, x, rn,
             0.25 * x AS l, 0.125 * x AS b
      FROM r WHERE rn = 1
      UNION ALL
      SELECT r.event_type, r.day, r.x, r.rn,
             0.75 * rec.l + 0.65625 * rec.b + 0.25 * r.x,
             -0.125 * rec.l + 0.765625 * rec.b + 0.125 * r.x
      FROM rec JOIN r ON r.event_type = rec.event_type
                     AND r.rn = rec.rn + 1)
    SELECT event_type, day, x,
           CAST(FLOOR(1e6 * l + 0.5) AS BIGINT) AS level_q,
           CAST(FLOOR(1e6 * b + 0.5) AS BIGINT) AS trend_q,
           CAST(FLOOR(1e6 * (l + 0.875 * b) + 0.5) AS BIGINT) AS forecast_q
    FROM rec
    """,
)
def timeseries_holt_damped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W11+ (r6): DAMPED-trend Holt smoothing (Gardner & McKenzie) —
    the forecasting-practice default the undamped `timeseries_holt_trend`
    is the φ=1 special case of: the trend decays by φ each step so the
    one-step forecast is l + φ·b and long horizons flatten. The damped
    pair is STILL one constant 2×2 affine recurrence
    (A = [[1−α, (1−α)φ], [−αβ, φ(1−αβ)]]), so the identical
    distributed two-level scan solves it — the point of registering
    the variant: the recurrence machinery generalizes by changing four
    literals, not the plan.

    α = 0.25, β = 0.5, φ = 0.875 — every matrix entry (0.75, 0.65625,
    −0.125, 0.765625) is an exact binary double; the re-associated
    scan reconciles with the oracle's strict row-by-row recursive
    replay on the 1e-6 grid (the EWMA discipline)."""
    from rpa_etl_investing_spark.operators.caching import keep
    from rpa_etl_investing_spark.operators.prefix import with_id_range_shard
    from rpa_etl_investing_spark.operators.recurrence import holt_damped

    ev = tbl(spark, sf_dir, "events")
    daily = keep(
        ev.filter(F.col("event_type").isNotNull())
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(dsum("value", 6).alias("x"))
        .withColumn(
            "ord", F.datediff(F.col("day"), F.lit("1970-01-01")).cast("bigint")
        ),
        scope="holt_damped_daily",
    )
    sharded = with_id_range_shard(daily, "ord", n_shards=8)
    sm = holt_damped(
        sharded, ["event_type"], "ord", "x", alpha=0.25, beta=0.5, phi=0.875
    )
    lq = F.floor(F.lit(1e6) * F.col("level") + F.lit(0.5)).cast("bigint")
    tq = F.floor(F.lit(1e6) * F.col("trend") + F.lit(0.5)).cast("bigint")
    fq = F.floor(
        F.lit(1e6) * (F.col("level") + F.lit(0.875) * F.col("trend")) + F.lit(0.5)
    ).cast("bigint")
    return daily.join(sm, ["event_type", "ord"]).select(
        "event_type",
        "day",
        "x",
        lq.alias("level_q"),
        tq.alias("trend_q"),
        fq.alias("forecast_q"),
    )


# ---- r7: two-threshold hysteresis alarm -------------------------------------


@register(
    "timeseries_hysteresis_alarm",
    oracle="""
    WITH daily AS (
      SELECT event_type, DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS day,
             CAST(SUM(CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
               AS xq
      FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
      GROUP BY 1, 2),
    stats AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(xq) AS BIGINT) AS tot
      FROM daily GROUP BY event_type),
    marked AS (
      SELECT d.event_type, d.day, d.xq,
             MAX(CASE WHEN 5::HUGEINT * d.xq * s.n > 6::HUGEINT * s.tot
                      THEN d.day END)
               OVER (PARTITION BY d.event_type ORDER BY d.day
                     ROWS UNBOUNDED PRECEDING) AS last_hi,
             MAX(CASE WHEN 10::HUGEINT * d.xq * s.n <= 9::HUGEINT * s.tot
                      THEN d.day END)
               OVER (PARTITION BY d.event_type ORDER BY d.day
                     ROWS UNBOUNDED PRECEDING) AS last_lo
      FROM daily d JOIN stats s ON s.event_type = d.event_type)
    SELECT event_type, day, xq,
           last_hi IS NOT NULL AND (last_lo IS NULL OR last_hi > last_lo)
             AS alarm
    FROM marked ORDER BY event_type, day
    """,
)
def timeseries_hysteresis_alarm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r7 alerting pattern: two-threshold HYSTERESIS alarm over the
    daily value total per event type — the alarm ARMS when a day
    exceeds 1.2× the type's mean and stays armed until a day falls to
    ≤ 0.9× the mean (the debounce every production alerting system
    uses so a metric oscillating around one threshold doesn't flap).

    The textbook formulation is a per-row stateful recurrence
    (alarm_t = hi_t OR (alarm_{t−1} AND NOT lo_t)) — a scan. Spark
    solves it CLOSED-FORM in one window pass: the alarm is on exactly
    when the most recent boundary event was a hi-crossing, i.e.
    last_hi > last_lo over two running conditional MAX windows that
    share one (type, day-order) sort. No iterative state, no UDF, no
    applyInPandasWithState for the batch form.

    Exactness discipline: day totals are exact 1e-6-grid BIGINTs; both
    thresholds are exact cross-multiplied integer inequalities
    (5·x·n > 6·Σx for hi, 10·x·n ≤ 9·Σx for lo) — no float anywhere,
    so the alarm bits are cross-engine exact by construction. The
    cross-products are widened to DECIMAL(38,0) (Spark) / HUGEINT
    (DuckDB) before multiplying (r8 advice #3): in BIGINT, 10·xq·n
    overflows at ~2^63/10 grid-day units, where non-ANSI Spark would
    wrap silently while DuckDB raises; the widened form is exact to
    10^38 — unreachable for any fixture scale.

    Scale shape: one fact hash-aggregate to the calendar-bounded daily
    relation, a |types|-row stats broadcast, one window sort over
    (types × days) rows — alerting at 100 TB costs one fact pass."""
    ev = tbl(spark, sf_dir, "events")
    vq = F.floor(F.col("value") * F.lit(1e6) + F.lit(0.5)).cast("bigint")
    daily = (
        ev.filter(F.col("value").isNotNull() & F.col("event_type").isNotNull())
        .groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts").cast("timestamp")).alias("day"),
        )
        .agg(F.sum(vq).cast("bigint").alias("xq"))
    )
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("xq").cast("bigint").alias("tot"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = daily.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "day",
        "xq",
        F.max(
            F.when(
                F.lit(5).cast("decimal(38,0)") * F.col("xq") * F.col("n")
                > F.lit(6).cast("decimal(38,0)") * F.col("tot"),
                F.col("day"),
            )
        )
        .over(w)
        .alias("last_hi"),
        F.max(
            F.when(
                F.lit(10).cast("decimal(38,0)") * F.col("xq") * F.col("n")
                <= F.lit(9).cast("decimal(38,0)") * F.col("tot"),
                F.col("day"),
            )
        )
        .over(w)
        .alias("last_lo"),
    )
    return m.select(
        "event_type",
        "day",
        "xq",
        (
            F.col("last_hi").isNotNull()
            & (F.col("last_lo").isNull() | (F.col("last_hi") > F.col("last_lo")))
        ).alias("alarm"),
    ).orderBy("event_type", "day")
