"""UDF / UDAF / grouped-map surface (SURVEY §2.11).

The reference's 'UDFs' are inline Python row expressions during
scraping (``/root/reference/main.py:100-106``). Policy: the flagship
path never needs Python (F1-F5 compile to built-ins); this module
demonstrates each Python-extension point with Arrow-vectorized forms —
pandas_udf scalar, GROUPED_AGG, applyInPandas, mapInPandas — on
deterministic integer/string logic so even the slow path stays
oracle-checkable.
"""

from __future__ import annotations

import pandas as pd
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rpa_etl_investing_spark.catalog import tbl
from rpa_etl_investing_spark.plans.registry import register


@register(
    "udf_pandas_scalar_parse",
    oracle="""
    SELECT o_orderkey,
           CAST(REPLACE(REPLACE(TRIM(br_text), '.', ''), ',', '.') AS DOUBLE) AS parsed
    FROM (
      SELECT o_orderkey,
             REPLACE(FORMAT('{:,}', o_orderkey * 11 % 10000000), ',', '.') || ','
               || LPAD(CAST(o_orderkey % 100 AS VARCHAR), 2, '0') AS br_text
      FROM orders)
    """,
)
def udf_pandas_scalar_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF (Arrow-vectorized): the reference's locale parse
    (main.py:101-103) in Python — ~10-100× faster than a row-at-a-time
    UDF, still off the flagship path by design."""

    @F.pandas_udf("double")
    def parse_br(s: pd.Series) -> pd.Series:
        return pd.to_numeric(
            s.str.strip().str.replace(".", "", regex=False).str.replace(",", ".", regex=False),
            errors="coerce",
        )

    o = tbl(spark, sf_dir, "orders")
    br_text = F.concat(
        F.regexp_replace(F.format_string("%,d", (F.col("o_orderkey") * 11) % 10000000), ",", "."),
        F.lit(","),
        F.lpad((F.col("o_orderkey") % 100).cast("string"), 2, "0"),
    )
    return o.select("o_orderkey", parse_br(br_text).alias("parsed"))


@register(
    "udf_grouped_agg_spread",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           MAX(l_extendedprice) - MIN(l_extendedprice) AS price_spread
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def udf_grouped_agg_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF (vectorized UDAF): per-group max−min
    (order-independent, so the Python path stays hash-exact)."""

    @F.pandas_udf("double")
    def spread(v: pd.Series) -> float:
        return float(v.max() - v.min())

    return (
        tbl(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(spread("l_extendedprice").alias("price_spread"))
    )


@register(
    "udf_grouped_map_center",
    oracle="""
    SELECT l_returnflag, l_orderkey, l_linenumber,
           l_extendedprice - MIN(l_extendedprice) OVER (PARTITION BY l_returnflag) AS price_centered
    FROM lineitem
    """,
)
def udf_grouped_map_center(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map: per-group transform (center on the
    group min — exact double op). The whole group arrives as one pandas
    DataFrame; at scale groups must fit in executor memory, which is why
    the built-in window form is preferred when expressible."""

    schema = T.StructType(
        [
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("price_centered", T.DoubleType()),
        ]
    )

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf[["l_returnflag", "l_orderkey", "l_linenumber"]].copy()
        out["price_centered"] = pdf["l_extendedprice"] - pdf["l_extendedprice"].min()
        return out

    return (
        tbl(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
        .groupBy("l_returnflag")
        .applyInPandas(center, schema)
    )


@register(
    "udf_map_in_pandas_tokens",
    oracle="""
    SELECT doc_id, LEN(STRING_SPLIT(text, ' ')) AS n_tokens, UPPER(lang) AS lang_u
    FROM documents WHERE doc_id < 100
    """,
)
def udf_map_in_pandas_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas: per-partition Arrow-batch iterator — the custom-scan /
    custom-operator extension point (also the multimodal decode vehicle,
    see multimodal/binary_ops.py)."""

    def fn(batches):
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tokens": pdf["text"].str.split(" ").str.len().astype("int32"),
                    "lang_u": pdf["lang"].str.upper(),
                }
            )
            yield out

    d = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.mapInPandas(fn, "doc_id long, n_tokens int, lang_u string")


@register(
    "udf_cogroup_user_activity",
    oracle="""
    SELECT COALESCE(c.user_id, p.user_id) AS user_id,
           CAST(COALESCE(c.n, 0) AS BIGINT) AS n_clicks,
           CAST(COALESCE(p.n, 0) AS BIGINT) AS n_purchases
    FROM (SELECT user_id, COUNT(*) AS n FROM events
          WHERE event_type = 'click' GROUP BY user_id) c
    FULL JOIN (SELECT user_id, COUNT(*) AS n FROM events
               WHERE event_type = 'purchase' GROUP BY user_id) p
      ON c.user_id = p.user_id
    """,
)
def udf_cogroup_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cogroup().applyInPandas (§2.11): two keyed streams aligned per
    key in one pass — each side arrives as its own pandas frame. The
    built-in form is a full outer join of two aggregates (the oracle);
    cogroup is the extension point for logic joins can't express
    (per-key sequence alignment, custom attribution)."""

    def stats(key, clicks: pd.DataFrame, purchases: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_clicks": [len(clicks)],
                "n_purchases": [len(purchases)],
            }
        )

    ev = tbl(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "event_id")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "event_id")
    return (
        clicks.groupBy("user_id")
        .cogroup(purchases.groupBy("user_id"))
        .applyInPandas(stats, "user_id bigint, n_clicks bigint, n_purchases bigint")
    )


@register(
    "udf_map_in_arrow_lengths",
    oracle="""
    SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS n_chars
    FROM documents
    """,
)
def udf_map_in_arrow_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.11 zero-copy variant: ``mapInArrow`` — the partition iterator
    receives raw Arrow RecordBatches (no pandas materialization at
    all), computes UTF-8 lengths with Arrow compute kernels, and yields
    Arrow back. The leanest Python hook Spark offers: when the Python
    side only needs columnar kernels, skipping the pandas conversion
    removes the last per-batch copy ``mapInPandas`` pays. Same
    batch-shape contract as the pandas form, demonstrated against the
    same documents fixture."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def lengths(batches):
        for batch in batches:
            tbl_ = pa.Table.from_batches([batch])
            yield pa.RecordBatch.from_arrays(
                [
                    tbl_.column("doc_id").combine_chunks(),
                    pc.cast(
                        pc.utf8_length(tbl_.column("text").combine_chunks()),
                        pa.int64(),
                    ),
                ],
                ["doc_id", "n_chars"],
            )

    docs = tbl(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInArrow(lengths, "doc_id bigint, n_chars bigint")


@register(
    "udf_pandas_iter_classify",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000 THEN 'high'
                WHEN o_totalprice >= 100000 THEN 'mid'
                ELSE 'low' END AS tier,
           CAST(1 AS BIGINT) AS n_inits
    FROM orders
    """,
)
def udf_pandas_iter_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-of-series pandas UDF (SCALAR_ITER) — the §2.11 form for
    EXPENSIVE PER-WORKER INITIALIZATION: the init (think: loading a
    tokenizer or an ONNX quality model) runs ONCE per Python worker
    before the batch loop, then every Arrow batch reuses it. The demo
    'model' is a deterministic threshold table so the classification is
    oracle-checkable, and the UDF emits the per-row count of inits its
    worker performed — the oracle pins it at exactly 1, turning the
    amortization claim itself into a checked fact (a plain SCALAR udf
    cannot even express the distinction).

    Scale note: at 100 TB with a real model this is the difference
    between one model load per ~10k-row batch and one per executor
    worker — the canonical reason SCALAR_ITER exists."""
    @F.pandas_udf("string")
    def classify(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # expensive init: runs once per worker, NOT per batch
        n_inits = 1
        thresholds = [(300000.0, "high"), (100000.0, "mid")]

        def tier(v: float) -> str:
            for cut, name in thresholds:
                if v >= cut:
                    return name
            return "low"

        for s in batches:
            yield s.map(tier) + "|" + str(n_inits)

    o = tbl(spark, sf_dir, "orders")
    out = o.select("o_orderkey", classify(F.col("o_totalprice")).alias("r"))
    return out.select(
        "o_orderkey",
        F.split("r", "\\|")[0].alias("tier"),
        F.split("r", "\\|")[1].cast("bigint").alias("n_inits"),
    )
