"""Custom Python DataSource: the reference's extract boundary, Spark-native.

The reference scrapes three investing.com index pages with a headless
browser and emits row dicts of locale-formatted strings
(``/root/reference/main.py:86-120``). SURVEY §7.5 keeps live HTTP out of
the engine; this module replaces it with a **Spark 4 Python DataSource**
(``pyspark.sql.datasource``): each country page is an
``InputPartition`` (pages fetch in parallel across executors, unlike
the reference's sequential awaits), and rows are generated
deterministically from integer arithmetic so the DuckDB oracle can
reproduce the expected *parsed* values without ever seeing the strings.

The source yields exactly the reference's in-flight schema
(``main.py:108-115``) with Brazilian locale formatting ("128.594,07",
"+1,25%"), so the downstream locale parsers (functions/locale.py) are
exercised against realistic text. At real scale the same class shape
wraps an actual paginated HTTP/API: ``partitions()`` enumerates pages,
``read()`` fetches one page executor-side — the driver never touches
row data.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

COUNTRIES = ["Brasil", "China", "EUA"]
DEFAULT_ROWS_PER_PAGE = 40

# Brazil page shows the real index names (cycled); sector classification
# downstream resolves them through etl/sector_maps.py.
def _brazil_names() -> list[str]:
    from rpa_etl_investing_spark.etl.sector_maps import SECTOR_BY_BRAZIL_INDEX

    return list(SECTOR_BY_BRAZIL_INDEX)


def _cents(ci: int, i: int) -> int:
    return (ci * 1_000_003 + i * 7_919) % 10_000_000 + 1_000


def _var_bp(ci: int, i: int) -> int:
    return (i * 31 + ci * 17) % 1_001 - 500


def _br_format(cents: int) -> str:
    """12859407 → '128.594,07' (dot thousands, comma decimals)."""
    int_part, frac = divmod(cents, 100)
    return f"{int_part:,}".replace(",", ".") + f",{frac:02d}"


def _pct_format(bp: int) -> str:
    """+125 basis points → '+1,25%'."""
    sign = "+" if bp >= 0 else "-"
    int_part, frac = divmod(abs(bp), 100)
    return f"{sign}{int_part},{frac:02d}%"


def page_rows(country: str, n_rows: int) -> Iterator[tuple]:
    """Deterministic scrape-shaped rows for one country page."""
    ci = COUNTRIES.index(country)
    names = _brazil_names()
    for i in range(n_rows):
        if country == "Brasil":
            nome = names[i % len(names)]
        else:
            nome = f"{country} Index {i}"
        cents = _cents(ci, i)
        maxima = cents + (i % 500) * 3 + 1
        minima = max(0, cents - (i % 400) * 2 - 1)
        yield (
            country,
            nome,
            _br_format(cents),
            _br_format(maxima),
            _br_format(minima),
            _pct_format(_var_bp(ci, i)),
        )


class PagePartition(InputPartition):
    def __init__(self, country: str, n_rows: int):
        self.country = country
        self.n_rows = n_rows


class IndexPageReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("rows_per_page", DEFAULT_ROWS_PER_PAGE))

    def partitions(self) -> Sequence[InputPartition]:
        return [PagePartition(c, self.n_rows) for c in COUNTRIES]

    def read(self, partition: PagePartition) -> Iterator[tuple]:
        return page_rows(partition.country, partition.n_rows)


class IndexPageDataSource(DataSource):
    """``spark.read.format("investing_pages")`` — one partition per page."""

    @classmethod
    def name(cls) -> str:
        return "investing_pages"

    def schema(self) -> str:
        return (
            "pais string, nome string, valor_atual string, "
            "maxima string, minima string, variacao string"
        )

    def reader(self, schema) -> IndexPageReader:
        return IndexPageReader(self.options)


def scrape_frame(spark, rows_per_page: int = DEFAULT_ROWS_PER_PAGE):
    """Register the DataSource and return the scraped pages in the raw
    ETL schema (``RAW_SCRAPE_SCHEMA`` column names — the in-flight shape
    of ``main.py:108-115``), ready for ``etl.pipeline.transform_raw``."""
    from pyspark.sql import functions as F

    spark.dataSource.register(IndexPageDataSource)
    return (
        spark.read.format("investing_pages")
        .option("rows_per_page", str(rows_per_page))
        .load()
        .select(
            "nome",
            F.col("valor_atual").alias("valor_atual_raw"),
            F.col("maxima").alias("maxima_raw"),
            F.col("minima").alias("minima_raw"),
            F.col("variacao").alias("variacao_raw"),
            "pais",
        )
    )
