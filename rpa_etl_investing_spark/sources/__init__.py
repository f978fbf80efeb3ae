"""Source/sink surface (SURVEY §2.1 S8): CSV/JSON readers with
malformed-row handling, partitioned parquet writers."""

from rpa_etl_investing_spark.sources.formats import (  # noqa: F401
    read_csv,
    read_json,
    scratch_dir,
    split_rejects,
    write_partitioned_parquet,
)

from rpa_etl_investing_spark.sources.formats import compact_parquet  # noqa: F401,E402
