"""Local stand-in for the driver's correctness gate.

Runs a registry query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, column names, and
order-insensitive exact values — stricter than (and therefore safe for)
the driver's value-hash comparison.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from rpa_etl_investing_spark.catalog import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os
    import tempfile

    con = duckdb.connect()
    # Per-connection spill directory: concurrent connections (the
    # --threads sweep, parallel probe processes in the same cwd) all
    # default to ./.tmp/duckdb_temp_storage-*.tmp and corrupt each
    # other's spill files ("Could not read enough bytes" mid-query on
    # the closure-heavy oracles at sf1).
    con.execute(
        f"SET temp_directory = '{tempfile.mkdtemp(prefix='duckspill_')}'"
    )
    # DuckDB defaults its memory_limit to ~80% of PHYSICAL RAM, which
    # on a box also hosting Spark driver JVMs starves the Python
    # process itself (observed: MemoryError on a 718 KiB numpy alloc
    # while an oracle spilled). The oracle queries are fixture-scale;
    # a fixed cap keeps the comparator a good citizen and failures
    # inside DuckDB (spill) instead of random host-wide OOM.
    con.execute("SET memory_limit = '24GB'")
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # driver fixtures are single files; derived scale fixtures
        # (scripts/make_scale_fixture.py) are Spark-written DIRECTORIES
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _normalize_nested(v):
    """Recursively turn ndarray/list/dict cell values into plain tuples so
    ``astype(str)`` spells them identically for both engines; numpy ints and
    Python ints also stringify the same once unboxed via ``.item()``."""
    if isinstance(v, np.ndarray):
        return tuple(_normalize_nested(x) for x in v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(_normalize_nested(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _normalize_nested(x)) for k, x in v.items()))
    if isinstance(v, np.generic):
        return v.item()
    return v


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize dtypes, sort rows."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dtype, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            # pandas nullable Int64 (from outer joins) and numpy ints both → Float64
            # when nulls present, else int64
            if s.isna().any():
                df[c] = s.astype("Float64").astype("float64")
            else:
                df[c] = s.astype("int64")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("bool") if not s.isna().any() else s.astype("object")
        else:
            # Arrays/maps arrive as numpy arrays (Arrow sessions) or Python
            # lists (plain sessions) — normalize both to tuples so the
            # string comparison sees one spelling.
            s = s.map(_normalize_nested, na_action="ignore")
            df[c] = s.astype("object").where(~s.isna(), None)
    if len(df):
        df = df.sort_values(
            by=list(df.columns),
            key=lambda s: s.map(lambda v: (v is None) or (isinstance(v, float) and np.isnan(v)), na_action=None).astype(str) + s.astype(str),
            kind="mergesort",
        ).reset_index(drop=True)
    return df


def compare_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duckdb={len(duck_pdf)}")
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(
            f"columns: spark={sorted(spark_pdf.columns)} duckdb={sorted(duck_pdf.columns)}"
        )
    if problems:
        return problems
    a = canonicalize(spark_pdf)
    b = canonicalize(duck_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) and pd.api.types.is_float_dtype(bv):
            ok = ((av.isna() & bv.isna()) | (av == bv)).all()
            if not ok:
                diffs = (av - bv).abs()
                problems.append(
                    f"col {c!r}: {int((~((av.isna() & bv.isna()) | (av == bv))).sum())} "
                    f"mismatches, max abs diff {np.nanmax(diffs.to_numpy()):.3e}"
                )
        else:
            eq = (av.astype(str).where(~av.isna(), "<null>") == bv.astype(str).where(~bv.isna(), "<null>"))
            if not eq.all():
                i = int(np.argmax(~eq.to_numpy()))
                problems.append(
                    f"col {c!r}: {int((~eq).sum())} mismatches, first at row {i}: "
                    f"spark={av.iloc[i]!r} duckdb={bv.iloc[i]!r}"
                )
    return problems


def run_compare(spark, name: str, sf_dir: str) -> list[str]:
    from rpa_etl_investing_spark.plans import QUERIES

    q = QUERIES[name]
    sdf = q.fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if q.oracle is None:
        return []
    con = duck_connection(sf_dir)
    try:
        duck_pdf = con.execute(q.oracle).df()
    finally:
        con.close()
    return compare_frames(spark_pdf, duck_pdf)
