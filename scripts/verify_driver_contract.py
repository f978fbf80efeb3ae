#!/usr/bin/env python
"""Drive the driver contract end-to-end, exactly as the round driver does.

Imports ``__spark_entry__`` (the public surface), runs ``entry(spark)``
as the smoke check, then every ``queries()`` entry at the given sf_dir
with its ``oracle_sql()`` counterpart on DuckDB, comparing row count,
column names and order-insensitive values. Prints one line per query
and a JSON summary.

Usage: python scripts/verify_driver_contract.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else None

    import __spark_entry__ as contract
    from rpa_etl_investing_spark import get_spark
    from tests.parity import compare_frames, duck_connection

    spark = get_spark(app_name="verify-driver-contract")

    t0 = time.time()
    smoke = contract.entry(spark)
    n_smoke = len(smoke.collect())
    print(f"entry(): {n_smoke} rows [{time.time() - t0:.1f}s] "
          f"{'OK' if n_smoke > 0 else 'FAIL (0 rows)'}")

    queries = contract.queries()
    oracles = contract.oracle_sql()
    con = duck_connection(sf_dir)
    results: dict[str, str] = {}
    for name in sorted(queries):
        if name_filter and name_filter not in name:
            continue
        t0 = time.time()
        try:
            spark_pdf = queries[name](spark, sf_dir).toPandas()
            if name in oracles:
                duck_pdf = con.execute(oracles[name]).df()
                problems = compare_frames(spark_pdf, duck_pdf)
                status = "MATCH" if not problems else "MISMATCH: " + "; ".join(problems)
            else:
                status = f"ROWS_ONLY ({len(spark_pdf)} rows)"
        except Exception as e:  # noqa: BLE001 — report, don't crash the sweep
            status = f"ERROR: {type(e).__name__}: {e}"
        results[name] = status
        print(f"  {name}: {status} [{time.time() - t0:.1f}s]")

    bad = {k: v for k, v in results.items() if v.startswith(("MISMATCH", "ERROR"))}
    summary = {
        "sf_dir": sf_dir,
        "entry_rows": n_smoke,
        "n_queries": len(results),
        "n_oracle_matched": sum(1 for v in results.values() if v == "MATCH"),
        "n_rows_only": sum(1 for v in results.values() if v.startswith("ROWS_ONLY")),
        "n_bad": len(bad),
        "bad": bad,
    }
    print(json.dumps(summary))
    return 1 if (bad or n_smoke == 0) else 0


if __name__ == "__main__":
    sys.exit(main())
