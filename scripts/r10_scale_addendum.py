#!/usr/bin/env python
"""r10 addendum probe: re-run the plan-flip check at a derived scale
for the queries whose PLANS changed this round (q1 widen removal +
long-grid dsum, q6 long-grid revenue, q16 banded self-join) and APPEND
the observations to SCALE.md (scale_probe.py overwrites the whole
file, which would destroy the r6-r9 history).

Usage: python scripts/r10_scale_addendum.py [/tmp/sf100] [100x]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")

PROBE = {
    "q1_pricing_summary": "agg_pricing_summary",
    "q6_event_time_buckets": "datetime_bucket_agg",
    "q16_skew_dup_payments": "etl_duplicate_payment_scan",
    "q15_heavy_hitters": "llm_heavy_hitters",
}


def main() -> int:
    big_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf100"
    label = sys.argv[2] if len(sys.argv) > 2 else "100×"
    small_dir = "/root/testdata/sf0.1"

    from scale_probe import checksum_all_columns, plan_features

    from rpa_etl_investing_spark.plans import QUERIES
    from rpa_etl_investing_spark.session import get_spark

    spark = get_spark(
        app_name="r10-scale-addendum",
        extra_conf={
            "spark.driver.extraJavaOptions": "-Xms8g -XX:+AlwaysPreTouch",
            "spark.driver.memory": os.environ["SPARK_GRAFT_DRIVER_MEM"],
        },
    )
    for bench_name, reg_name in PROBE.items():
        try:
            QUERIES[reg_name].fn(spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception:
            pass

    lines = [
        "",
        f"## r10 addendum: {label} re-probe of the queries whose plans r10 changed",
        "",
        "q1 (widen exchange removed + long-grid BIGINT accumulators), q6",
        "(long-grid revenue), q16 ((custkey, 100-cent-band) blocked self-join,",
        "probe side exploded ±1 band), q15 (batch-merged Misra-Gries pass 1).",
        "Same methodology as the r6 probe above: one-shot timing after a",
        "sf0.001 warm pass — read the flips, not the seconds.",
        "",
        f"| query | sf0.1 s | {label} s | joins sf0.1 (B/S/H) | joins {label} (B/S/H) | exch sf0.1→{label} | skew |",
        "|---|---|---|---|---|---|---|",
    ]
    for bench_name, reg_name in PROBE.items():
        cells = {"query": bench_name}
        for tag, d in (("small", small_dir), ("big", big_dir)):
            t0 = time.perf_counter()
            df = QUERIES[reg_name].fn(spark, d)
            probe = checksum_all_columns(df)
            cells[f"{tag}_sec"] = round(time.perf_counter() - t0, 2)
            cells[f"{tag}_feat"] = plan_features(
                probe._jdf.queryExecution().executedPlan().toString()
            )
        sf, bf = cells["small_feat"], cells["big_feat"]
        j = lambda f: f"{f['broadcast_joins']}/{f['sortmerge_joins']}/{f['shuffled_hash_joins']}"  # noqa: E731
        skew = "✓" if bf["aqe_skew"] else ""
        lines.append(
            f"| {bench_name} | {cells['small_sec']} | {cells['big_sec']} | "
            f"{j(sf)} | {j(bf)} | {sf['exchanges']}→{bf['exchanges']} | {skew} |"
        )
        print(cells)

    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE.md"), "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print("appended SCALE.md")
    return 0


if __name__ == "__main__":
    sys.exit(main())
