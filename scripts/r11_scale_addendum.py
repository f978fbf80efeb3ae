#!/usr/bin/env python
"""r11 addendum probe: re-run the plan-flip check at the 100× fixture
for the queries whose PLANS r11 changed (q8/q14 bucket-aggregated pair
generation, q12 Lloyd/assignment/probe-broadcast, q15 single-explode
total, q17 map-side PQ encode) and APPEND the observations to SCALE.md
(scale_probe.py overwrites the whole file, which would destroy the
r6-r10 history).

Usage: python scripts/r11_scale_addendum.py [/tmp/sf100x] [100×]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")

PROBE = {
    "q8_minhash_pairs": "llm_minhash_pairs",
    "q14_simhash64_pairs": "llm_simhash64_hamming_pairs",
    "q12_similarity_ivf": "llm_similarity_ivf",
    "q15_heavy_hitters": "llm_heavy_hitters",
    "q17_ivfpq_adc": "llm_ivfpq_adc_search",
}


def main() -> int:
    big_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf100x"
    label = sys.argv[2] if len(sys.argv) > 2 else "100×"
    small_dir = "/root/testdata/sf0.1"

    from scale_probe import checksum_all_columns, plan_features

    from rpa_etl_investing_spark.plans import QUERIES
    from rpa_etl_investing_spark.session import get_spark

    spark = get_spark(
        app_name="r11-scale-addendum",
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
        f"## r11 addendum: {label} re-probe of the queries whose plans r11 changed",
        "",
        "q8/q14 (bucket-aggregated pair generation: band self-join + two",
        "signature re-attach joins → one collect_list aggregation per capped",
        "bucket, pairs emitted map-side), q12 (Lloyd step as one 64-buffer",
        "hash aggregate; probe side broadcast-hinted), q15 (total tokens via",
        "map-side sum(size(split)) — one corpus explode), q17 (PQ encode as",
        "map-side array_min over a broadcast codebook array — no",
        "SortAggregate, no corpus exchange). Same methodology as the r6",
        "probe: one-shot timing after a sf0.001 warm pass — read the flips,",
        "not the seconds. Spark caches cleared between fixtures so persisted",
        "signature/assignment relations are rebuilt per scale.",
        "",
        f"| query | sf0.1 s | {label} s | joins sf0.1 (B/S/H) | joins {label} (B/S/H) | exch sf0.1→{label} | skew |",
        "|---|---|---|---|---|---|---|",
    ]
    for bench_name, reg_name in PROBE.items():
        cells = {"query": bench_name}
        for tag, d in (("small", small_dir), ("big", big_dir)):
            spark.catalog.clearCache()
            from rpa_etl_investing_spark.operators.dedup import (
                release_sig_caches,
            )

            release_sig_caches()
            spark.sparkContext.setJobDescription(f"{bench_name} @ {tag}")
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

    with open(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "SCALE.md",
        ),
        "a",
    ) as fh:
        fh.write("\n".join(lines) + "\n")
    print("appended SCALE.md")
    return 0


if __name__ == "__main__":
    sys.exit(main())
