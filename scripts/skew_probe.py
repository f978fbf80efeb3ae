#!/usr/bin/env python
"""Whale-key skew experiment — measure the skew machinery earning its
keep (r6 follow-up to the SCALE.md plan-flip probe, where AQE skew
never fired because FK-replication preserves the fixture's balanced
key distribution).

Builds a WHALE fact from the derived 100× orders (60% of rows remapped
to one customer key), joins it to the per-user event aggregate, and
times three executions of the same logical join:

  1. naive    — shuffled SMJ, AQE skew split OFF: the whale partition
                is one straggler task.
  2. aqe_skew — AQE skew split ON with thresholds scaled to the probe
                (production keeps the 256MB default; the probe's whale
                partition is ~150MB, so the threshold drops
                proportionally — the MECHANISM is what's demonstrated,
                the constant is cluster tuning either way).
  3. salted   — operators/skew.salted_join n_salts=32, AQE skew OFF:
                the explicit form that also works where AQE can't see
                the skew (aggregate-after-join pipelines, non-AQE
                engines).

autoBroadcastJoinThreshold is -1 for all three runs: the aggregate side
is fixture-small and would otherwise broadcast (no shuffle, no skew to
see) — at real scale a per-user aggregate does NOT fit in a broadcast,
so the forced-shuffle plan is the honest 100 TB shape.

Appends results to SCALE.md. Usage:
  python scripts/skew_probe.py [/tmp/sf10] [/tmp/whale]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

WHALE_KEY = 7
WHALE_FRACTION_MOD = 5  # o_orderkey % 5 < 3  → 60% of rows remapped


def main() -> int:
    big_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    whale_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/whale"
    from rpa_etl_investing_spark.operators.skew import salted_join
    from rpa_etl_investing_spark.session import get_spark

    spark = get_spark(
        app_name="skew-probe",
        extra_conf={
            "spark.driver.extraJavaOptions": "-Xms8g -XX:+AlwaysPreTouch"
        },
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    whale_path = f"{whale_dir}/orders_whale.parquet"
    if not os.path.exists(whale_path):
        (
            spark.read.parquet(f"{big_dir}/orders.parquet")
            .withColumn(
                "o_custkey",
                F.when(
                    F.col("o_orderkey") % WHALE_FRACTION_MOD < 3, F.lit(WHALE_KEY)
                ).otherwise(F.col("o_custkey")),
            )
            .repartition(8)
            .write.mode("overwrite")
            .parquet(whale_path)
        )
    whale = spark.read.parquet(whale_path)
    user_totals_lazy = (
        spark.read.parquet(f"{big_dir}/events.parquet")
        .groupBy(F.col("user_id").alias("o_custkey"))
        .agg(F.sum("value").alias("user_value"), F.count("*").alias("user_events"))
    )
    # Materialized form of the same aggregate: OptimizeSkewedJoin only
    # matches SMJ(Sort(ShuffleStage), Sort(ShuffleStage)) — an Aggregate
    # sitting between the right shuffle and the join blocks the split
    # (duplicating a partition read through an aggregation would break
    # its required distribution). Joining the MATERIALIZED aggregate
    # gives AQE the pattern it can optimize; joining the LAZY aggregate
    # is the very shape it cannot — the blind spot explicit salting is
    # for.
    ut_path = f"{whale_dir}/user_totals.parquet"
    if not os.path.exists(ut_path):
        user_totals_lazy.write.mode("overwrite").parquet(ut_path)
    user_totals_mat = spark.read.parquet(ut_path)

    def timed(tag: str, skew_on: bool, salted: bool, lazy_agg: bool = False) -> dict:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower())
        if skew_on:
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16MB"
            )
            spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8MB")
        user_totals = user_totals_lazy if lazy_agg else user_totals_mat
        if salted:
            joined = salted_join(whale, user_totals, on=["o_custkey"], n_salts=32)
        else:
            joined = whale.join(user_totals, "o_custkey")
        # checksum-wrapper: execute the SAME QueryExecution we inspect
        # (a noop write plans a fresh QE, leaving df's isFinalPlan=false
        # — AQE's skew decision invisible) AND force the payload columns
        # through the join (a bare count() lets Catalyst prune down to
        # the all-identical whale key, whose shuffle bytes RLE-compress
        # below every skew threshold — measured before this fix)
        out = (
            joined.select(
                F.xxhash64("o_orderkey", "o_custkey", "o_totalprice", "user_value").alias("_h")
            )
            .agg(F.sum(F.col("_h").cast("decimal(38,0)")).alias("checksum"), F.count("*").alias("n"))
        )
        t0 = time.perf_counter()
        row = out.collect()[0]
        sec = round(time.perf_counter() - t0, 2)
        plan = out._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==")[0]
        rec = {
            "tag": tag,
            "sec": sec,
            "rows": row["n"],
            "skew_applied": "skew=true" in plan,
        }
        print(rec)
        return rec

    # warm the scans so run 1 doesn't pay the page-cache fill
    whale.count(), user_totals_mat.count()
    results = [
        timed("naive_smj_no_skew_handling", skew_on=False, salted=False),
        timed("aqe_skew_split_plain_join", skew_on=True, salted=False),
        timed("aqe_blind_spot_agg_below_join", skew_on=True, salted=False, lazy_agg=True),
        timed("salted_join_n32_agg_below_join", skew_on=False, salted=True, lazy_agg=True),
    ]
    counts = {r["rows"] for r in results}
    assert len(counts) == 1, f"row counts diverged: {results}"

    with open("SCALE.md", "a") as fh:
        fh.write(
            "\n## Skew addendum (r6, whale fixture)\n\n"
            "100× orders with 60% of rows remapped to ONE customer key, joined\n"
            "to the per-user event aggregate; broadcast disabled (the honest\n"
            "100 TB shape — a per-user aggregate doesn't broadcast at scale);\n"
            "AQE skew thresholds scaled to the probe's partition sizes\n"
            "(production keeps the 256 MB default). Same logical result, four\n"
            f"executions, identical output rows ({results[0]['rows']:,}):\n\n"
            "| execution | wall s | AQE skew split in final plan |\n"
            "|---|---|---|\n"
            + "".join(
                f"| {r['tag']} | {r['sec']} | {r['skew_applied']} |\n"
                for r in results
            )
            + "\nReading: the naive run serializes the whale key into one\n"
            "straggler task. AQE's skew split fires on the plain two-shuffle\n"
            "join (`skew=true`) — but NOT when the dimension aggregate sits\n"
            "lazily below the join (`OptimizeSkewedJoin` only matches\n"
            "SMJ(Sort(Shuffle), Sort(Shuffle)); an Aggregate between shuffle\n"
            "and join blocks the split because duplicating a partition read\n"
            "through an aggregation would break its required distribution).\n"
            "That agg-below-join shape is exactly what operators/skew.py's\n"
            "explicit salting covers: same lazy aggregate, 32 salts, whale\n"
            "spread with no materialization step. Both mechanisms are in the\n"
            "engine; pick AQE when the plan shape allows it, salting when the\n"
            "optimizer can't see through the pipeline.\n"
        )
    print("appended SCALE.md")
    return 0


if __name__ == "__main__":
    sys.exit(main())
