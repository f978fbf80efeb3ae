#!/usr/bin/env python
"""One-off 10× scale experiment (VERDICT r5 stretch #8): run the bench
headline set at sf0.1 AND at the derived 10× fixture
(scripts/make_scale_fixture.py), record where the physical plans FLIP
(broadcast→shuffled join, AQE skew splits, partition counts), and
write SCALE.md. This converts the "plans you'd want at 100× scale"
claim from design argument to observation.

Usage: python scripts/scale_probe.py [/tmp/sf1]
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, "/root/repo")

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")


def plan_features(plan: str) -> dict:
    # AdaptiveSparkPlanExec prints BOTH the final and the initial plan;
    # count features in the FINAL section only (the runtime decisions)
    plan = plan.split("== Initial Plan ==")[0]
    return {
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sortmerge_joins": plan.count("SortMergeJoin"),
        "shuffled_hash_joins": plan.count("ShuffledHashJoin"),
        "exchanges": len(re.findall(r"Exchange (?:hash|range|rangepartitioning|SinglePartition)", plan)),
        "aqe_skew": "skew=true" in plan,
        "aqe_final": "isFinalPlan=true" in plan,
    }


def checksum_all_columns(df):
    """One-row action that forces EVERY output column through the plan
    (groupBy().count() lets Catalyst prune the payload — measured: the
    whale join's shuffle shrank to the RLE-compressible key column and
    the skew vanished). Falls back to count() for outputs whose types
    xxhash64 can't hash (maps)."""
    from pyspark.sql import functions as F

    try:
        probe = df.select(
            F.xxhash64(F.struct(*df.columns)).alias("_h")
        ).agg(F.sum(F.col("_h").cast("decimal(38,0)")).alias("checksum"))
        probe.collect()
        return probe
    except Exception:
        probe = df.groupBy().count()
        probe.collect()
        return probe


def _du(path: str) -> str:
    total = 0
    for dirpath, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(dirpath, f))
            except OSError:
                pass
    if os.path.isfile(path):
        total = os.path.getsize(path)
    return f"{total / (1 << 20):.1f} MB"


def main() -> int:
    big_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    label = sys.argv[2] if len(sys.argv) > 2 else "10×"
    small_dir = "/root/testdata/sf0.1"
    from bench import HEADLINE

    from rpa_etl_investing_spark.plans import QUERIES
    from rpa_etl_investing_spark.session import get_spark

    spark = get_spark(
        app_name="scale-probe",
        extra_conf={
            "spark.driver.extraJavaOptions": "-Xms8g -XX:+AlwaysPreTouch",
            "spark.driver.memory": os.environ["SPARK_GRAFT_DRIVER_MEM"],
        },
    )

    # warm the JVM/codegen so the first timed query isn't a JIT outlier
    for bench_name, reg_name in HEADLINE.items():
        try:
            QUERIES[reg_name].fn(spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception:
            pass

    rows: list[dict] = []
    for bench_name, reg_name in HEADLINE.items():
        rec = {"query": bench_name}
        for tag, d in (("small", small_dir), ("big", big_dir)):
            try:
                t0 = time.perf_counter()
                df = QUERIES[reg_name].fn(spark, d)
                # execute THIS DataFrame's own QueryExecution (a noop
                # write builds a NEW one, leaving df's plan unexecuted —
                # isFinalPlan=false — so AQE's runtime decisions would
                # be invisible), forcing every output column through
                probe = checksum_all_columns(df)
                rec[f"{tag}_sec"] = round(time.perf_counter() - t0, 2)
                rec[f"{tag}_feat"] = plan_features(
                    probe._jdf.queryExecution().executedPlan().toString()
                )
            except Exception as e:
                rec[f"{tag}_err"] = repr(e)[:160]
        rows.append(rec)
        print(rec)

    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    lines = [
        f"# SCALE — {label} plan-flip experiment (r6)",
        "",
        "The bench headline set executed once at sf0.1 and once at a derived",
        f"{label} fixture (`scripts/make_scale_fixture.py`: FK-consistent",
        "replication of the read-only sf0.1 parquet; bounded domains not",
        "replicated). Recorded: executed-plan join strategies, exchange counts,",
        "AQE skew activation, wall time. The question this answers: do the",
        "plans DEGRADE the way the scale design says they should — size-gated",
        "broadcasts flipping to shuffled joins, nothing OOMing, no pinned",
        f"build side — when the data is {label} bigger than every previous round's",
        "bench? Timings are one-shot after a sf0.001 warm pass: this is a plan",
        "probe, not a benchmark; read the flips, not the seconds.",
        "",
        f"`spark.sql.autoBroadcastJoinThreshold` = {thresh}. On-disk bytes",
        "(compressed parquet — what the planner's size estimate sees):",
        "",
        "| table | sf0.1 | " + label + " |",
        "|---|---|---|",
        *[
            f"| {t} | {_du(f'{small_dir}/{t}.parquet')} | {_du(f'{big_dir}/{t}.parquet')} |"
            for t in ("customer", "orders", "lineitem", "part", "supplier",
                      "events", "documents", "embeddings")
        ],
        "",
        f"| query | sf0.1 s | {label} s | joins sf0.1 (B/S/H) | joins {label} (B/S/H) | exch sf0.1→{label} | skew |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        if "small_err" in r or "big_err" in r:
            lines.append(
                f"| {r['query']} | {r.get('small_sec','ERR')} | {r.get('big_sec','ERR')} "
                f"| — | — | — | {r.get('small_err','') or r.get('big_err','')} |"
            )
            continue
        sf, bf = r["small_feat"], r["big_feat"]
        lines.append(
            f"| {r['query']} | {r['small_sec']} | {r['big_sec']} "
            f"| {sf['broadcast_joins']}/{sf['sortmerge_joins']}/{sf['shuffled_hash_joins']} "
            f"| {bf['broadcast_joins']}/{bf['sortmerge_joins']}/{bf['shuffled_hash_joins']} "
            f"| {sf['exchanges']}→{bf['exchanges']} "
            f"| {'sf0.1' if sf['aqe_skew'] else ''}{'+big' if bf['aqe_skew'] else ''} |"
        )
    lines += ["", "## Flips observed", ""]
    for r in rows:
        if "small_feat" not in r or "big_feat" not in r:
            continue
        sf, bf = r["small_feat"], r["big_feat"]
        notes = []
        if sf["broadcast_joins"] != bf["broadcast_joins"] or sf["sortmerge_joins"] != bf["sortmerge_joins"] or sf["shuffled_hash_joins"] != bf["shuffled_hash_joins"]:
            notes.append(
                f"join strategy {sf['broadcast_joins']}B/{sf['sortmerge_joins']}S/{sf['shuffled_hash_joins']}H → "
                f"{bf['broadcast_joins']}B/{bf['sortmerge_joins']}S/{bf['shuffled_hash_joins']}H"
            )
        if bf["aqe_skew"] and not sf["aqe_skew"]:
            notes.append(f"AQE skew split ACTIVATED at {label}")
        if notes:
            lines.append(f"- **{r['query']}**: " + "; ".join(notes))
    with open("SCALE.md", "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("wrote SCALE.md")
    return 0


if __name__ == "__main__":
    sys.exit(main())
