#!/usr/bin/env python
"""Optimization profiler — measure first (guide §1).

Times each headline query (noop sink, same methodology as bench.py) and
writes its ``.explain("formatted")`` to ``plans/<round>/<name>_<tag>.txt``
so before/after plan claims are checkable without running Spark.

Usage: python scripts/opt_profile.py [before|after|<tag>] [filter]
           [--reps N] [--sf DIR] [--registry name1,name2,...] [--round rNN]

``--registry`` profiles arbitrary registry queries (not just the bench
headline set) under their registry names. ``--round`` picks the output
directory under plans/ (default r11).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from rpa_etl_investing_spark.session import get_spark  # noqa: E402


def main() -> int:
    raw = sys.argv[1:]
    reps = 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry_names: list[str] | None = None
    round_tag = "r11"
    args = []
    i = 0
    while i < len(raw):
        a = raw[i]
        if a == "--reps":
            reps = int(raw[i + 1])
            i += 2
        elif a == "--sf":
            sf_dir = raw[i + 1]
            i += 2
        elif a == "--round":
            round_tag = raw[i + 1]
            i += 2
        elif a == "--registry":
            registry_names = raw[i + 1].split(",")
            i += 2
        else:
            args.append(a)
            i += 1
    tag = args[0] if args else "before"
    name_filter = args[1] if len(args) > 1 else None

    from bench import HEADLINE
    from rpa_etl_investing_spark.plans import QUERIES

    if registry_names is not None:
        targets = {n: n for n in registry_names}
    else:
        targets = dict(HEADLINE)

    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    spark = get_spark(
        app_name=f"opt-profile-{tag}",
        extra_conf={
            "spark.driver.extraJavaOptions": f"-Xms{mem} -XX:+AlwaysPreTouch"
        },
    )

    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", round_tag)
    os.makedirs(out_dir, exist_ok=True)

    warm_dir = "/root/testdata/sf0.001"
    results: dict[str, dict] = {}
    for bench_name, reg_name in targets.items():
        if name_filter and name_filter not in bench_name and name_filter not in reg_name:
            continue
        fn = QUERIES[reg_name].fn
        spark.sparkContext.setJobDescription(f"{tag}: warm {bench_name}")
        try:
            fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
        times = []
        t_construct = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"{tag}: {bench_name} rep{r}")
            t0 = time.perf_counter()
            df_r = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df_r.write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
            t_construct.append(t1 - t0)
        times.sort()
        t_construct.sort()
        # capture the formatted plan of the query itself (pre-execution;
        # AQE shows isFinalPlan=false — shape, pushed filters, join
        # strategies and exchange count are what we audit)
        df = fn(spark, sf_dir)
        try:
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception:  # plan-string API drift: fall back to physical toString
            plan = df._jdf.queryExecution().executedPlan().toString()
        with open(os.path.join(out_dir, f"{bench_name}_{tag}.txt"), "w") as fh:
            fh.write(f"-- {bench_name} ({reg_name}) @ {sf_dir} tag={tag}\n")
            fh.write(
                f"-- median={times[len(times) // 2]:.3f}s min={times[0]:.3f}s"
                f" reps={sorted(round(t, 3) for t in times)}\n"
            )
            fh.write(plan)
        results[bench_name] = {
            "median": round(times[len(times) // 2], 3),
            "min": round(times[0], 3),
            "construct_med": round(t_construct[len(t_construct) // 2], 3),
            "n_exchange": plan.count("Exchange"),
            "n_python": plan.count("EvalPython")
            + plan.count("MapInArrow")
            + plan.count("MapInPandas")
            + plan.count("FlatMapGroupsInPandas"),
        }
        print(
            f"{bench_name:32s} median={results[bench_name]['median']:7.3f}"
            f" min={results[bench_name]['min']:7.3f}"
            f" constr={results[bench_name]['construct_med']:6.3f}"
            f" exch={results[bench_name]['n_exchange']:2d}"
            f" py={results[bench_name]['n_python']}"
        )

    total = round(sum(r["median"] for r in results.values()), 3)
    print(json.dumps({"tag": tag, "sf_dir": sf_dir, "total_median": total, "queries": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
