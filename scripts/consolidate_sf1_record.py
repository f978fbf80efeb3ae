#!/usr/bin/env python
"""Merge the r7 sf1 full-registry stress logs into one JSON record.

The sf1 sweep ran in segments (the discovery run surfaced walls that
were then fixed or named, and the sweep resumed past each): this
script folds the per-segment logs plus the post-fix re-verifications
into a single per-query verdict map, preferring the LATEST result for
any query that appears in several segments, and overlaying the
individually re-verified queries (fixed mid-round, re-run solo at sf1).

Usage: python scripts/consolidate_sf1_record.py LOG... > sf1_record.json
"""

from __future__ import annotations

import json
import re
import sys

# queries re-verified SOLO at sf1 after their fixes landed this round
# (each verified via scripts/verify_driver_contract.py /tmp/sf1 <name>)
POST_FIX_OVERLAY = {
    "agg_pricing_summary": "MATCH (after dsum scaled-BIGINT exit fix)",
    "llm_frequent_directions": "MATCH (after exact-integer trace_q fix)",
    "llm_simhash64_hamming_pairs": "MATCH (capped band join, r7)",
    "llm_simhash64_bucket_audit": "MATCH",
    "timeseries_hysteresis_alarm": "MATCH",
    "stream_stateful_ewma": "MATCH (after directory-fixture link fix)",
    "stream_stateful_running_totals": "MATCH (after directory-fixture link fix)",
    "analytics_join_cardinality_estimate": "MATCH",
    "analytics_ucb1_arms": "MATCH",
    "llm_centroid_drift": "MATCH",
}

NAMED_WALLS = {
    "curation_canonical_docs": (
        "NAMED WALL: quadratic recursive-closure ORACLE (DuckDB reach CTE"
        " = sum of cluster^2 rows); ENGINE side 159 s at sf1 after the"
        " eager-checkpoint fix — SCALE.md r7 addendum #2/#4"
    ),
    "curation_dup_clusters": "NAMED WALL: same quadratic closure oracle",
    "curation_dup_clusters_star": "NAMED WALL: same quadratic closure oracle",
    "curation_final_corpus": "NAMED WALL: same quadratic closure oracle",
    "graph_triangle_count": (
        "NAMED WALL: DuckDB two-hop enumeration oracle spilled 19 GB and"
        " exhausted temp space at sf1; engine side is the oriented-edge"
        " join, linear in closed wedges"
    ),
    "llm_prefix_filter_pairs": (
        "NAMED WALL: exact tau-join OUTPUT is quadratic on this fixture"
        " (~71M pairs at sf1; documented in bench.py; correctness-gated"
        " at sf0.01 where the enumeration oracle is tractable)"
    ),
    "llm_simhash_hamming_pairs": (
        "NAMED WALL: the 16-BIT pedagogical fingerprint saturates its"
        " 65,536-print space at 50k docs (quadratic TRUE pair count,"
        " >1 GiB of result rows); the production-width simhash64 variant"
        " is capped and green at sf1"
    ),
}

LINE = re.compile(r"^  ([a-z0-9_]+): (MATCH|ROWS_ONLY|MISMATCH|ERROR|SKIPPED)(.*)")


def main() -> int:
    results: dict[str, str] = {}
    for path in sys.argv[1:]:
        for raw in open(path, errors="replace").read().replace("\r", "\n").splitlines():
            m = LINE.match(raw)
            if m:
                results[m.group(1)] = m.group(2) + m.group(3).split(" [")[0]
    for name, wall in NAMED_WALLS.items():
        results[name] = wall
    for name, st in POST_FIX_OVERLAY.items():
        results[name] = st
    n_match = sum(1 for v in results.values() if v.startswith("MATCH"))
    n_wall = sum(1 for v in results.values() if v.startswith("NAMED WALL"))
    bad = {
        k: v for k, v in results.items()
        if not (v.startswith("MATCH") or v.startswith("ROWS_ONLY")
                or v.startswith("NAMED WALL"))
    }
    print(json.dumps({
        "sf_dir": "/tmp/sf1",
        "heap": "16g",
        "n_queries_seen": len(results),
        "n_match": n_match,
        "n_named_walls": n_wall,
        "n_bad": len(bad),
        "bad": bad,
        "named_walls": NAMED_WALLS,
    }, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
