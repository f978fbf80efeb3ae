#!/usr/bin/env python
"""Convert a single-pass sf1 sweep log into SF1_STRESS_r{N}.json.

r7's record was assembled from segments (scripts/consolidate_sf1_record.py)
because per-query walls were discovered mid-run; r8 runs the whole
registry in ONE uninterrupted `verify_driver_contract.py /tmp/sf1`
process and this script just reshapes that run's JSON summary line into
the record format the earlier rounds established. r10: the declared-wall
skip hook is retired — the two former quadratic-output walls evaluate on
the pinned gate corpus (plans/llm_queries.py EXACT_GATE_DOCS) and run at
sf1, so n_named_walls is structurally 0 now; WALL_REASONS stays only to
explain any legacy record.

Usage: python scripts/make_sf1_record.py LOGFILE ROUND [HEAP]
"""

from __future__ import annotations

import json
import sys

WALL_REASONS = {
    "llm_prefix_filter_pairs": (
        "NAMED WALL (declared, skipped in-pass): exact tau-join OUTPUT is "
        "quadratic on this fixture (~71M result pairs at sf1, and the "
        "brute-force oracle's co-token enumeration is ~1e11 group keys; "
        "correctness-gated at sf0.01/sf0.1 where the enumeration oracle "
        "is tractable). r9: the scale path is the CAPPED sibling "
        "llm_prefix_filter_pairs_capped (posting-occupancy cap + "
        "llm_prefix_filter_cap_audit drop ledger), green at sf1 in this "
        "pass — the same sibling structure as simhash16/simhash64"
    ),
    "llm_simhash_hamming_pairs": (
        "NAMED WALL (declared, skipped in-pass): the 16-BIT pedagogical "
        "fingerprint saturates its 65,536-print space at 50k docs "
        "(quadratic TRUE pair count); the production-width simhash64 "
        "variant is capped and green at sf1"
    ),
}


def main() -> int:
    log_path, rnd = sys.argv[1], int(sys.argv[2])
    heap = sys.argv[3] if len(sys.argv) > 3 else "16g"
    summary = None
    for line in reversed(open(log_path).read().strip().splitlines()):
        if line.strip().startswith("{"):
            summary = json.loads(line)
            break
    assert summary, "no JSON summary in log"
    skipped = summary.get("skipped", [])
    unexpected = [s for s in skipped if s not in WALL_REASONS]
    assert not unexpected, f"skips without a wall reason: {unexpected}"
    # queries whose oracle result exceeded the hash gate and were
    # compared via the in-engine md5-slice checksum path (r9 verdict
    # item #6: the size-gated comparator must be visible in the record)
    import re
    hashed = sorted(set(re.findall(
        r"^\s+(\w+): MATCH \(hashed\)", open(log_path).read(), re.M)))
    record = {
        "sf_dir": summary["sf_dir"],
        "heap": heap,
        "single_pass": True,
        "n_queries_seen": summary["n_queries"],
        "n_match": summary["n_oracle_matched"],
        "n_hashed_compare": summary.get("n_hashed", len(hashed)),
        "hashed_compare_queries": hashed,
        "n_named_walls": len(skipped),
        "n_bad": summary["n_bad"],
        "bad": summary["bad"],
        "named_walls": {s: WALL_REASONS[s] for s in skipped},
    }
    out = f"SF1_STRESS_r{rnd:02d}.json"
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(f"wrote {out}: {record['n_match']} MATCH / "
          f"{record['n_named_walls']} walls / {record['n_bad']} bad "
          f"over {record['n_queries_seen']} queries")
    return 0 if record["n_bad"] == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
