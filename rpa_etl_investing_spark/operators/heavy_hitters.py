"""Exact frequency-threshold heavy hitters via a two-pass
Misra–Gries candidate sweep.

The query "which tokens exceed θ of the corpus?" is the backbone of
stop-token discovery, boilerplate detection, and vocabulary pruning.
The naive plan — ``groupBy(token).count()`` then filter — shuffles the
ENTIRE vocabulary: at 100 TB of text that is billions of distinct keys
moved for a result of at most ⌈1/θ⌉ rows.  The classical fix
(Misra & Gries '82; the "MG summary" is mergeable, Agarwal et al.
PODS'12) is:

pass 1 — each partition runs a bounded Misra–Gries summary with
  k = ⌈1/θ⌉ counters over its own rows, streaming, O(k) memory.  The
  pigeonhole guarantee: an item with global count ≥ θ·N must hold
  count ≥ θ·n_p on at least one partition (else Σ_p count_p < θ·N),
  and MG with k counters retains every item whose partition frequency
  is ≥ n_p/k — so the UNION of partition summaries is a SUPERSET of
  the true heavy hitters, at most P·k candidate rows total.
pass 2 — exact recount of candidate tokens only: the corpus is
  re-scanned once, thinned by a broadcast semi join against the
  candidate set, and hash-aggregated.  The shuffle now carries only
  occurrences of ≤ P·k distinct tokens.  The final ≥ θ·N filter uses
  the EXACT counts, so false candidates drop out and the result is
  exact and deterministic regardless of how pass 1 split partitions.

Pass 1 is genuinely per-partition imperative state, so it is the
legitimate Arrow-batched ``mapInPandas`` case (SURVEY §2.11); pass 2 is
pure JVM (split/explode/semi-join/hash-agg).  The reference has no
analogue (its corpus is a handful of scraped rows); this is the
scale-path generalization of `llm_stop_tokens`' full-vocabulary scan.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_partition(
    batches: Iterator[pd.DataFrame], text_col: str, k: int
) -> Iterator[pd.DataFrame]:
    """Misra–Gries over one partition's documents, batch-merged via the
    mergeable-summaries reduction (Agarwal et al., PODS'12): count each
    Arrow batch whole, add the batch counts, and while more than k
    counters live subtract the (k+1)-th largest counter value from all
    and drop the non-positive. The merged summary keeps the MG
    guarantee — any item with partition count ≥ n_p/(k+1) survives — so
    the union of partition summaries remains a SUPERSET of the true
    θ-heavy hitters (the property pass 2 needs; pass 2's exact recount
    makes the final answer independent of which valid summary pass 1
    produced). Emits the surviving candidates once, at end of partition.

    Batch counting (r11, guide §4.2 measured twice): the r10 spelling
    ``s.str.split(" ").explode().value_counts()`` is NOT vectorized —
    pandas str ops on object dtype are Python-level loops plus Series
    materialization, and at the 100× fixture it ran 0.6× the speed of
    the r9 token-at-a-time dict loop it replaced. The fast path is
    ``" ".join(batch).split(" ")`` + ``Counter.update(list)``: both the
    split and the counting loop run in C (CPython's str.split and
    collections._count_elements), and the join/split round-trip is
    token-multiset-exact — split(" ") of texts joined by a single " "
    is precisely the concatenation of each text's split(" ") list
    (the separator closes the previous text's final token, empty
    tokens included). Numbers in SCALE.md r11 addendum."""
    from collections import Counter

    counters: Counter = Counter()
    for pdf in batches:
        s = pdf[text_col].dropna()
        if s.empty:
            continue
        counters.update(" ".join(s.tolist()).split(" "))
        if len(counters) > k:
            # subtract the (k+1)-th largest value from every counter and
            # drop non-positives — one mergeable-MG decrement step
            dec = sorted(counters.values(), reverse=True)[k]
            counters = Counter(
                {t: c - dec for t, c in counters.items() if c > dec}
            )
    yield pd.DataFrame({"token": list(counters.keys())})


def heavy_hitters(
    docs: DataFrame,
    threshold_ppm: int,
    text_col: str = "text",
) -> DataFrame:
    """All tokens whose corpus frequency is ≥ ``threshold_ppm`` parts
    per million of the total token count — EXACT counts, computed
    without ever shuffling the full vocabulary.

    Returns (token, cnt, total_tokens) with the comparison done in
    BIGINT ppm arithmetic (cnt·1e6 ≥ threshold_ppm·N) so no float
    enters the threshold."""
    spark = docs.sparkSession
    k = max(1, 1_000_000 // threshold_ppm)

    candidates = docs.select(text_col).mapInPandas(
        lambda it: _mg_partition(it, text_col, k), schema="token string"
    ).distinct()

    toks = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("token")
    )
    # r11 (guide §2.3 aggregate before you explode): the total used to
    # re-explode the whole corpus a second time (count over the token
    # rows); sum(size(split)) is the same BIGINT — size counts the
    # array elements explode would emit, and a NULL text contributes
    # NULL to the sum exactly as explode contributes no rows — computed
    # map-side in one pass with no fan-out.
    total = docs.agg(
        F.sum(F.size(F.split(F.col(text_col), " ")))
        .cast("long")
        .alias("total_tokens")
    )
    counted = (
        toks.join(F.broadcast(candidates), "token", "left_semi")
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    return (
        counted.crossJoin(F.broadcast(total))
        .filter(
            F.col("cnt") * F.lit(1_000_000)
            >= F.lit(int(threshold_ppm)) * F.col("total_tokens")
        )
        .select("token", "cnt", "total_tokens")
    )
