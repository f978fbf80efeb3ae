"""Bloom-filter semi-join prefilter (J6/S-family scale pattern).

The reference joins its fact against small dimension sets row-by-row in
Postgres (/root/reference/main.py:122-147); Spark's equivalents are a
broadcast hash join (dim fits in memory) or a shuffled join (it
doesn't). This operator covers the middle ground that matters at
100 TB: a dimension KEY SET too big to broadcast as a hash relation but
whose membership can be summarized in a fixed-size Bloom filter, so the
fact is thinned MAP-SIDE before any exchange. The filter is built with
one aggregation over the keys, ships as a single map<word_idx, bits>
row (m_bits/64 entries regardless of key cardinality — that is the
point), and admits no false negatives, so following it with the exact
join keeps results exact while the shuffle moves only rows that
probably match.

Spark's AQE injects similar runtime bloom filters on its own
(spark.sql.optimizer.runtime.bloomFilter.enabled); this explicit form
exists for plans AQE won't cover (e.g. pre-filtering before a
repartition or a stateful stage) and to keep the mechanism testable.

Everything is JVM-side: xxhash64 for the k probe positions, bit_or for
the word aggregation, element_at + bitwise AND for the membership test.
No UDFs, no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

M_BITS = 8192  # filter width; 8 KiB of bits = 128 longs
N_HASHES = 3


def _pos_sql(key_col: str, seed: int, m_bits: int) -> str:
    """SQL for probe position `seed` of `key_col`: xxhash64 with a
    distinct literal seed column, folded onto the [0, m_bits) ring."""
    return f"pmod(xxhash64({key_col}, {seed}), {m_bits})"


def bloom_build(
    keys: DataFrame, key_col: str, m_bits: int = M_BITS, k: int = N_HASHES
) -> DataFrame:
    """Aggregate the key set into a one-row Bloom filter:
    ``map<int word_idx, bigint word>`` holding only the non-zero words.

    One narrow shuffle on word_idx (at most m_bits/64 groups, here 128)
    — the build cost is a scan of the keys plus a bounded aggregation,
    independent of key cardinality."""
    pos_cols = [
        F.expr(_pos_sql(key_col, i, m_bits)).alias(f"_p{i}") for i in range(k)
    ]
    exploded = keys.select(
        F.explode(F.array(*pos_cols)).alias("pos")
    )
    words = exploded.select(
        F.expr("CAST(pos div 64 AS INT)").alias("w"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("m"),
    )
    return (
        words.groupBy("w")
        .agg(F.expr("bit_or(m)").alias("word"))
        .agg(
            F.map_from_entries(F.collect_list(F.struct("w", "word"))).alias(
                "_bloom"
            )
        )
    )


def bloom_might_contain(
    words: list[int], key_col: str, m_bits: int = M_BITS, k: int = N_HASHES
):
    """Membership predicate Column over a materialized word array:
    ALL k probe bits set. ``words`` is the dense m_bits/64-long word
    list (zero = empty word), inlined as an array literal so the
    predicate is join-free and stays in the fact's scan stage."""
    arr = F.array(*[F.lit(int(w)) for w in words])
    pred = None
    for i in range(k):
        p = _pos_sql(key_col, i, m_bits)
        widx = F.expr(f"CAST({p} div 64 AS INT) + 1")  # element_at is 1-based
        mask = F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST({p} % 64 AS INT))"
        )
        bit = F.element_at(arr, widx).bitwiseAND(mask) != 0
        pred = bit if pred is None else pred & bit
    return pred


def bloom_prefilter(
    fact: DataFrame,
    keys: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = M_BITS,
    k: int = N_HASHES,
) -> DataFrame:
    """Thin ``fact`` to rows whose ``fact_key`` is *probably* in
    ``keys[dim_key]`` — no false negatives, a tunable false-positive
    residue (~(1-e^{-kn/m})^k) that a following exact join removes.

    The filter is materialized with one bounded collect — m_bits/64
    longs (here 128) regardless of key cardinality — and inlined as an
    array LITERAL in the predicate. That is deliberate and matches how
    Spark's own runtime bloom filter injects its result into the scan:
    expressed as a join instead, Catalyst is free to reorder the exact
    semi join BELOW the bloom test (observed at fixture scale), which
    silently turns the prefilter into a postfilter. A literal predicate
    cannot be reordered above a join — filter pushdown only ever moves
    it closer to the scan."""
    bloom_row = (
        bloom_build(keys.select(F.col(dim_key).alias("_bk")), "_bk", m_bits, k)
        .collect()[0][0]
    )
    words = [0] * (m_bits // 64)
    for w, word in (bloom_row or {}).items():
        words[int(w)] = int(word)
    return fact.filter(bloom_might_contain(words, fact_key, m_bits, k))
