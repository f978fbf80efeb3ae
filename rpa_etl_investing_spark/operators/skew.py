"""Skew-resistant join via key salting (SURVEY §2.3 J6 scale path).

A shuffled equi-join sends every row with the same key to one task; a
hot key (one customer with 10⁹ events) turns the whole stage into one
straggler. Salting splits each hot key into ``n_salts`` sub-keys:

- the *large* (skewed) side gets a deterministic salt derived from its
  own row content — ``xxhash64 % n`` — spreading the hot key over
  ``n_salts`` tasks;
- the *small* side is replicated ``n_salts`` times (explode over the
  salt range), so every (key, salt) pair still finds its match.

Cost model: the large side is shuffled once (as before, now balanced);
the small side pays ×``n_salts`` replication — choose the replicated
side as the smaller one, and ``n_salts`` ≈ the observed skew factor.
AQE's skew-join (enabled in session.py) handles moderate skew by
splitting oversized partitions post-shuffle; explicit salting is the
deliberate form that also works where AQE can't see the skew (e.g.
aggregation-after-join pipelines or non-AQE engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def salt_large_side(df: DataFrame, n_salts: int) -> DataFrame:
    """Deterministic per-row salt on the skewed side (hash of the whole
    row, not a random number — keeps re-runs and retries identical)."""
    return df.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)).cast("int")
    )


def replicate_small_side(df: DataFrame, n_salts: int) -> DataFrame:
    """Explode the compact side once per salt value."""
    return df.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the join key salted ``n_salts`` ways. Result is
    identical to ``large.join(small, on, how)`` for join types that
    preserve unmatched rows only on the LARGE side; the shuffle for any
    single key is spread over ``n_salts`` tasks.

    Right/full outer joins are rejected: the small side is replicated
    ``n_salts`` times, so a small-side row with no large-side match
    would surface once PER SALT instead of once — equivalence breaks.
    To salt those, swap the roles (salt the preserved side) or
    de-replicate with a post-join dedup keyed on the small side's key.
    """
    preserved_small = {"right", "rightouter", "right_outer", "full", "outer", "fullouter", "full_outer"}
    if how.lower().replace(" ", "") in preserved_small:
        raise ValueError(
            f"salted_join cannot express {how!r}: the replicated small "
            "side would emit unmatched rows once per salt"
        )
    left = salt_large_side(large, n_salts)
    right = replicate_small_side(small, n_salts)
    return left.join(right, [*on, SALT_COL], how).drop(SALT_COL)
