"""Custom stateful streaming operator (SURVEY §2.9 ST6).

``applyInPandasWithState``: per-key mutable state across micro-batches,
Arrow-batched. The demo keeps running per-user totals — the streaming
generalization of the reference's append-only snapshot accumulation
(each ``main.py`` run appends a timestamped observation per index;
``/root/reference/main.py:44,137-147``).

Scale notes: state lives in the executors' state store keyed by
``user_id`` — the shuffle partitions the stream by key once, and each
micro-batch touches only keys present in that batch. State size is
O(distinct keys), not O(events); eviction for idle keys would use a
``GroupStateTimeout`` in production.

Spark 4's successor API, ``transformWithStateInPandas`` (typed ValueState/
ListState/MapState, timers, TTL, RocksDB-backed), is the production choice
for new code; its Python worker requires ``google.protobuf``, which this
environment does not provide (verified: the worker dies with
``ImportError: cannot import name 'descriptor'``), so the operator here
uses the protobuf-free ``applyInPandasWithState`` — same state semantics,
same per-key shuffle shape.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n_events bigint, total_value double"


def _update_totals(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, value-sum), emitted each micro-batch the
    user appears in. Works on a streaming DataFrame; the final emission
    per user equals the batch ``groupBy(user_id).agg(count, sum)``."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


EWMA_OUTPUT_SCHEMA = "event_type string, n_days bigint, ewma double"
EWMA_STATE_SCHEMA = "n_days bigint, ewma double"
_EWMA_ALPHA = 0.25


def _update_ewma(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold the key's micro-batch into the running daily EWMA.

    Numerics contract: each event value is quantized to 1e-6 integer
    units BEFORE the per-day sum, so the day totals are exact integer
    arithmetic (order-independent — a float sum here would drift from
    the engine-side DECIMAL aggregation); the EWMA fold itself is the
    strict left fold over day totals in day order. Within a batch days
    are sorted; batches are assumed to arrive in event-time order (one
    batch in the registered demo) — production late data would need a
    reordering buffer keyed on the stored last day."""
    n_days, y = state.get if state.exists else (0, 0.0)
    # merge day totals across ALL the batch's Arrow chunks BEFORE
    # folding: a key whose rows span multiple chunks (≥ ~10k rows)
    # would otherwise fold a chunk-straddling day twice
    sums: dict = {}
    for pdf in pdfs:
        if not len(pdf):
            continue
        q = (pdf["value"].astype("float64") * 1e6).round().astype("int64")
        for day, total_q in q.groupby(pdf["ts"].dt.floor("D")).sum().items():
            sums[day] = sums.get(day, 0) + int(total_q)
    for day in sorted(sums):
        x = sums[day] / 1e6
        y = _EWMA_ALPHA * x + (1.0 - _EWMA_ALPHA) * y
        n_days += 1
    state.update((n_days, y))
    yield pd.DataFrame(
        {"event_type": [key[0]], "n_days": [n_days], "ewma": [y]}
    )


def running_type_ewma(events: DataFrame) -> DataFrame:
    """Per-event-type streaming EWMA of the daily value total — the
    stateful-numeric sibling of :func:`running_user_totals`: state is a
    constant-size (n_days, ewma) pair per key in the executor state
    store, each micro-batch folds its days in and emits the updated
    smoothed value. The batch equivalent is the distributed scan
    (operators/recurrence.py ewma); the final streaming emission per
    key equals the batch fold's last value."""
    return events.filter(events.event_type.isNotNull()).groupBy(
        "event_type"
    ).applyInPandasWithState(
        _update_ewma,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
