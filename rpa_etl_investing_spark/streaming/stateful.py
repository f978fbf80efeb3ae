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
