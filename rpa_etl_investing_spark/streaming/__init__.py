"""Event-time streaming operators (SURVEY §2.9).

The reference is batch, but each run appends a timestamped snapshot
(``/root/reference/main.py:44``) — repeated execution IS a micro-batch
stream. These operators are written against a plain DataFrame so the
same logical plan runs in batch mode (oracle-checkable on the static
``events`` table) and under ``readStream`` (demonstrated in
tests/test_streaming.py).
"""

from rpa_etl_investing_spark.streaming.joins import interval_join, static_enrich
from rpa_etl_investing_spark.streaming.sinks import (
    compact_journal,
    journal_upsert_sink,
)
from rpa_etl_investing_spark.streaming.stateful import (
    running_type_ewma,
    running_user_totals,
)
from rpa_etl_investing_spark.streaming.windows import (
    dedup_first_event,
    drop_late_events,
    sessionize,
    sliding_window_counts,
    tumbling_window_counts,
)

__all__ = [
    "compact_journal",
    "interval_join",
    "static_enrich",
    "journal_upsert_sink",
    "running_type_ewma",
    "running_user_totals",
    "tumbling_window_counts",
    "sliding_window_counts",
    "sessionize",
    "dedup_first_event",
    "drop_late_events",
]
