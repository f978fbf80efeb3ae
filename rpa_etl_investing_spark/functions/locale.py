"""Locale-aware numeric normalization (SURVEY §2.8 F1-F3).

Reimplements the reference's per-cell transform chain
(``/root/reference/main.py:101-104``):

    float(text.strip().replace(".", "").replace(",", "."))            # numbers
    float(text.strip().replace(".", "").replace(",", ".")
              .replace("+", "").replace("%", ""))                     # percents

as vectorized Column expressions. Reference semantics are preserved
exactly, including the ambiguous case: ``"1.234"`` → ``1234.0``
(strip ALL dots first — SURVEY §7.4). Unparseable input becomes NULL
(``try_cast``) instead of the reference's silent row skip
(``main.py:116-117``); callers count/filter nulls so rejects are
observable (SURVEY §4 anti-pattern note).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_brazilian_number(col: Column | str) -> Column:
    """``" 128.594,07 "`` → ``128594.07`` (DoubleType; NULL if unparseable)."""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.regexp_replace(
        F.regexp_replace(F.trim(c), r"\.", ""), ",", "."
    )
    return normalized.try_cast("double")


def parse_percent_variation(col: Column | str) -> Column:
    """``"+1,25%"`` → ``1.25``; ``"-0,47%"`` → ``-0.47`` (DoubleType).

    Mirrors ``main.py:104``: strip ``+``/``%`` on top of the numeric
    normalization.
    """
    c = F.col(col) if isinstance(col, str) else col
    return parse_brazilian_number(F.regexp_replace(F.trim(c), r"[+%]", ""))
