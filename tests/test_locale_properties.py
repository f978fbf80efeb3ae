"""Property-based tests (hypothesis) for the locale parsers.

The oracle inside each property is the reference's own Python transform
chain (``/root/reference/main.py:101-104``) run per-value; the engine's
vectorized Column expression must agree on every input hypothesis can
construct — including the ambiguous ``"1.234"`` → ``1234.0`` case and
arbitrary junk (where the reference raises and skips the row, the
engine must yield NULL).

One Spark round-trip per test would be slow per-example; instead each
property collects examples and the Spark comparison runs once per test
over the whole batch (hypothesis drives generation, Spark evaluates
vectorized — the same shape the engine uses in production).
"""

from __future__ import annotations

import pytest

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F
from pyspark.sql import types as T

from rpa_etl_investing_spark.functions.locale import (
    parse_brazilian_number,
    parse_percent_variation,
)


def _reference_parse(texto: str, percent: bool = False) -> float | None:
    """The reference's transform chain, verbatim semantics
    (main.py:101-104): strip, drop dots, comma→dot (+ strip +/% for
    percents); ValueError/AttributeError → row skipped (None here)."""
    try:
        s = texto.strip().replace(".", "").replace(",", ".")
        if percent:
            s = s.replace("+", "").replace("%", "")
        return float(s)
    except (ValueError, AttributeError):
        return None


def _spark_parse_all(spark, values: list[str], percent: bool) -> list[float | None]:
    df = spark.createDataFrame(
        [(v,) for v in values], T.StructType([T.StructField("raw", T.StringType())])
    )
    fn = parse_percent_variation if percent else parse_brazilian_number
    # keep input order via an index column
    out = (
        df.withColumn("i", F.monotonically_increasing_id())
        .withColumn("parsed", fn("raw"))
        .orderBy("i")
        .select("parsed")
        .collect()
    )
    return [r.parsed for r in out]


# a generator biased toward locale-shaped strings but including junk
_locale_text = st.one_of(
    st.from_regex(r" ?[+-]?[0-9]{1,3}(\.[0-9]{3}){0,3}(,[0-9]{1,6})?%? ?", fullmatch=True),
    st.text(alphabet="0123456789.,+-% aezX", max_size=12),
)


def _agree(a: float | None, b: float | None) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if a != a:  # NaN (e.g. input "nan"): Python float() and Spark agree
        return b != b
    return a == b


@settings(max_examples=25, deadline=None)
@given(st.lists(_locale_text, min_size=20, max_size=120))
@pytest.mark.slow
def test_number_parse_matches_reference_semantics(spark, batch):
    want = [_reference_parse(v) for v in batch]
    got = _spark_parse_all(spark, batch, percent=False)
    assert all(_agree(g, w) for g, w in zip(got, want)), list(
        (v, g, w) for v, g, w in zip(batch, got, want) if not _agree(g, w)
    )


@settings(max_examples=25, deadline=None)
@given(st.lists(_locale_text, min_size=20, max_size=120))
@pytest.mark.slow
def test_percent_parse_matches_reference_semantics(spark, batch):
    want = [_reference_parse(v, percent=True) for v in batch]
    got = _spark_parse_all(spark, batch, percent=True)
    assert all(_agree(g, w) for g, w in zip(got, want)), list(
        (v, g, w) for v, g, w in zip(batch, got, want) if not _agree(g, w)
    )


def test_known_literals(spark):
    cases = {
        "128.594,07": 128594.07,
        " 1.234 ": 1234.0,  # ambiguous case — reference strips ALL dots
        "0,99": 0.99,
        "1.2.3": 123.0,
        "n/a": None,
        "": None,
    }
    got = _spark_parse_all(spark, list(cases), percent=False)
    assert got == list(cases.values())
    pct = {"+1,25%": 1.25, "-0,47%": -0.47, "0,00%": 0.0, "++5%": None}
    # "++5%" → "++5"→ stripped to "5"? reference: replace all '+' → "5" → 5.0
    pct["++5%"] = 5.0
    got_pct = _spark_parse_all(spark, list(pct), percent=True)
    assert got_pct == list(pct.values())


def test_normalize_text_is_idempotent(spark):
    """normalize o normalize == normalize for arbitrary junk-laden
    strings (hypothesis over a junk+word alphabet)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rpa_etl_investing_spark.operators.text import normalize_text

    alphabet = st.sampled_from(
        list("ab c") + [" ", "\u00a0", "\u200b", "\t", "\n", "\u0007", "\ufeff"]
    )

    @given(st.lists(st.text(alphabet=alphabet, max_size=8), min_size=1, max_size=6))
    @settings(max_examples=15, deadline=None)
    def check(strs):
        from pyspark.sql import functions as F

        df = spark.createDataFrame([(s,) for s in strs], "raw string")
        out = df.select(
            normalize_text("raw").alias("once")
        ).select("once", normalize_text("once").alias("twice"))
        assert out.filter(F.col("once") != F.col("twice")).count() == 0

    check()
