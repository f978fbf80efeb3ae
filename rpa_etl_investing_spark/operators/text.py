"""Text-analysis operators (SURVEY §2.10 L4): language-ID heuristic,
quality scoring, token statistics, document fingerprinting.

All built-in Column expressions (no UDFs); every score is integer-exact
or a deterministic double expression so the DuckDB oracle reproduces it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rpa_etl_investing_spark.operators.dedup import shingles, spread, tokens_col

# Tiny deterministic keyword lexicons over the fixture vocabulary —
# stand-ins for real per-language frequency tables; the operator shape
# (token-set overlap scoring + argmax) is the real thing.
LANG_LEXICONS: dict[str, list[str]] = {
    "en": ["the", "a", "fast", "slow", "small", "order", "key", "line"],
    "de": ["data", "hash", "batch", "window", "filter"],
    "es": ["vector", "columna", "fila", "tabla", "part"],
}

STOPWORDS = ["the", "a", "of", "and"]


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language-ID: distinct-token overlap with each lexicon,
    argmax with deterministic tie-break (lexicon order en→de→es)."""
    toks = F.array_distinct(tokens_col(text_col))
    scores = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in LANG_LEXICONS.items()
    }
    s_en, s_de, s_es = scores["en"], scores["de"], scores["es"]
    pred = (
        F.when((s_en >= s_de) & (s_en >= s_es), F.lit("en"))
        .when(s_de >= s_es, F.lit("de"))
        .otherwise(F.lit("es"))
    )
    return docs.select(
        "doc_id",
        "lang",
        s_en.alias("score_en"),
        s_de.alias("score_de"),
        s_es.alias("score_es"),
        pred.alias("pred_lang"),
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / token-length / stopword-ratio quality features + a simple
    composite score — the standard pre-training corpus filter shape."""
    toks = tokens_col(text_col)
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*STOPWORDS))
    )
    avg_tok_len = (n_chars - (n_tokens - 1)) / n_tokens  # chars minus separators
    stop_ratio = stop_hits / n_tokens
    score = (
        F.when(n_tokens < 5, 0.0)
        .when(stop_ratio > 0.5, 0.25)
        .otherwise(1.0 - stop_ratio)
    )
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars_actual"),
        avg_tok_len.alias("avg_token_len"),
        stop_hits.alias("stopword_hits"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality"),
    )


def token_stats(docs: DataFrame, text_col: str = "text", k: int = 20) -> DataFrame:
    """Corpus-level token frequencies, top-k with deterministic tie-break."""
    ex = docs.select(F.explode(tokens_col(text_col)).alias("token"))
    counts = ex.groupBy("token").agg(F.count("*").alias("freq"))
    return counts.orderBy(F.desc("freq"), F.asc("token")).limit(k)


ROLLING_BASE = 257
ROLLING_MOD = 2_147_483_647  # 2^31 − 1: base·mod product stays in int64


def rolling_hash_fingerprint(
    docs: DataFrame, text_col: str = "text", k: int = 8, n_keep: int = 4
) -> DataFrame:
    """L4: Rabin–Karp rolling-hash fingerprint — polynomial hash of every
    ``k``-char window, fingerprint = the ``n_keep`` smallest distinct
    hash values (winnowing selection). All JVM-side higher-order
    expressions (``transform`` + ``aggregate`` fold), no Python.

    The hash of window i folds left over char codes:
    ``h = ((h·B) + code) mod M`` — the same fold DuckDB's
    ``list_reduce`` computes, so the oracle reproduces it bit-exactly.
    """
    windows = (
        f"CASE WHEN length({text_col}) < {k} THEN array() "
        f"ELSE transform(sequence(1, length({text_col}) - {k} + 1), i -> "
        f"  aggregate(sequence(1, {k - 1}), CAST(ascii(substring({text_col}, i, 1)) AS BIGINT), "
        f"    (acc, j) -> (acc * {ROLLING_BASE} + ascii(substring({text_col}, CAST(i + j AS INT), 1))) % {ROLLING_MOD})) "
        f"END"
    )
    return docs.selectExpr(
        "doc_id",
        f"CAST(size({windows}) AS BIGINT) AS n_windows",
        f"array_join(slice(array_sort(array_distinct({windows})), 1, {n_keep}), '-') AS fingerprint",
    )


def document_fingerprint(docs: DataFrame, text_col: str = "text", n: int = 4) -> DataFrame:
    """Winnowing-style fingerprint: the ``n`` lexicographically smallest
    distinct shingle md5s, concatenated — a compact near-dup key."""
    ex = spread(docs, "doc_id").select(
        "doc_id", F.explode(shingles(text_col)).alias("sh")
    ).distinct()
    hashed = ex.select("doc_id", F.md5(F.col("sh").cast("binary")).alias("h"))
    agg = hashed.groupBy("doc_id").agg(
        F.concat_ws("", F.slice(F.array_sort(F.collect_set("h")), 1, n)).alias(
            "fingerprint"
        ),
        F.count("*").alias("n_shingles"),
    )
    return agg
