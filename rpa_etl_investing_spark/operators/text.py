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


def tf_idf_topk(docs: DataFrame, text_col: str = "text", k: int = 3) -> DataFrame:
    """Per-document top-k salient terms by tf-idf (raw-idf variant:
    ``tf · N / df`` — log-free so one integer multiply and one double
    division reproduce bit-exactly on any engine; log-idf reorders terms
    only across widely different df magnitudes).

    Scale shape: explode → (doc,term) hash aggregate for tf; (term)
    aggregate for df; tf⋈df is a key-partitioned equi-join on term (df
    side is vocab-sized — aggregated, but NOT assumed broadcastable at
    corpus scale); N rides in as a broadcast 1-row cross join; per-doc
    top-k is one window partitioned by doc_id."""
    from pyspark.sql.window import Window as W

    ex = spread(docs, "doc_id").select(
        "doc_id", F.explode(tokens_col(text_col)).alias("term")
    )
    tf = ex.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # df = rows per term in the ALREADY-AGGREGATED tf relation (one row
    # per (doc, term) by construction) — reusing it replaces a second
    # corpus-sized explode + (doc, term) distinct shuffle with a tiny
    # re-aggregate, and the identical tf subtree lets Spark's exchange
    # reuse fire instead of recomputing the explode
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            ((F.col("tf") * F.col("n_docs")).cast("double") / F.col("df")).alias(
                "tfidf"
            ),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def vocab_coverage(docs: DataFrame, text_col: str = "text", k: int = 50) -> DataFrame:
    """Tokenizer-vocabulary building: global token frequencies, top-k by
    frequency, each with its cumulative corpus-coverage fraction — the
    "how much of the corpus do the first k vocab entries explain" curve.

    The corpus-wide count is one hash aggregate; the cumulative window
    runs AFTER the top-k limit, so the single-partition prefix sum only
    ever sees k rows regardless of corpus size."""
    from pyspark.sql.window import Window as W

    ex = docs.select(F.explode(tokens_col(text_col)).alias("token"))
    counts = ex.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    total = counts.agg(F.sum("freq").alias("total_tokens"))
    top = counts.orderBy(F.desc("freq"), F.asc("token")).limit(k)
    w = (
        # bounded-window: k rows after limit
        W.orderBy(F.desc("freq"), F.asc("token"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        top.withColumn("cum_freq", F.sum("freq").over(w))
        .crossJoin(F.broadcast(total))
        .select(
            "token",
            "freq",
            "cum_freq",
            (F.col("cum_freq").cast("double") / F.col("total_tokens")).alias(
                "coverage"
            ),
        )
    )


def repetition_ratio(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals per document: the most
    frequent token's share of the doc and the distinct-token ratio —
    high top-token share / low distinct ratio flags degenerate repetitive
    text that a pre-training filter drops.

    Scale shape: explode → (doc, token) hash aggregate → per-doc argmax
    window + per-doc totals from the same aggregate (one explode, one
    shuffle on doc_id, ratios are single exact-int divisions)."""
    from pyspark.sql.window import Window as W

    ex = spread(docs, "doc_id").select(
        "doc_id", F.explode(tokens_col(text_col)).alias("token")
    )
    per_tok = ex.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("freq"))
    w = W.partitionBy("doc_id")
    w_rank = w.orderBy(F.desc("freq"), F.asc("token"))
    return (
        per_tok.withColumn("n_tokens", F.sum("freq").over(w))
        .withColumn("n_distinct", F.count(F.lit(1)).over(w))
        .withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            "n_tokens",
            "n_distinct",
            F.col("token").alias("top_token"),
            F.col("freq").alias("top_freq"),
            (F.col("freq").cast("double") / F.col("n_tokens")).alias("top_ratio"),
            (F.col("n_distinct").cast("double") / F.col("n_tokens")).alias(
                "distinct_ratio"
            ),
        )
    )


def token_entropy(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc Shannon entropy of the token distribution — the
    information-density quality signal (low entropy = repetitive /
    template-heavy text; used alongside the Gopher repetition rules).

    Engine-exact form: H = ln(n) − (1/n)·Σ c·ln(c) (nats). The only
    transcendentals, ``ln(n)`` and ``c·ln(c)``, are quantized to the
    1e-6 integer grid the moment they are computed (the DSIR trick,
    operators/importance.py), so both reductions are exact BIGINT sums:
    ``entropy_q = n·q(ln n) − Σ q(c·ln c)`` is an integer (scaled by
    n·1e6) no shuffle order can perturb; the readable double divides
    two exact integers at the end.

    Scale shape: one token explode into a (doc, token) hash-aggregate
    (map-side combine collapses the fan-out), then a per-doc aggregate —
    the same two-shuffle profile as tf-idf; text never shuffles."""
    ex = docs.select("doc_id", F.explode(tokens_col(text_col)).alias("tok"))
    per = ex.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    q_clnc = F.floor(
        F.lit(1e6) * F.col("c") * F.log(F.col("c").cast("double")) + F.lit(0.5)
    ).cast("bigint")
    terms = per.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count("*").cast("bigint").alias("n_distinct"),
        F.sum(q_clnc).cast("bigint").alias("s_clnc"),
    )
    q_lnn = F.floor(
        F.lit(1e6) * F.log(F.col("n_tokens").cast("double")) + F.lit(0.5)
    ).cast("bigint")
    hq = F.col("n_tokens") * q_lnn - F.col("s_clnc")
    return terms.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        hq.alias("entropy_q"),
        (hq / (F.lit(1e6) * F.col("n_tokens"))).alias("entropy_nats"),
    )


def bigram_counts(docs: DataFrame, text_col: str = "text", k: int = 20) -> DataFrame:
    """Bigram language-model counts: adjacent token pairs (2-shingles),
    global top-k with deterministic tie-break — the n-gram-LM/statistics
    sibling of :func:`token_stats`. Map-side explode with partial
    aggregation; one shuffle on the bigram key."""
    ex = docs.select(F.explode(shingles(text_col, k=2)).alias("bigram"))
    counts = ex.groupBy("bigram").agg(F.count(F.lit(1)).alias("freq"))
    return counts.orderBy(F.desc("freq"), F.asc("bigram")).limit(k)


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
    # materialize the window array ONCE as a concrete column: the two
    # output expressions would otherwise each embed the whole O(len·k)
    # higher-order sweep, and HOFs sit outside whole-stage codegen so
    # subexpression elimination cannot be relied on to merge them (the
    # same once-per-row projection discipline as simhash64's halves)
    return docs.selectExpr("doc_id", f"{windows} AS _w").selectExpr(
        "doc_id",
        "CAST(size(_w) AS BIGINT) AS n_windows",
        f"array_join(slice(array_sort(array_distinct(_w)), 1, {n_keep}), '-') AS fingerprint",
    )


def document_fingerprint(docs: DataFrame, text_col: str = "text", n: int = 4) -> DataFrame:
    """Winnowing-style fingerprint: the ``n`` lexicographically smallest
    distinct shingle md5s, concatenated — a compact near-dup key."""
    # distinct shingles dedup map-side (one row per doc), as in the
    # dedup.py signature pipelines
    ex = spread(docs, "doc_id").select(
        "doc_id", F.explode(F.array_distinct(shingles(text_col))).alias("sh")
    )
    hashed = ex.select("doc_id", F.md5(F.col("sh").cast("binary")).alias("h"))
    agg = hashed.groupBy("doc_id").agg(
        F.concat_ws("", F.slice(F.array_sort(F.collect_set("h")), 1, n)).alias(
            "fingerprint"
        ),
        F.count("*").alias("n_shingles"),
    )
    return agg


def benchmark_contamination(
    docs: DataFrame,
    bench_max_id: int = 10,
    text_col: str = "text",
    k: int = 3,
    flag_ratio: float = 0.1,
) -> DataFrame:
    """Decontamination scan: how much of each corpus document's k-gram
    set also appears in a benchmark/eval set — the check a training
    pipeline runs so eval data doesn't leak into the training corpus
    (corpus docs overlapping a benchmark get flagged and dropped).

    The benchmark here is the fixture docs with ``doc_id < bench_max_id``
    (a stand-in for an external eval suite); its DISTINCT shingle set is
    small by construction, so the overlap probe is a broadcast semi-ish
    join on the shingle — the corpus side explodes once (spread first,
    one pre-fan-out shuffle) and aggregates per doc_id on its existing
    partitioning. Output: per-doc shingle count, contaminated-shingle
    count, ratio, and the drop flag at ``flag_ratio``.
    """
    # per-doc distinct shingles dedup map-side (one row per doc); the
    # benchmark side still needs its global distinct below
    ex = spread(docs, "doc_id").select(
        "doc_id", F.explode(F.array_distinct(shingles(text_col, k))).alias("sh")
    )
    bench_sh = (
        ex.filter(F.col("doc_id") < bench_max_id).select("sh").distinct()
    )
    corpus = ex.filter(F.col("doc_id") >= bench_max_id)
    hit = F.broadcast(bench_sh.withColumn("_hit", F.lit(1)))
    joined = corpus.join(hit, "sh", "left")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sh"),
            F.sum(F.coalesce("_hit", F.lit(0))).alias("n_contaminated"),
        )
        .select(
            "doc_id",
            "n_sh",
            "n_contaminated",
            (F.col("n_contaminated") / F.col("n_sh")).alias("contamination_ratio"),
            (F.col("n_contaminated") / F.col("n_sh") >= flag_ratio).alias("flagged"),
        )
    )


def segment_boilerplate_strip(
    docs: DataFrame,
    seg_words: int = 8,
    max_df: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sub-document (segment-level) deduplication — the line/paragraph
    boilerplate-removal stage of a web-corpus pipeline (CCNet-style),
    expressed over fixed ``seg_words``-word segments because the fixture
    text has no newlines: any segment appearing in more than ``max_df``
    DISTINCT documents is boilerplate and is stripped from every
    document; the per-document survivors are reassembled in order.
    Returns ``(doc_id, n_segments, n_kept, clean_text)`` — a document
    that was pure boilerplate survives with ``clean_text = ''``, so the
    audit trail never silently loses a row.

    Scale design: segmentation is JVM-side ``sequence``/``slice``/
    ``posexplode`` (no UDF); document-frequency counting groups on
    ``md5(segment)`` so the df shuffle moves 32-byte hashes + ids, not
    segment text; the boilerplate set (hashes above ``max_df``) is the
    small side of a LEFT ANTI join keyed on ``seg_hash`` — deliberately
    NOT hint-pinned, because at web scale the set of cross-document
    repeated segments grows with the corpus (at ``max_df=1`` it is ALL
    duplicated content): AQE broadcasts it while it fits and shuffles
    the anti join when it doesn't. The only text-bearing shuffle is the
    final per-document reassembly groupBy, which any reconstruction
    needs and which partitions on the high-cardinality doc id."""
    toks = F.split(F.col(text_col), " ")
    n_segs = F.ceil(F.size(toks) / float(seg_words)).cast("int")
    segs = (
        docs.select(
            id_col,
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), n_segs - 1),
                    lambda s: F.array_join(
                        F.slice(toks, s * seg_words + 1, seg_words), " "
                    ),
                )
            ).alias("seg_no", "segment"),
        )
        .withColumn("seg_hash", F.md5(F.col("segment")))
    )
    boiler = (
        segs.groupBy("seg_hash")
        .agg(F.countDistinct(id_col).alias("df"))
        .filter(F.col("df") > max_df)
        .select("seg_hash")
    )
    kept = segs.join(boiler, "seg_hash", "left_anti")
    reassembled = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg_no", "segment"))),
                lambda x: x["segment"],
            ),
            " ",
        ).alias("clean_text"),
    )
    totals = segs.groupBy(id_col).agg(F.count(F.lit(1)).cast("int").alias("n_segments"))
    return (
        totals.join(reassembled, id_col, "left")
        .select(
            id_col,
            "n_segments",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


def gopher_gate(
    docs: DataFrame,
    min_tokens: int = 20,
    max_top_ratio: float = 0.12,
    min_distinct_ratio: float = 0.35,
    max_stopword_ratio: float = 0.5,
) -> DataFrame:
    """Gopher-style rule-based document gate: combine the length/stopword
    features of :func:`quality_score` with the repetition signals of
    :func:`repetition_ratio` into named pass/fail rules plus an overall
    verdict — the standard pre-training heuristic filter stage, with the
    per-rule audit columns a pipeline needs to report WHY documents were
    dropped (not just how many).

    Scale design: both inputs end partitioned by doc_id (quality is
    map-only over the doc scan; repetition is one explode + doc-keyed
    aggregate), so the combining join is a co-partitioned equi-join on
    the high-cardinality doc id; every rule is a scalar comparison of
    exact-integer ratios — no UDFs, no extra shuffle beyond the join."""
    q = quality_score(docs).select("doc_id", "n_tokens", "stopword_ratio")
    r = repetition_ratio(docs).select(
        "doc_id", "top_ratio", "distinct_ratio"
    )
    flags = q.join(r, "doc_id").select(
        "doc_id",
        "n_tokens",
        (F.col("n_tokens") < min_tokens).alias("too_short"),
        (F.col("top_ratio") > max_top_ratio).alias("too_repetitive"),
        (F.col("distinct_ratio") < min_distinct_ratio).alias("low_diversity"),
        (F.col("stopword_ratio") > max_stopword_ratio).alias("too_stoppy"),
    )
    return flags.withColumn(
        "passes",
        ~(
            F.col("too_short")
            | F.col("too_repetitive")
            | F.col("low_diversity")
            | F.col("too_stoppy")
        ),
    )


def repeated_spans(
    docs: DataFrame,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_shingles: bool = False,
) -> DataFrame:
    """Cross-document repeated-substring discovery — the find stage of
    exact-substring deduplication (the "train-data repeated 50-grams"
    pipeline pass): every maximal token span whose 3-grams ALL occur in
    at least ``min_docs`` distinct documents, reported per document as
    ``(doc_id, span_start, span_tokens)`` so a later pass can excise
    (not drop) the duplicated stretch. The same gaps-and-islands merge
    as span decontamination, but against the corpus itself instead of a
    broadcast benchmark.

    Scale design: positions come from one JVM-side posexplode; the
    duplicated-shingle set is corpus-sized, so it is NOT broadcast —
    the probe is a key-partitioned equi-join on the shingle (both sides
    shuffle compact (shingle, id, pos) rows once), unlike the benchmark
    variant where the small side broadcasts. The island merge windows
    over HIT positions only, partitioned by the high-cardinality doc
    id. ``hash_shingles=True`` swaps the raw shingle join key for its
    8-byte xxhash64 so both post-explode shuffles carry longs instead
    of k-word strings — semantics unchanged absent 64-bit collisions
    (a collision can only over-count a shingle's document frequency,
    ≈ n²/2⁶⁵ odds across distinct shingles)."""
    from pyspark.sql.window import Window as W

    from rpa_etl_investing_spark.operators.dedup import shingles, spread

    pos = spread(docs, id_col).select(
        id_col, F.posexplode(shingles(text_col)).alias("i", "sh")
    )
    if hash_shingles:
        pos = pos.select(id_col, "i", F.xxhash64("sh").alias("sh"))
    dup = (
        pos.groupBy("sh")
        .agg(F.countDistinct(id_col).alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("sh")
    )
    hit = pos.join(dup, "sh").select(id_col, "i")
    w = W.partitionBy(id_col).orderBy("i")
    return (
        hit.withColumn("grp", F.col("i") - F.row_number().over(w))
        .groupBy(id_col, "grp")
        .agg(
            F.min("i").cast("long").alias("span_start"),
            (F.max("i") - F.min("i") + F.lit(3)).cast("long").alias("span_tokens"),
        )
        .drop("grp")
    )


def excise_spans(
    docs: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Surgical span excision — the apply stage that pairs with
    :func:`repeated_spans` / span decontamination: given per-document
    token spans ``(id, span_start, span_tokens)``, remove exactly those
    token positions and reassemble the remaining text in order.
    Returns ``(doc_id, n_tokens_before, n_tokens_removed, clean_text)``
    for every input document (documents with no spans pass through
    untouched; a fully-covered document survives with empty text).

    Scale design: the drop set explodes spans into (id, position) pairs
    — sized by total span length, not corpus length; the kept-token
    anti join and the reassembly both key on the high-cardinality doc
    id. Token positions come from one posexplode; nothing is ever
    compared all-pairs. The reassembly groupBy is the one text-bearing
    shuffle, inherent to reconstruction."""
    toks = docs.select(
        id_col, F.posexplode(F.split(F.col(text_col), " ")).alias("i", "tok")
    )
    drop = spans.select(
        id_col,
        F.explode(
            F.sequence(
                F.col("span_start"),
                F.col("span_start") + F.col("span_tokens") - 1,
            )
        ).alias("i"),
    ).distinct()
    kept = toks.join(drop, [id_col, "i"], "left_anti")
    reassembled = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "tok"))),
                lambda x: x["tok"],
            ),
            " ",
        ).alias("clean_text"),
    )
    totals = docs.select(
        id_col,
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens_before"),
    )
    return (
        totals.join(reassembled, id_col, "left")
        .select(
            id_col,
            "n_tokens_before",
            (
                F.col("n_tokens_before") - F.coalesce("n_tokens_kept", F.lit(0))
            ).alias("n_tokens_removed"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


# Characters a web-scraped corpus drags in that tokenizers choke on:
# C0 controls, DEL, NBSP, zero-width joiners/space, BOM. Java regex and
# RE2 both accept the \x{...} escape, so ONE pattern string serves the
# Spark expression and the DuckDB oracle verbatim.
JUNK_CHAR_CLASS = r"[\x{0000}-\x{0008}\x{000B}\x{000C}\x{000E}-\x{001F}\x{007F}\x{00A0}\x{200B}-\x{200D}\x{FEFF}]"


def normalize_text(col):
    """Whitespace/control-char normalization for scraped text: junk chars →
    space, tab/newline → space, runs collapsed, ends trimmed.

    Pure per-row projection (regexp_replace chain) — no shuffle, fully
    pipelined into the scan, whole-stage-codegen'd; at 100 TB this is
    the cheapest possible shape (one pass, no state). Expressed with
    built-ins only so Catalyst keeps pushdown/pruning through it.
    """
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.regexp_replace(c, JUNK_CHAR_CLASS, " ")
    cleaned = F.regexp_replace(cleaned, r"[\t\n\r]", " ")
    return F.trim(F.regexp_replace(cleaned, " {2,}", " "))


def winnowing_fingerprints(
    docs: DataFrame, text_col: str = "text", k: int = 8, w: int = 4
) -> DataFrame:
    """True MOSS winnowing (Schleimer, Wilkerson & Aiken, SIGMOD'03):
    over the Rabin–Karp hashes of every ``k``-char window, slide a
    ``w``-hash window and select each window's MINIMUM hash; the
    DISTINCT selected values are the document's fingerprint set.

    Unlike the min-``n`` selection in :func:`rolling_hash_fingerprint`
    (a fixed-size global sketch), winnowing gives the MOSS guarantee:
    any substring match of length ≥ ``w + k − 1`` chars shares at least
    one selected fingerprint, at expected density 2/(w+1) — the
    property plagiarism/memorization scanners rely on. Documents with
    fewer than ``w`` hashes contribute their single minimum (the
    degenerate one-window case); documents shorter than ``k`` select
    nothing.

    Entirely map-side per document (a doc is one row): the hash array
    and the window-min sweep are JVM higher-order expressions, O(n·k +
    n·w) per doc, no Python, no shuffle. Returns
    ``(doc_id, n_kgrams, selected: array<bigint>)``.

    Expression-shape note (measured, r6): the obvious two-Project form
    (materialize the hash array ``_w``, then select window minima over
    it) is QUADRATIC in practice — CollapseProject merges the
    Projects and substitutes the whole O(n·k) hash sweep into every
    ``slice(_w, s, w)`` reference, and HOFs run interpreted outside
    codegen CSE, so each document cost O(n²·k) (≈12 s for 500 small
    docs; ~17 min at sf0.1 corpus shape). The fix is the LET-BINDING
    idiom: ``transform(array(<hashes>), _w -> <selection>)[0]`` binds
    the hash array ONCE per row as a lambda variable that no optimizer
    rule can inline, keeping the whole thing one linear expression;
    ``n_kgrams`` is the closed form ``len−k+1``, not a recount."""
    hashes = (
        f"transform(sequence(1, length({text_col}) - {k} + 1), i -> "
        f"  aggregate(sequence(1, {k - 1}), CAST(ascii(substring({text_col}, i, 1)) AS BIGINT), "
        f"    (acc, j) -> (acc * {ROLLING_BASE} + ascii(substring({text_col}, CAST(i + j AS INT), 1))) % {ROLLING_MOD}))"
    )
    sel_body = (
        f"CASE WHEN size(_w) < {w} THEN array(array_min(_w)) "
        f"ELSE array_distinct(transform(sequence(1, size(_w) - {w} + 1), "
        f"s -> array_min(slice(_w, s, {w})))) END"
    )
    selected = (
        f"CASE WHEN length({text_col}) < {k} THEN array() "
        f"ELSE element_at(transform(array({hashes}), _w -> {sel_body}), 1) END"
    )
    return docs.selectExpr(
        "doc_id",
        f"CAST(greatest(0, length({text_col}) - {k} + 1) AS BIGINT) AS n_kgrams",
        f"{selected} AS selected",
    )
