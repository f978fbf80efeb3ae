"""LLM-data-pipeline operators (SURVEY §2.10, north star BASELINE.json:6).

Deduplication, similarity search, text analysis and multimodal-column
plumbing — the operations a large-scale training-data pipeline needs,
built on the same declarative core as the relational surface.

Cross-engine determinism rule: every hash these operators use is
md5-hex (identical text in Spark and DuckDB), compared/min-ed as
fixed-width hex strings, so the DuckDB oracle can reproduce signatures
bit-for-bit.
"""

from rpa_etl_investing_spark.operators.dedup import (
    exact_dedup,
    minhash_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_signatures,
    shingles,
)
from rpa_etl_investing_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_dup_pairs,
    ivf_topk,
    sign_lsh_bucket_topk,
    sign_lsh_buckets,
)
from rpa_etl_investing_spark.operators.text import (
    document_fingerprint,
    language_id,
    quality_score,
    token_stats,
)

__all__ = [
    "exact_dedup",
    "shingles",
    "minhash_signatures",
    "minhash_candidate_pairs",
    "simhash_signatures",
    "ngram_jaccard_pairs",
    "brute_force_topk",
    "embedding_near_dup_pairs",
    "ivf_topk",
    "sign_lsh_buckets",
    "sign_lsh_bucket_topk",
    "language_id",
    "quality_score",
    "token_stats",
    "document_fingerprint",
]
