"""LLM-data-pipeline operators (SURVEY §2.10, north star BASELINE.json:6).

Deduplication, similarity search, text analysis and multimodal-column
plumbing — the operations a large-scale training-data pipeline needs,
built on the same declarative core as the relational surface.

Cross-engine determinism rule: every quantity an oracle checks is
derived from hashes both engines can replay — md5/sha2 hex parsed to
integers digit-by-digit on the DuckDB side (minhash universal-hash
mixes, simhash majority votes, content digests), or 64-bit xxhash64
where only Spark-side key compaction is needed and the oracle checks
the VALUES that flow over those keys (hashed shingle/span variants,
bloom, count-min, salting). Floating point never feeds a comparison:
reductions accumulate in DECIMAL/BIGINT grids and cast once at the
end. Each operator's docstring states its exact hash contract.
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
