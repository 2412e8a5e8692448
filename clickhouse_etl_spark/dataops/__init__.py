"""dataops — large-scale training-data pipeline operators.

Beyond the reference's ETL surface: deduplication (exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine), similarity search (brute
cosine top-k + LSH-bucketed scale path), text analysis (language-ID,
quality scoring, token stats, fingerprinting), and multimodal binary
column plumbing.

Design rules: all hot-path math is Catalyst expressions (fold-based
deterministic hashing, integer arithmetic) so results are reproducible
across engines and the DuckDB oracle can replay them exactly; pairwise
work is always bucketed (shared-shingle / LSH band / block id) before
any O(n^2) comparison so the candidate set, not the corpus, is
quadratic.
"""

from .dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from .similarity import cosine_topk, embedding_near_dup_pairs
from .text import doc_fingerprint, language_id, quality_score, token_stats

__all__ = [
    "exact_dedup",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash",
    "cosine_topk",
    "embedding_near_dup_pairs",
    "language_id",
    "quality_score",
    "token_stats",
    "doc_fingerprint",
]
