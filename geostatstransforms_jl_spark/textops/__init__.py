from .dedup import (
    exact_dedup,
    minhash_signatures,
    minhash_lsh_pairs,
    minhash_dedup,
    minhash_dedup_cc,
    simhash_64,
    simhash_pairs,
    hamming_neardup_pairs,
    ngram_jaccard_pairs,
)
from .quality import lang_id, quality_scores, token_stats, doc_fingerprint
from .packing import hash_split, chunk_pack, chunk_pack_sorted

__all__ = [
    "exact_dedup",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "minhash_dedup",
    "minhash_dedup_cc",
    "simhash_64",
    "simhash_pairs",
    "hamming_neardup_pairs",
    "ngram_jaccard_pairs",
    "lang_id",
    "quality_scores",
    "token_stats",
    "doc_fingerprint",
    "hash_split",
    "chunk_pack",
    "chunk_pack_sorted",
]
