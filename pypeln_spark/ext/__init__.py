"""LLM-data-pipeline extensions — the operators a 100 TB training-data
pipeline needs beyond the reference surface: deduplication (exact, MinHash
LSH, SimHash, n-gram Jaccard, embedding near-dup), similarity search
(brute-force + LSH-bucketed ANN), text analysis (tokens, quality, lang-id,
fingerprints) and multimodal column plumbing.
"""

from . import dedup, hashing, multimodal, similarity, text  # noqa: F401
