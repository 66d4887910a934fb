"""Training-data pipeline operators over the documents / embeddings tables:
deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding
cosine), similarity search (brute-force + LSH-bucketed ANN), text analysis
(token counting, quality scoring, language-ID, fingerprinting) and
multimodal binary-column plumbing.
"""

from . import dedup, joins, multimodal, relational, similarity, textstats  # noqa: F401
