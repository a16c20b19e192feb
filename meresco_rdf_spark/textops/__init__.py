"""Training-data pipeline operators over document / embedding tables:
dedup (exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding cosine),
similarity search, text analysis, multimodal column plumbing."""
