"""Structured Streaming surface: incremental transcript ingest ->
mention/triple streams with watermarked windowed aggregation."""
