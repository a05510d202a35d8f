"""Spark operators: extraction pipeline, skew handling, lineage/resume,
dedup, similarity search, text statistics."""
