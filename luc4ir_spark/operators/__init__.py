"""Distributed operators: index build, retrieval, feedback, evaluation,
dedup, similarity search, text statistics."""
