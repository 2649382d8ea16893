"""Scalar/vectorized function library: analyzers, stemmer, posting codec."""
