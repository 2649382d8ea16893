"""Structured Streaming operators: incremental index maintenance."""
