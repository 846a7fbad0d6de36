"""Structured Streaming surfaces: incremental linkage + streaming dedup."""
