"""Structured Streaming ingest (reference write path, T1-T4)."""
