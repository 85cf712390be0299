"""Structured Streaming ingest mode (incremental discovery as a stream)."""
