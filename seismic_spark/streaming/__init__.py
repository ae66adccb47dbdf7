"""Structured Streaming surfaces: incremental index ingest + event windows."""
