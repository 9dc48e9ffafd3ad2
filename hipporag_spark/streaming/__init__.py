"""Structured Streaming: incremental corpus ingest → graph-edge maintenance."""
