"""Structured Streaming operators + the deterministic file-replay harness."""
