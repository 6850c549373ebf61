"""Structured Streaming surface: incremental parse/extract over page feeds."""
