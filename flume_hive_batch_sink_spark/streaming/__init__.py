"""Structured Streaming surface (2.G)."""
