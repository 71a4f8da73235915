"""LLM-data-pipeline operators (2.I)."""
