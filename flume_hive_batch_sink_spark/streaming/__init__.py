"""Structured Streaming surface (2.G)."""

from flume_hive_batch_sink_spark.streaming import batch_twins, queries  # noqa: F401
