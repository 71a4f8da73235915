"""Source/sink format connectors."""

from flume_hive_batch_sink_spark.sources import formats  # noqa: F401
