"""Scalar function families (2.F)."""

from flume_hive_batch_sink_spark.functions import scalar  # noqa: F401
