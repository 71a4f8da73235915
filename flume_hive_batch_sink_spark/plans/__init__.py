"""Composite logical plans and plan-inspection helpers."""

from flume_hive_batch_sink_spark.plans import analytics  # noqa: F401
from flume_hive_batch_sink_spark.plans import tpch_full  # noqa: F401
