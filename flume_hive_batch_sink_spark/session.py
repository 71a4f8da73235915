"""SparkSession factory tuned for this engine.

Used by tests and bench.py. The driver passes its own session into
``queries()`` callables, so operator code must never create sessions —
only this module (and only for local runs).

Scale posture: these settings are the local[32] test profile. On a real
cluster the same code runs unchanged; only ``spark.sql.shuffle.partitions``
(or AQE target sizes) and executor sizing move with the data volume.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "flume-hive-batch-sink-spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # tz-naive testdata timestamps; pin UTC so date functions are
        # deterministic regardless of host tz (SURVEY.md §2 pitfalls).
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet uses parquet TIMESTAMP(NANOS); see io._ensure_session_confs
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    return builder.getOrCreate()
