"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All operators live in ``flume_hive_batch_sink_spark`` and register
themselves in its ``registry`` module; this file just re-exports.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flume_hive_batch_sink_spark import registry
from flume_hive_batch_sink_spark.registry import load_all_operators

load_all_operators()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's raison d'être as one query: hourly partitioned event
    rollup (scan → project → time-bucket → aggregate), i.e. the ingest
    dataflow in miniature (SURVEY.md §7 M0).
    """
    from pyspark.sql import functions as F

    from flume_hive_batch_sink_spark.io import load
    from flume_hive_batch_sink_spark.operators.ingest import with_partition_keys

    ev = with_partition_keys(load(spark, "/root/testdata/sf0.001", "events"))
    return ev.groupBy("dt", "hr", "event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect oracle SQL per key (omitted ⇒ rows-only check)."""
    return dict(registry.ORACLES)
