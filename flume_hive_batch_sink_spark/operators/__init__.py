"""Operator modules — importing this package registers all batch operators."""

from flume_hive_batch_sink_spark.operators import (  # noqa: F401
    aggregates,
    etl,
    graph,
    ingest,
    relational,
    sketches,
    timeseries,
    udfs,
    windows,
)

# udtf_arrow is deliberately ABSENT: registry tail modules import only
# from load_all_operators (append-only key order — see
# registry._TAIL_MODULES).
