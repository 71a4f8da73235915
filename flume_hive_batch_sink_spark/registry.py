"""Operator registry — the single source of truth for the driver contract.

Every operator from SURVEY.md §2 registers here via the ``@query``
decorator; ``__spark_entry__.py`` re-exports ``QUERIES`` / ``ORACLES``
verbatim. Keys with ``oracle=None`` get the driver's weaker rows-only
check (reserved for genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# Modules appended to the registry AFTER the stable r1–r9 surface, in
# import order. load_all_operators asserts their keys sit at the very
# end of the registry so an accidental early import fails loudly
# instead of silently reshuffling the driver-sampling rotation prefix.
_TAIL_MODULES = (
    "flume_hive_batch_sink_spark.llm.mixing",
    "flume_hive_batch_sink_spark.operators.udtf_arrow",
    "flume_hive_batch_sink_spark.llm.quality",
    "flume_hive_batch_sink_spark.operators.interval_join",
    "flume_hive_batch_sink_spark.llm.tokenize",
    "flume_hive_batch_sink_spark.operators.asof_nearest",
    "flume_hive_batch_sink_spark.operators.downsample",
    "flume_hive_batch_sink_spark.operators.regression",
    # round 12
    "flume_hive_batch_sink_spark.llm.corpus_stats",
    "flume_hive_batch_sink_spark.operators.rates",
    "flume_hive_batch_sink_spark.llm.mime",
    "flume_hive_batch_sink_spark.operators.table_audit",
    "flume_hive_batch_sink_spark.streaming.session_window",
    "flume_hive_batch_sink_spark.operators.time_bucket",
    "flume_hive_batch_sink_spark.operators.band_join",
    # round 13
    "flume_hive_batch_sink_spark.streaming.state_ttl",
)


def query(key: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as the implementation of operator ``key``.

    ``oracle`` is the DuckDB-dialect ANSI SQL producing the identical
    result set (same column names — the driver's compare sorts columns by
    name before hashing, __spark_entry__.py docstring).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise KeyError(f"duplicate operator key {key!r}")
        QUERIES[key] = fn
        if oracle is not None:
            ORACLES[key] = oracle
        return fn

    return deco


def load_all_operators() -> None:
    """Import every module that registers operators (decorator side-effects)."""
    from flume_hive_batch_sink_spark import functions  # noqa: F401
    from flume_hive_batch_sink_spark import llm  # noqa: F401
    from flume_hive_batch_sink_spark import operators  # noqa: F401
    from flume_hive_batch_sink_spark import plans  # noqa: F401
    from flume_hive_batch_sink_spark import sources  # noqa: F401
    from flume_hive_batch_sink_spark import streaming  # noqa: F401

    # Imported LAST (and deliberately absent from llm/__init__): new
    # rounds' keys must APPEND to the registry, because the driver
    # sampling rotation orders never-checked keys by registry position —
    # inserting mid-order would reshuffle the attested 50-key prefix.
    from flume_hive_batch_sink_spark.llm import mixing  # noqa: F401
    from flume_hive_batch_sink_spark.operators import udtf_arrow  # noqa: F401
    from flume_hive_batch_sink_spark.llm import quality  # noqa: F401
    from flume_hive_batch_sink_spark.operators import interval_join  # noqa: F401
    from flume_hive_batch_sink_spark.llm import tokenize  # noqa: F401
    from flume_hive_batch_sink_spark.operators import asof_nearest  # noqa: F401
    from flume_hive_batch_sink_spark.operators import downsample  # noqa: F401
    from flume_hive_batch_sink_spark.operators import regression  # noqa: F401
    from flume_hive_batch_sink_spark.llm import corpus_stats  # noqa: F401
    from flume_hive_batch_sink_spark.operators import rates  # noqa: F401
    from flume_hive_batch_sink_spark.llm import mime  # noqa: F401
    from flume_hive_batch_sink_spark.operators import table_audit  # noqa: F401
    from flume_hive_batch_sink_spark.streaming import session_window  # noqa: F401
    from flume_hive_batch_sink_spark.operators import time_bucket  # noqa: F401
    from flume_hive_batch_sink_spark.operators import band_join  # noqa: F401
    from flume_hive_batch_sink_spark.streaming import state_ttl  # noqa: F401

    # Fail LOUDLY if any import path registered the tail modules early
    # (a direct test import, a tool, a future llm/__init__ edit would
    # otherwise silently reshuffle the rotation prefix the driver
    # samples). Extend _TAIL_MODULES, in import order, when a future
    # round appends a new module below the mixing import.
    tail_keys = [
        k for k, fn in QUERIES.items() if fn.__module__ in _TAIL_MODULES
    ]
    if tail_keys and list(QUERIES)[-len(tail_keys) :] != tail_keys:
        raise AssertionError(
            "append-only registry order violated: keys from "
            f"{_TAIL_MODULES} must occupy the final registry positions "
            "(something imported a tail module before "
            "load_all_operators)"
        )
