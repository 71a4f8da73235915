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

import os
from contextlib import contextmanager
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def shuffle_parallelism(df: DataFrame) -> int:
    """The session's shuffle partition count (falls back to the
    scheduler's default parallelism when unparseable, e.g. ``auto``)."""
    spark = df.sparkSession
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        return spark.sparkContext.defaultParallelism


@contextmanager
def scoped_conf(spark: SparkSession, confs: dict[str, str]):
    """Set runtime SQL confs for the duration of a ``with`` block and
    restore the previous values (or unset) on exit. Only safe around
    work that COMPLETES inside the block (e.g. a streaming query run to
    termination); a lazy DataFrame returned out of the block executes
    under whatever the session conf is at action time."""
    prior: dict[str, str | None] = {}
    for k, v in confs.items():
        try:
            prior[k] = spark.conf.get(k)
        except Exception:
            prior[k] = None
        spark.conf.set(k, v)
    try:
        yield spark
    finally:
        for k, old in prior.items():
            if old is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)


def fanout_session(spark: SparkSession) -> SparkSession:
    """A clone of ``spark`` (same SparkContext, same runtime confs —
    including the driver's timezone/legacy settings) with AQE disabled:
    plans BUILT from the clone execute AQE-free wherever they are later
    executed, without touching the caller's session — the per-query
    version of a set/restore conf scope, robust to the driver executing
    the returned DataFrame long after the builder returned.

    Round-16 status: NOT wired into any operator. VERDICT r15 item 1
    proposed scoping AQE off around the fan-out dedup pipelines on the
    strength of a round-15 "llm_jaccard_dedup 4.6 s with AQE vs 2.4 s
    without" measurement; an interleaved A/B on the current code
    (scripts/probe_fanout_aqe.py, medians of 5 at sf0.1) measured the
    clone NEUTRAL-to-slightly-negative (llm_near_dedup_minhash 8.45 s
    AQE-on vs 8.72 s off; llm_jaccard_dedup 2.95 s vs 3.06 s), and a
    session-wide AQE toggle reproduced the null result — the round-15
    AQE-off figure predated the explicit fan-out repartitions and was
    capturing the same under-parallelization those now fix. Kept (with
    the probe) as the validated mechanism + negative result so the next
    round does not re-derive either.

    ``SPARK_GRAFT_FANOUT_AQE=1`` makes it a no-op (returns ``spark``);
    any failure to clone (e.g. a non-classic session) falls back to the
    caller's session unchanged.
    """
    if os.environ.get("SPARK_GRAFT_FANOUT_AQE") == "1":
        return spark
    try:
        clone = SparkSession(
            spark.sparkContext, spark._jsparkSession.cloneSession()
        )
        clone.conf.set("spark.sql.adaptive.enabled", "false")
        return clone
    except Exception:
        return spark


def input_scaled_partitions(path_or_bytes: str | int) -> int:
    """Shuffle/state partition count derived from input volume — the
    same ~32 MB/partition rule bench.py applies to the batch headline
    session (floor 8, cap 2048), so partition counts scale with the
    data instead of being a local-core-count constant. Accepts a
    directory/file path (sums parquet/csv/tsv file sizes) or a byte
    count."""
    if isinstance(path_or_bytes, int):
        n_bytes = path_or_bytes
    else:
        p = Path(path_or_bytes)
        if p.is_dir():
            n_bytes = sum(
                f.stat().st_size
                for pat in ("*.parquet", "*.csv", "*.tsv")
                for f in p.glob(pat)
            )
        else:
            n_bytes = p.stat().st_size if p.exists() else 0
    return max(8, min(2048, int(n_bytes / (32 << 20))))
