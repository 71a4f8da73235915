"""Deterministic local streaming sources for tests and streaming queries.

The reference consumes an unbounded Flume channel; locally we replay the
`events` fixture as a file-source stream. Two shapes:

- ``events_stream``: the whole table as one availableNow micro-batch
  (order-independent operators: dedup, aggregation, joins).
- ``replay_chunks``: the table split into N files in a controlled order
  with monotonically bumped mtimes + ``maxFilesPerTrigger=1``, so each
  file becomes its own micro-batch in a deterministic sequence — the
  harness for watermark/late-data semantics (SURVEY.md §5.2.3).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_hive_batch_sink_spark.io import load


def _tmpdir(prefix: str) -> str:
    """mkdtemp that reclaims itself at interpreter exit — streaming
    sources/checkpoints must outlive the operator call (results are
    consumed lazily), so eager cleanup is unsafe, but leaking temp
    trees across a long parity sweep is not acceptable either."""
    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d

EVENTS_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
    "event_type STRING, value DOUBLE, props STRING"
)


def _events_as_us_parquet(spark: SparkSession, sf_dir: str, out_dir: str) -> None:
    """Rewrite events with a µs timestamp so the file stream needs no
    nanos workaround."""
    load(spark, sf_dir, "events").write.mode("overwrite").parquet(out_dir)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table as a file-source stream (single batch under
    availableNow)."""
    staged = os.path.join(_tmpdir("stream_src_"), "events")
    _events_as_us_parquet(spark, sf_dir, staged)
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(staged)


def replay_chunks(
    spark: SparkSession,
    sf_dir: str,
    n_chunks: int = 4,
    late_chunk: bool = False,
) -> DataFrame:
    """Split events into ts-ordered chunk files replayed one per batch.

    With ``late_chunk=True`` the FIRST chunk (oldest events) is replayed
    LAST — after newer chunks have advanced the watermark — so its rows
    arrive late. File order is pinned via mtime (the file source lists by
    modification time) and ``maxFilesPerTrigger=1``.
    """
    ev = load(spark, sf_dir, "events")
    chunk = F.ntile(n_chunks).over(
        __import__("pyspark").sql.window.Window.orderBy("ts", "event_id")
    )
    with_chunk = ev.withColumn("chunk", chunk)
    base = _tmpdir("stream_replay_")
    src = os.path.join(base, "src")
    os.makedirs(src, exist_ok=True)

    order = list(range(1, n_chunks + 1))
    if late_chunk:
        order = order[1:] + order[:1]  # oldest chunk arrives last
    now = time.time()
    pdfs = {
        c: with_chunk.filter(F.col("chunk") == c).drop("chunk").toPandas()
        for c in range(1, n_chunks + 1)
    }
    for i, c in enumerate(order):
        path = os.path.join(src, f"chunk_{i:03d}.parquet")
        pdf = pdfs[c].copy()
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        pdf.to_parquet(path, index=False)
        os.utime(path, (now + i, now + i))

    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )


def run_to_memory(
    stream_df: DataFrame,
    name: str,
    output_mode: str,
    spark: SparkSession,
) -> DataFrame:
    """Run a streaming DataFrame to completion (availableNow) into an
    in-memory sink and return the result table."""
    chk = _tmpdir(f"chk_{name}_")
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
