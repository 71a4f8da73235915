"""2.G batch twins — streaming window semantics exercised in batch mode.

`F.window` / `F.session_window` produce identical results in batch and
streaming plans; running them in batch lets the DuckDB oracle hash-check
the exact window assignment logic the streaming queries reuse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_hive_batch_sink_spark.io import load
from flume_hive_batch_sink_spark.registry import query


@query(
    "stream_tumbling",
    oracle="""
    SELECT date_trunc('hour', ts) AS ws, event_type,
           count(*) AS n, ROUND(sum(value), 2) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h window per event_type — the flagship rollup expressed
    with the streaming window primitive (epoch-aligned, so window.start
    ≡ date_trunc('hour'))."""
    ev = load(spark, sf_dir, "events")
    w = F.window("ts", "1 hour")
    return ev.groupBy(w.alias("w"), "event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value")
    ).select(
        F.col("w.start").alias("ws"), "event_type", "n", "sum_value"
    )


@query(
    "stream_sliding",
    oracle="""
    WITH k AS (SELECT unnest([0, 1, 2, 3]) AS i)
    SELECT to_timestamp(epoch(ts) - (epoch(ts) % 900) - i * 900)
             AT TIME ZONE 'UTC' AS ws,
           count(*) AS n
    FROM events, k
    GROUP BY 1
    """,
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window 1h every 15m — each event lands in exactly 4
    overlapping windows; the oracle self-expands via an offset join."""
    ev = load(spark, sf_dir, "events")
    w = F.window("ts", "1 hour", "15 minutes")
    return (
        ev.groupBy(w.alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )


@query(
    "stream_session",
    oracle="""
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN epoch(ts - lag(ts) OVER (PARTITION BY user_id
                      ORDER BY ts)) >= 1800 OR
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), s AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM g
    )
    SELECT user_id, min(ts) AS session_start, count(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute gap via the streaming
    `session_window` primitive (sessions merge while consecutive events
    are < gap apart; the oracle reproduces the same >=1800s break rule)."""
    ev = load(spark, sf_dir, "events")
    sw = F.session_window("ts", "30 minutes")
    return (
        ev.groupBy(sw.alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id", F.col("w.start").alias("session_start"), "n_events"
        )
    )
