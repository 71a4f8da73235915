"""Round-12 extension key: arbitrary-width, arbitrary-origin time
bucketing (the TimescaleDB ``time_bucket`` / ClickHouse
``toStartOfInterval`` primitive).

``date_trunc`` only reaches calendar grains; real rollups want "45-min
buckets anchored at the deployment epoch". DuckDB ships the exact
primitive (``time_bucket(width, ts, origin)``), which makes the oracle
a direct built-in call; the Spark side derives the identical bucket
with pure integer epoch-µs arithmetic.

Registered registry-LAST (registry._TAIL_MODULES): new rounds append so
the driver-sampling rotation prefix of earlier rounds stays stable.

100 TB posture: the bucket is a per-row codegen expression (integer
subtract / pmod / multiply — no float division anywhere, so no ULP can
move a boundary event), and the rollup is one map-side-combined hash
aggregation keyed on (bucket, event_type).

TIMEZONE SEMANTICS (fixed-offset assumption, documented): the bucket is
derived from ABSOLUTE epoch-µs (``unix_micros``), while DuckDB's
``time_bucket`` floors the NAIVE local wall-clock. The two agree under
any fixed-offset session timezone (the hostile-TZ sweep runs ±14h
offsets) because a constant offset cancels in ``(ts − origin)``; they
can differ only for events inside a DST transition window in a
DST-observing zone, where local wall-clock is non-monotone in the
instant. Epoch arithmetic is the deliberate choice for a 100 TB engine
— instants are total-ordered, buckets are exactly ``width`` long (a
wall-clock 45-min bucket straddling spring-forward is physically 45
or −15 min of data), and the expression stays pure codegen integer
math. Deployments needing wall-clock bucketing should date_trunc /
bucket on a TIMESTAMP_NTZ column instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_hive_batch_sink_spark.io import load
from flume_hive_batch_sink_spark.registry import query

_WIDTH_MIN = 45
_ORIGIN = "2024-01-01 00:00:00"

_TIME_BUCKET_ORACLE = f"""
    SELECT time_bucket(INTERVAL '{_WIDTH_MIN} minutes', ts,
                       TIMESTAMP '{_ORIGIN}') AS bucket,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS sum_value
    FROM events
    GROUP BY 1, 2
"""


@query("ts_time_bucket", oracle=_TIME_BUCKET_ORACLE)
def ts_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """45-minute buckets anchored at {origin}: bucket = origin +
    ⌊(ts − origin)/width⌋·width, computed in integer epoch-µs with a
    pmod-based floor (``delta − pmod(delta, width)`` floors toward −∞
    for pre-origin timestamps too, matching time_bucket's semantics —
    plain integer division truncates toward zero and would shift every
    pre-origin bucket by one). DECIMAL-cast sums keep accumulation
    order irrelevant across engines."""
    ev = load(spark, sf_dir, "events")
    width_us = _WIDTH_MIN * 60 * 1_000_000
    origin_us = F.unix_micros(F.to_timestamp(F.lit(_ORIGIN)))
    delta = F.unix_micros("ts") - origin_us
    floored = delta - F.pmod(delta, F.lit(width_us))
    bucket = F.timestamp_micros(origin_us + floored)
    return (
        ev.groupBy(bucket.alias("bucket"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
    )
