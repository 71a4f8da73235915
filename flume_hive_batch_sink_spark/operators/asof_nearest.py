"""Round-11 extension key: NEAREST-direction as-of join.

`join_asof` (operators/relational.py) is the backward as-of join and
`ts_asof_tolerance` (operators/timeseries.py) its tolerance-bounded
variant; this module adds the third canonical direction — **nearest**
(pandas ``merge_asof(direction='nearest')``): each event matches the
signup of the same user that is closest in time, in EITHER direction,
ties resolving to the earlier (at-or-before) side.

Registered registry-LAST (registry._TAIL_MODULES): new rounds append so
the driver-sampling rotation prefix of earlier rounds stays stable.

100 TB posture: identical to join_asof's — ONE shuffle on user_id and
two frame-bounded running windows over the unioned relation (running
`last(..., ignorenulls)` for the at-or-before candidate, `first(...,
ignorenulls)` over the following frame for the strictly-after
candidate), then a per-row codegen pick by |Δt|. The O(n·m) range-join
alternative never materializes; the window state is O(1) per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flume_hive_batch_sink_spark.io import load
from flume_hive_batch_sink_spark.registry import query

_ASOF_NEAREST_ORACLE = """
    WITH sign AS (
      SELECT user_id, ts, event_id AS sid FROM events
      WHERE event_type = 'signup'
    ), u AS (
      SELECT user_id, ts, event_id, CAST(NULL AS BIGINT) AS sid, 1 AS m
      FROM events
      UNION ALL
      SELECT user_id, ts, CAST(NULL AS BIGINT) AS event_id, sid, 0 AS m
      FROM sign
    ), lv AS (
      SELECT event_id, m, ts,
             last_value(sid IGNORE NULLS) OVER wprev AS prev_sid,
             last_value(CASE WHEN m = 0 THEN ts END IGNORE NULLS)
               OVER wprev AS prev_ts,
             first_value(sid IGNORE NULLS) OVER wnext AS next_sid,
             first_value(CASE WHEN m = 0 THEN ts END IGNORE NULLS)
               OVER wnext AS next_ts
      FROM u
      WINDOW
        wprev AS (PARTITION BY user_id ORDER BY ts, m, sid NULLS LAST
                  ROWS UNBOUNDED PRECEDING),
        wnext AS (PARTITION BY user_id ORDER BY ts, m, sid NULLS LAST
                  ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    )
    SELECT event_id,
           CASE
             WHEN prev_sid IS NULL AND next_sid IS NULL THEN NULL
             WHEN next_sid IS NULL THEN prev_sid
             WHEN prev_sid IS NULL THEN next_sid
             WHEN epoch_us(CAST(ts AS TIMESTAMP))
                    - epoch_us(CAST(prev_ts AS TIMESTAMP))
                  <= epoch_us(CAST(next_ts AS TIMESTAMP))
                    - epoch_us(CAST(ts AS TIMESTAMP))
               THEN prev_sid ELSE next_sid
           END AS nearest_sid,
           CASE
             WHEN prev_sid IS NULL AND next_sid IS NULL THEN NULL
             WHEN next_sid IS NULL THEN 'prev'
             WHEN prev_sid IS NULL THEN 'next'
             WHEN epoch_us(CAST(ts AS TIMESTAMP))
                    - epoch_us(CAST(prev_ts AS TIMESTAMP))
                  <= epoch_us(CAST(next_ts AS TIMESTAMP))
                    - epoch_us(CAST(ts AS TIMESTAMP))
               THEN 'prev' ELSE 'next'
           END AS dir
    FROM lv WHERE m = 1
    """


@query("join_asof_nearest", oracle=_ASOF_NEAREST_ORACLE)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join: each event ↔ the same user's
    signup closest in time, either direction; |Δt| ties go to the
    at-or-before side.

    Conventions shared with join_asof: a signup at the event's exact
    timestamp counts as at-or-before (signup rows sort before event
    rows at equal ts); among simultaneous signups the at-or-before
    candidate is the highest sid (running last) and the strictly-after
    candidate the lowest (first over the following frame) — both
    deterministic. Δt is computed in exact integer microseconds
    (unix_micros / epoch_us; the fixture is µs-aligned), so the pick
    can never flip on float noise."""
    ev = load(spark, sf_dir, "events")
    left = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.lit(None).cast("long").alias("sid"),
        F.lit(1).alias("m"),
    )
    right = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("event_id"),
        F.col("event_id").alias("sid"),
        F.lit(0).alias("m"),
    )
    u = left.unionByName(right)
    order = [F.col("ts"), F.col("m"), F.col("sid").asc_nulls_last()]
    wprev = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wnext = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    sts = F.when(F.col("m") == 0, F.col("ts"))
    cand = (
        u.withColumn("prev_sid", F.last("sid", ignorenulls=True).over(wprev))
        .withColumn("prev_ts", F.last(sts, ignorenulls=True).over(wprev))
        .withColumn("next_sid", F.first("sid", ignorenulls=True).over(wnext))
        .withColumn("next_ts", F.first(sts, ignorenulls=True).over(wnext))
        .filter(F.col("m") == 1)
    )
    d_prev = F.unix_micros("ts") - F.unix_micros("prev_ts")
    d_next = F.unix_micros("next_ts") - F.unix_micros("ts")
    pick_prev = d_prev <= d_next
    nearest = (
        F.when(F.col("prev_sid").isNull() & F.col("next_sid").isNull(), None)
        .when(F.col("next_sid").isNull(), F.col("prev_sid"))
        .when(F.col("prev_sid").isNull(), F.col("next_sid"))
        .when(pick_prev, F.col("prev_sid"))
        .otherwise(F.col("next_sid"))
    )
    direction = (
        F.when(
            F.col("prev_sid").isNull() & F.col("next_sid").isNull(),
            F.lit(None).cast("string"),
        )
        .when(F.col("next_sid").isNull(), F.lit("prev"))
        .when(F.col("prev_sid").isNull(), F.lit("next"))
        .when(pick_prev, F.lit("prev"))
        .otherwise(F.lit("next"))
    )
    return cand.select(
        "event_id",
        nearest.alias("nearest_sid"),
        direction.alias("dir"),
    )
