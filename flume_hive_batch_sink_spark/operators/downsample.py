"""Round-11 extension key: LTTB time-series downsampling.

Largest-Triangle-Three-Buckets (Steinarsson 2013, public MSc thesis;
the decimation standard in observability UIs — Grafana, InfluxDB,
Timescale all ship it) reduces a series to B points, keeping per bucket
the point forming the largest triangle with its neighbors. This module
implements the PARALLEL fixed-anchor variant: anchors are the
neighbor-bucket MEAN points rather than the previously-selected point
(sequential LTTB's selected-point chain is inherently serial; the
mean-anchor form is the standard parallelization and is what makes the
operator one shuffle instead of a B-step loop).

Registered registry-LAST (registry._TAIL_MODULES): new rounds append so
the driver-sampling rotation prefix of earlier rounds stays stable.

100 TB posture: two hash aggregations (per-series extent, per-bucket
sums) plus one shuffle-local argmax per bucket — all map-side-combined;
anchor stats join back by (series, bucket±1), keys bounded by
series×B, so the broadcast side is tiny. The triangle argmax is EXACT
INTEGER arithmetic: second-resolution x, centi-unit y, denominators
cleared by cross-multiplication (DECIMAL(38,0) on the Spark side,
HUGEINT in the oracle — ≤~31 digits at 10⁷ points/bucket), so no float
summation order can flip a selection; ties break to the lower
event_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_hive_batch_sink_spark.io import load
from flume_hive_batch_sink_spark.registry import query

_LTTB_B = 64  # output buckets per series

_LTTB_ORACLE = f"""
    WITH base AS (
      SELECT event_type, event_id, value,
             CAST(round(value * 100) AS BIGINT) AS v,
             epoch_us(CAST(ts AS TIMESTAMP)) AS t
      FROM events
    ), ser AS (
      SELECT event_type, min(t) AS tmin, max(t) AS tmax
      FROM base GROUP BY 1
    ), pt AS (
      SELECT b.event_type, b.event_id, b.value, b.v,
             (b.t - s.tmin) // 1000000 AS dt,
             ((b.t - s.tmin) // 1000000) * {_LTTB_B}
               // ((s.tmax - s.tmin) // 1000000 + 1) AS bucket
      FROM base b JOIN ser s USING (event_type)
    ), bs AS (
      SELECT event_type, bucket,
             CAST(SUM(dt) AS HUGEINT) AS s_t,
             CAST(SUM(v) AS HUGEINT) AS s_v,
             CAST(COUNT(*) AS HUGEINT) AS c
      FROM pt GROUP BY 1, 2
    ), scored AS (
      SELECT p.*, me.c AS n_pts,
             a.s_t AS a_t, a.s_v AS a_v, a.c AS a_c,
             n.s_t AS c_t, n.s_v AS c_v, n.c AS c_c
      FROM pt p
      JOIN bs me ON me.event_type = p.event_type AND me.bucket = p.bucket
      LEFT JOIN bs a ON a.event_type = p.event_type
                    AND a.bucket = p.bucket - 1
      LEFT JOIN bs n ON n.event_type = p.event_type
                    AND n.bucket = p.bucket + 1
    ), keyed AS (
      SELECT event_type, bucket, event_id, value,
             CAST(n_pts AS BIGINT) AS n_pts,
             CASE WHEN a_c IS NULL OR c_c IS NULL
                  THEN -CAST(dt AS HUGEINT)
                  ELSE abs(
                    (a_t * c_c - c_t * a_c)
                      * (CAST(v AS HUGEINT) * a_c - a_v)
                    - (a_t - CAST(dt AS HUGEINT) * a_c)
                      * (c_v * a_c - a_v * c_c))
             END AS sel_key
      FROM scored
    )
    SELECT event_type, bucket, event_id, value, n_pts FROM (
      SELECT *, row_number() OVER (
        PARTITION BY event_type, bucket
        ORDER BY sel_key DESC, event_id) AS rn
      FROM keyed
    ) WHERE rn = 1
    """


@query("ts_downsample_lttb", oracle=_LTTB_ORACLE)
def ts_downsample_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parallel LTTB: per (event_type) series, {_LTTB_B} time buckets;
    each interior bucket keeps the point with the largest triangle
    against the neighbor buckets' mean points; buckets missing a
    neighbor (the ends, or gaps) keep their earliest point — the
    edge-pinning rule of sequential LTTB generalized to a
    deterministic parallel form.

    Exactness: x is integer seconds from the series start, y is
    centi-units (the fixture's values are 2-dp), and the triangle area
    comparison is cross-multiplied to clear the anchor-mean
    denominators — DECIMAL(38,0) here, HUGEINT in the oracle, both
    value-exact (≤~31 digits at 10⁷ rows/bucket), so the argmax can
    never flip on float noise; area ties (duplicate points) fall to
    the lower event_id. Plan: two map-side-combined aggregations, one
    broadcast-sized anchor join (series×B rows), one max_by argmax —
    no windows over the raw series."""
    ev = load(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        "event_id",
        "value",
        F.round(F.col("value") * 100).cast("long").alias("v"),
        F.unix_micros("ts").alias("t"),
    )
    ser = base.groupBy("event_type").agg(
        F.min("t").alias("tmin"), F.max("t").alias("tmax")
    )
    pt = base.join(F.broadcast(ser), "event_type").select(
        "event_type",
        "event_id",
        "value",
        "v",
        F.expr("(t - tmin) div 1000000").alias("dt"),
        F.expr(
            f"((t - tmin) div 1000000) * {_LTTB_B}"
            " div ((tmax - tmin) div 1000000 + 1)"
        ).alias("bucket"),
    )
    d38 = "decimal(38,0)"
    bs = pt.groupBy("event_type", "bucket").agg(
        F.sum("dt").cast(d38).alias("s_t"),
        F.sum("v").cast(d38).alias("s_v"),
        F.count("*").cast(d38).alias("c"),
    )
    me = bs.select("event_type", "bucket", F.col("c").alias("n_c"))
    prev = bs.select(
        "event_type",
        (F.col("bucket") + 1).alias("bucket"),
        F.col("s_t").alias("a_t"),
        F.col("s_v").alias("a_v"),
        F.col("c").alias("a_c"),
    )
    nxt = bs.select(
        "event_type",
        (F.col("bucket") - 1).alias("bucket"),
        F.col("s_t").alias("c_t"),
        F.col("s_v").alias("c_v"),
        F.col("c").alias("c_c"),
    )
    scored = (
        pt.join(F.broadcast(me), ["event_type", "bucket"])
        .join(F.broadcast(prev), ["event_type", "bucket"], "left")
        .join(F.broadcast(nxt), ["event_type", "bucket"], "left")
    )
    vd = F.col("v").cast(d38)
    dtd = F.col("dt").cast(d38)
    area = F.abs(
        (F.col("a_t") * F.col("c_c") - F.col("c_t") * F.col("a_c"))
        * (vd * F.col("a_c") - F.col("a_v"))
        - (F.col("a_t") - dtd * F.col("a_c"))
        * (F.col("c_v") * F.col("a_c") - F.col("a_v") * F.col("c_c"))
    )
    sel_key = F.when(
        F.col("a_c").isNull() | F.col("c_c").isNull(), -dtd
    ).otherwise(area)
    return (
        scored.withColumn("sel_key", sel_key)
        .groupBy("event_type", "bucket")
        .agg(
            F.max_by(
                F.struct(
                    F.col("event_id"), F.col("value"), F.col("n_c")
                ),
                F.struct(F.col("sel_key"), (-F.col("event_id")).alias("ni")),
            ).alias("best")
        )
        .select(
            "event_type",
            "bucket",
            F.col("best.event_id").alias("event_id"),
            F.col("best.value").alias("value"),
            F.col("best.n_c").cast("long").alias("n_pts"),
        )
    )
