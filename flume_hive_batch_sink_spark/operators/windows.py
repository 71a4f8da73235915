"""2.D — Window functions.

WindowExec sorts within partitions after one shuffle on the partition
keys; no window here uses an unpartitioned frame over big data except
sort_multi-style ranks where the result is itself small. Running/sliding
frames keep O(frame) state per row. All orderings carry a unique
tiebreaker so the order-insensitive hash compare is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flume_hive_batch_sink_spark.io import load
from flume_hive_batch_sink_spark.registry import query


@query(
    "win_row_number",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(row_number() OVER (PARTITION BY o_custkey
                ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
    FROM orders
    """,
)
def win_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderkey", "o_custkey", F.row_number().over(w).cast("long").alias("rn")
    )


@query(
    "win_rank_dense",
    oracle="""
    SELECT c_custkey,
           CAST(rank() OVER (PARTITION BY c_mktsegment
                ORDER BY c_acctbal DESC) AS BIGINT) AS rnk,
           CAST(dense_rank() OVER (PARTITION BY c_mktsegment
                ORDER BY c_acctbal DESC) AS BIGINT) AS drnk
    FROM customer
    """,
)
def win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank depend only on the order key values, so ties need
    no tiebreaker for a deterministic result set."""
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc())
    return c.select(
        "c_custkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
    )


@query(
    "win_lag_lead",
    oracle="""
    SELECT event_id,
           ROUND(lag(value, 1) OVER w, 2) AS prev_value,
           ROUND(lead(value, 1) OVER w, 2) AS next_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        F.round(F.lag("value", 1).over(w), 2).alias("prev_value"),
        F.round(F.lead("value", 1).over(w), 2).alias("next_value"),
    )


@query(
    "win_ntile",
    oracle="""
    SELECT c_custkey,
           CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS BIGINT)
             AS quartile
    FROM customer
    """,
)
def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile bucketing. Global order — fine for dimension-sized
    inputs; bucket a fact table with percent_rank over partitions
    instead."""
    c = load(spark, sf_dir, "customer")
    w = Window.orderBy(F.col("c_acctbal"), F.col("c_custkey"))
    return c.select(
        "c_custkey", F.ntile(4).over(w).cast("long").alias("quartile")
    )


@query(
    "win_ntile_approx",
    oracle="""
    SELECT CAST(q AS BIGINT) AS quartile,
           (SELECT CAST(count(*) AS BIGINT) FROM customer) AS n_total,
           true AS size_ok
    FROM (SELECT unnest(range(1, 5)) AS q)
    """,
)
def win_ntile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-safe quartile bucketing — the 100 TB replacement for
    ``win_ntile``'s single-partition global WindowExec. Two linear
    passes, no global sort: (1) ``approx_percentile`` computes the three
    quartile cut points (a mergeable GK digest — one partial-agg
    shuffle of digest-sized state); (2) each row is bucketed by
    comparing against the broadcast boundaries, a map-only stage.

    Certificate oracle (same pattern as operators/sketches.py): exact
    ntile row order can't survive approximation, but the *contract* —
    four buckets that partition all rows into near-equal sizes — is
    checkable: the result carries one row per quartile with the total
    row count (must equal count(customer): buckets partition, nothing
    dropped or duplicated) and a size_ok bit asserting |size − n/4| ≤
    1% of n + digest rank error. The plan is asserted WindowExec-free in
    tests/test_plans.py."""
    c = load(spark, sf_dir, "customer")
    acc = 10_000  # GK accuracy: rank error ≤ n/acc
    bounds = c.agg(
        F.percentile_approx("c_acctbal", [0.25, 0.5, 0.75], acc).alias("b")
    )
    bucketed = c.crossJoin(F.broadcast(bounds)).select(
        (
            F.lit(1)
            + (F.col("c_acctbal") > F.col("b")[0]).cast("int")
            + (F.col("c_acctbal") > F.col("b")[1]).cast("int")
            + (F.col("c_acctbal") > F.col("b")[2]).cast("int")
        ).alias("quartile")
    )
    sizes = bucketed.groupBy("quartile").agg(F.count("*").alias("n"))
    totals = sizes.agg(
        F.sum("n").alias("n_total"), F.max("n").alias("n_max"), F.min("n").alias("n_min")
    )
    # tolerance: 1% of n for boundary-tie mass + n/acc digest rank error,
    # floored for tiny fixtures
    return (
        sizes.crossJoin(F.broadcast(totals))
        .select(
            F.col("quartile").cast("long").alias("quartile"),
            F.col("n_total").cast("long").alias("n_total"),
            (
                F.abs(F.col("n") - F.col("n_total") / 4)
                <= F.greatest(
                    F.lit(8.0),
                    F.col("n_total") * (0.01 + 1.0 / acc),
                )
            ).alias("size_ok"),
        )
    )


@query(
    "win_running_sum",
    oracle="""
    SELECT event_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING), 2) AS running_value
    FROM events
    """,
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "event_id", F.round(F.sum("value").over(w), 2).alias("running_value")
    )


@query(
    "win_sliding_frame",
    oracle="""
    SELECT event_id,
           ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg
    FROM events
    """,
)
def win_sliding_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    return ev.select(
        "event_id", F.round(F.avg("value").over(w), 4).alias("moving_avg")
    )


@query(
    "win_range_frame",
    oracle="""
    SELECT o_orderkey,
           COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                 RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS n_similar
    FROM orders
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame on a numeric key: count of orders within $1000 below.
    Depends only on values — deterministic without a tiebreaker."""
    o = load(spark, sf_dir, "orders")
    # Window.rangeBetween only takes integral offsets from Python; a
    # fractional RANGE frame over a double key needs the SQL form.
    return o.selectExpr(
        "o_orderkey",
        "COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice "
        "RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS n_similar",
    )


@query(
    "win_first_last",
    oracle="""
    SELECT event_id,
           ROUND(first_value(value) OVER w, 2) AS first_val,
           ROUND(last_value(value) OVER w, 2) AS last_val
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last over an explicit full-partition frame (the default frame
    would make last_value = current row — classic pitfall)."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "event_id",
        F.round(F.first("value").over(w), 2).alias("first_val"),
        F.round(F.last("value").over(w), 2).alias("last_val"),
    )


@query(
    "win_cume_percent",
    oracle="""
    SELECT event_id,
           ROUND(cume_dist() OVER (PARTITION BY event_type ORDER BY value), 6)
             AS cd,
           ROUND(percent_rank() OVER (PARTITION BY event_type ORDER BY value), 6)
             AS pr
    FROM events
    """,
)
def win_cume_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value")
    return ev.select(
        "event_id",
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
    )


@query(
    "topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS total
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer. The rn<=3 filter is pushed into the
    window sort (WindowGroupLimit) so each partition keeps only k rows."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("total"))
    )


@query(
    "win_count_distinct_over",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_distinct_types
    FROM (
      SELECT event_id, user_id, ts,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events
    )
    """,
)
def win_count_distinct_over(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) per window — a gap bridged: Spark rejects
    DISTINCT aggregates over windows, and the naive
    ``size(collect_set().over(w))`` workaround holds the whole set in
    window state (O(distinct) memory per row). Instead: flag each
    (user, event_type)'s first occurrence with one row_number window,
    then running-sum the flags — two streaming window passes, constant
    state, and the same trick both engines can express (the oracle runs
    it verbatim)."""
    ev = load(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ev.withColumn("rn", F.row_number().over(w_first))
        .withColumn(
            "n_distinct_types",
            F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).over(w_run),
        )
        .select("event_id", "user_id", "n_distinct_types")
    )


@query(
    "win_time_range",
    oracle="""
    SELECT event_id, user_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_last_hour,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE), 4)
             AS sum_last_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
)
def win_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frame — the trailing-window analytic every
    event pipeline needs (count/sum over the last hour per user). Spark
    expresses interval ranges by ordering on epoch MICROseconds and
    bounding the frame in µs — same frame semantics as SQL's RANGE
    INTERVAL, peers included, at the timestamps' full precision (an
    epoch-seconds cast truncates sub-second digits, silently widening
    the frame for events 3600–3601 s apart — caught at sf1 where
    mean inter-arrival is ~2.6 s). Exact-decimal sums keep the frame
    totals bit-identical across engines regardless of intra-frame
    order."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_last_hour"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,4)")).over(w).cast("double"), 4
        ).alias("sum_last_hour"),
    )


@query(
    "win_streak_islands",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ), isl AS (
      SELECT user_id, d,
             d - CAST(row_number() OVER (
               PARTITION BY user_id ORDER BY d
             ) AS INTEGER) AS anchor
      FROM days
    ), grp AS (
      SELECT user_id, anchor, CAST(count(*) AS BIGINT) AS streak_days,
             MIN(d) AS streak_start
      FROM isl GROUP BY user_id, anchor
    ), best AS (
      SELECT user_id, streak_days, streak_start,
             row_number() OVER (
               PARTITION BY user_id
               ORDER BY streak_days DESC, streak_start
             ) AS rn
      FROM grp
    )
    SELECT user_id, CAST(streak_start AS VARCHAR) AS streak_start,
           streak_days
    FROM best WHERE rn = 1
    """,
)
def win_streak_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: longest run of consecutive active days per
    user (the canonical streak query). ``row_number`` along the day
    axis minus the day itself is constant within a consecutive run, so
    one window + one hash-agg finds every island — no self-join, no
    recursive walk. Both shuffles hash-partition on ``user_id`` (the
    second on ``user_id, anchor``), so the plan holds at any corpus
    size: per-user day counts are bounded by the calendar, never by
    row count. Ties (two equal-length streaks) break on earliest
    start for a deterministic value-hash."""
    ev = load(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.withColumn(
        "anchor", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    grp = isl.groupBy("user_id", "anchor").agg(
        F.count("*").alias("streak_days"),
        F.min("d").alias("streak_start"),
    )
    w2 = Window.partitionBy("user_id").orderBy(
        F.col("streak_days").desc(), F.col("streak_start")
    )
    return (
        grp.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.date_format("streak_start", "yyyy-MM-dd").alias("streak_start"),
            "streak_days",
        )
    )


@query(
    "win_event_pattern",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_type,
             lead(event_type, 1) OVER w AS nxt1,
             lead(event_type, 2) OVER w AS nxt2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), hits AS (
      SELECT user_id, ts FROM seq
      WHERE event_type = 'view' AND nxt1 = 'click' AND nxt2 = 'purchase'
    )
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_matches,
           MIN(ts) AS first_match_ts
    FROM hits GROUP BY user_id
    """,
)
def win_event_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous event-sequence detection (the MATCH_RECOGNIZE
    PATTERN (view click purchase) with strict contiguity): a match is
    three CONSECUTIVE events of one user forming the exact funnel —
    unlike pipeline_funnel's stage-reachability semantics, intervening
    events break the pattern. Expressed as two lead() columns over one
    user-partitioned window — pattern length k costs k-1 leads on the
    SAME window (one shuffle, no self-joins), which is how fixed-length
    sequence patterns should compile at 100 TB. (ts, event_id) total
    order keeps match positions deterministic."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "ts",
        "event_type",
        F.lead("event_type", 1).over(w).alias("nxt1"),
        F.lead("event_type", 2).over(w).alias("nxt2"),
    )
    hits = seq.filter(
        (F.col("event_type") == "view")
        & (F.col("nxt1") == "click")
        & (F.col("nxt2") == "purchase")
    )
    return hits.groupBy("user_id").agg(
        F.count("*").alias("n_matches"),
        F.min("ts").alias("first_match_ts"),
    )


@query(
    "win_rolling_median",
    oracle="""
    SELECT event_id, user_id,
           ROUND(median(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS med5
    FROM events
    """,
)
def win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling exact median over the trailing 5 events per user — the
    robust denoiser for telemetry streams (win_sliding_frame's mean is
    outlier-fragile). Spark has no median window, so the frame is
    collected as a ≤5-element array, sorted in-expression, and the
    middle element (odd n) or midpoint average (even n — identical to
    quantile_cont interpolation at 0.5) extracted — O(frame log frame)
    per row, state bounded by the frame, one user-partitioned shuffle.
    DuckDB's native windowed median over the same ROWS frame is the
    oracle, so the hand-built kernel must reproduce the interpolation
    convention exactly."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, 0)
    )
    arr = F.sort_array(F.collect_list("value").over(w))
    n = F.size(arr)
    mid_hi = F.element_at(arr, (n / 2 + 1).cast("int"))
    odd_mid = F.element_at(arr, ((n + 1) / 2).cast("int"))
    med = F.when(n % 2 == 1, odd_mid).otherwise(
        (F.element_at(arr, (n / 2).cast("int")) + mid_hi) / 2
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(med, 6).alias("med5"),
    )


@query(
    "win_wow_change",
    oracle="""
    WITH weekly AS (
      SELECT event_type, date_trunc('week', ts) AS wk,
             CAST(count(*) AS BIGINT) AS n,
             CAST(ROUND(SUM(value), 2) AS DOUBLE) AS sum_value
      FROM events GROUP BY event_type, date_trunc('week', ts)
    )
    SELECT event_type, strftime(wk, '%Y-%m-%d') AS week_start, n, sum_value,
           lag(n) OVER w AS prev_n,
           CAST(ROUND((n - lag(n) OVER w)
                      / CAST(lag(n) OVER w AS DOUBLE), 6) AS DOUBLE)
             AS wow_change
    FROM weekly
    WINDOW w AS (PARTITION BY event_type ORDER BY wk)
    """,
)
def win_wow_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week growth per event type — the KPI-dashboard
    staple: weekly counts and value sums, previous week via lag, and
    the relative change (NULL on the first week rather than a fake
    zero). Both engines truncate weeks to Monday (ISO).

    Plan: the window runs on the AGGREGATED (type, week) grain —
    #types x #weeks rows — after one map-side-combined aggregation of
    the raw stream, so the lag's sort is trivially bounded at any raw
    volume; partitioning by event_type keeps state per task."""
    ev = load(spark, sf_dir, "events")
    weekly = ev.groupBy(
        "event_type", F.date_trunc("WEEK", "ts").alias("wk")
    ).agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
    w = Window.partitionBy("event_type").orderBy("wk")
    prev = F.lag("n").over(w)
    return weekly.select(
        "event_type",
        F.date_format("wk", "yyyy-MM-dd").alias("week_start"),
        "n",
        "sum_value",
        prev.alias("prev_n"),
        F.round((F.col("n") - prev) / prev.cast("double"), 6).alias(
            "wow_change"
        ),
    )


@query(
    "win_skyline_2d",
    oracle="""
    WITH pg AS (
      SELECT o_orderpriority, o_totalprice,
             MAX(o_orderdate) AS best_date,
             MIN(o_orderkey) AS best_key
      FROM orders GROUP BY o_orderpriority, o_totalprice
    ),
    pref AS (
      SELECT o_orderpriority, o_totalprice, best_date, best_key,
             MAX(best_date) OVER (
               PARTITION BY o_orderpriority ORDER BY o_totalprice DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS dom_date
      FROM pg
    )
    SELECT o_orderpriority,
           CAST(ROUND(o_totalprice, 2) AS DOUBLE) AS o_totalprice,
           best_date AS o_orderdate, best_key AS o_orderkey
    FROM pref
    WHERE dom_date IS NULL OR dom_date <= best_date
    """,
)
def win_skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (maximal-vector / Pareto-optimal) query per order
    priority: the orders not strictly dominated on (totalprice,
    orderdate) — no other order in the class has BOTH higher price and
    later date. The classic Börzsönyi et al. (ICDE'01) operator,
    expressed as the sort-scan algorithm instead of the naive O(n²)
    anti-self-join: collapse to the price grain (max date per price —
    only the best candidate per price can be skyline), sort descending
    by price within the partition, and keep rows whose date isn't
    beaten by the running max over STRICTLY higher prices (the 1
    PRECEDING frame excludes the row's own price group, giving strict
    domination; equal-price rows never dominate each other).

    Plan: one aggregation to the (priority, price) grain, one window
    PARTITIONED by priority — per-class sorted state, no global sort,
    no self-join; at 100 TB skylines are computed per class exactly
    like this, and a classless skyline runs the same shape after a
    coarse price-bucket pre-prune."""
    o = load(spark, sf_dir, "orders")
    pg = o.groupBy("o_orderpriority", "o_totalprice").agg(
        F.max("o_orderdate").alias("best_date"),
        F.min("o_orderkey").alias("best_key"),
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.col("o_totalprice").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pref = pg.withColumn("dom_date", F.max("best_date").over(w))
    return pref.filter(
        F.col("dom_date").isNull() | (F.col("dom_date") <= F.col("best_date"))
    ).select(
        "o_orderpriority",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        F.col("best_date").alias("o_orderdate"),
        F.col("best_key").alias("o_orderkey"),
    )


@query(
    "win_bollinger_bands",
    oracle="""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS dt,
             CAST(ROUND(SUM(value), 2) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2
    ),
    b AS (
      SELECT event_type, dt, v,
             CASE WHEN count(*) OVER w = 7 THEN AVG(v) OVER w END AS ma,
             CASE WHEN count(*) OVER w = 7 THEN stddev_samp(v) OVER w END
               AS sd
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY dt
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, strftime(dt, '%Y-%m-%d') AS dt, v,
           CAST(ROUND(ma, 4) AS DOUBLE) AS ma7,
           CAST(ROUND(ma + 2 * sd, 4) AS DOUBLE) AS upper_band,
           CAST(ROUND(ma - 2 * sd, 4) AS DOUBLE) AS lower_band,
           CASE WHEN ma IS NULL THEN NULL
                WHEN v > ma + 2 * sd THEN 'HIGH'
                WHEN v < ma - 2 * sd THEN 'LOW'
                ELSE 'IN' END AS breach
    FROM b
    """,
)
def win_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger-band monitor on the daily value series per event type:
    trailing 7-day moving average ± 2 sample standard deviations, with
    a HIGH/LOW/IN breach classification — the volatility-adaptive
    alerting rule (a fixed threshold pages constantly on a volatile
    series and never on a quiet one; ±2σ tracks each series' own
    regime). Warm-up rows (fewer than 7 days of history) stay NULL
    rather than alerting on an under-estimated σ.

    Plan: the band math runs on the AGGREGATED (type, day) grain after
    one map-side-combined rollup — trailing frames see ≤7 rows; the
    window partitions by event_type (bounded state per task). The
    breach comparison uses the UNROUNDED bands on both engines, with
    rounding applied only to emitted values."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("DAY", "ts").alias("dt"))
        .agg(F.round(F.sum("value"), 2).alias("v"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("dt")
        .rowsBetween(-6, Window.currentRow)
    )
    full = F.count("*").over(w) == 7
    ma = F.when(full, F.avg("v").over(w))
    sd = F.when(full, F.stddev_samp("v").over(w))
    b = daily.select("event_type", "dt", "v", ma.alias("ma"), sd.alias("sd"))
    up, lo = F.col("ma") + 2 * F.col("sd"), F.col("ma") - 2 * F.col("sd")
    return b.select(
        "event_type",
        F.date_format("dt", "yyyy-MM-dd").alias("dt"),
        "v",
        F.round("ma", 4).alias("ma7"),
        F.round(up, 4).alias("upper_band"),
        F.round(lo, 4).alias("lower_band"),
        F.when(F.col("ma").isNull(), F.lit(None).cast("string"))
        .when(F.col("v") > up, "HIGH")
        .when(F.col("v") < lo, "LOW")
        .otherwise("IN")
        .alias("breach"),
    )


@query(
    "win_yoy_revenue",
    oracle="""
    WITH monthly AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
             CAST(month(o_orderdate) AS BIGINT) AS mo,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1, 2
    )
    SELECT yr, mo,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(lag(rev) OVER w AS DOUBLE) AS revenue_prev_year,
           CAST(ROUND(CAST(rev - lag(rev) OVER w AS DOUBLE)
                      / CAST(lag(rev) OVER w AS DOUBLE), 6) AS DOUBLE)
             AS yoy_change
    FROM monthly
    WINDOW w AS (PARTITION BY mo ORDER BY yr)
    """,
)
def win_yoy_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year monthly revenue growth — the BI companion to
    win_wow_change at the annual-seasonality grain: each (year, month)
    cell compares against the SAME month one year earlier (partition
    by month, lag by year), which is the alignment that makes December
    comparable to December instead of to November. First observed year
    stays NULL. Revenue accumulates as DECIMAL (exact; the
    revenue-bridge discipline) so the lag and ratio are computed from
    bit-identical numerators on both engines.

    Plan: one map-side-combined aggregation onto the (year, month)
    grain — at most 12 partitions × #years rows — then a per-month
    window over that tiny relation; raw order volume touches exactly
    one scan."""
    o = load(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    w = Window.partitionBy("mo").orderBy("yr")
    prev = F.lag("rev").over(w)
    return monthly.select(
        "yr",
        "mo",
        F.col("rev").cast("double").alias("revenue"),
        prev.cast("double").alias("revenue_prev_year"),
        F.round(
            (F.col("rev") - prev).cast("double") / prev.cast("double"), 6
        ).alias("yoy_change"),
    )
