"""2.C — Aggregations.

Every aggregate here compiles to HashAggregateExec with map-side partial
aggregation (one shuffle on the group keys, partial state combined
per-partition first) — the shape that survives a 100× scale-up. Float
aggregates are rounded identically on both engine sides per the oracle
rules (FIXTURES.md): partial-aggregation order differs between engines,
so raw doubles are never compared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flume_hive_batch_sink_spark.io import load
from flume_hive_batch_sink_spark.registry import query


@query(
    "agg_group_basic",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(sum(l_quantity), 2) AS sum_qty,
           ROUND(sum(l_extendedprice), 2) AS sum_base_price,
           ROUND(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(avg(l_quantity), 4) AS avg_qty,
           ROUND(min(l_extendedprice), 2) AS min_price,
           ROUND(max(l_extendedprice), 2) AS max_price,
           count(*) AS count_order
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_group_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape (pricing summary) adapted to the fixture columns."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "sum_disc_price"
        ),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        F.count("*").alias("count_order"),
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_customers,
           count(*) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct — planned as a two-phase expand+agg; for 100 TB
    cardinality estimation use agg_approx_distinct instead."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
    )


@query(
    "agg_approx_distinct",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           true AS within_rsd
    FROM events GROUP BY event_type
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct (rsd 5%) — the scale path for
    cardinality: single pass, fixed-size sketch, no expand.

    Oracle design (same certificate pattern as operators/sketches.py):
    HLL++ estimates are engine-specific, so the estimate itself cannot
    hash-match DuckDB. Instead the result carries the exact distinct
    count (oracle-reproducible) plus a boolean certifying the estimate
    landed within 3×rsd of exact — the bound HLL++ holds with ≥99.7%
    probability, and deterministically here because the sketch is a
    pure order-independent function of the fixture data. At 100 TB only
    the approx path runs; the exact column is the verifier."""
    ev = load(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.05).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    return agg.select(
        "event_type",
        F.col("exact_users").cast("long").alias("exact_users"),
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= 0.15 * F.col("exact_users")
        ).alias("within_rsd"),
    )


@query(
    "agg_having",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders, ROUND(sum(o_totalprice), 2) AS spend
    FROM orders GROUP BY o_custkey HAVING count(*) >= 15
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("spend"),
        )
        .filter(F.col("n_orders") >= 15)
    )


@query(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(stddev_samp(l_quantity), 6) AS sd_qty,
           ROUND(var_samp(l_quantity), 6) AS var_qty,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
    )


@query(
    "agg_percentile",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentile (Spark `percentile` ≡ DuckDB
    `quantile_cont`); at 100 TB swap to `approx_percentile` sketches."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", 0.5), 4).alias("median_qty"),
        F.round(F.percentile("l_extendedprice", 0.9), 4).alias("p90_price"),
    )


_GSETS_ORACLE = """
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT)
             AS gid,
           count(*) AS n, ROUND(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


@query("agg_grouping_sets", oracle=_GSETS_ORACLE)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity aggregation in one pass (Expand + single shuffle,
    not one job per granularity)."""
    li = load(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_gsets_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
               count(*) AS n, ROUND(sum(l_quantity), 2) AS sum_qty
        FROM _gsets_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT r_name, n_name,
           CAST(grouping(r_name) * 2 + grouping(n_name) AS BIGINT) AS gid,
           count(*) AS n_suppliers, ROUND(sum(s_acctbal), 2) AS total_bal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals region → nation → grand total."""
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    joined = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(
        F.grouping_id("r_name", "n_name").cast("long").alias("gid"),
        F.count("*").alias("n_suppliers"),
        F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
    )


@query(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT)
             AS gid,
           count(*) AS n, ROUND(avg(o_totalprice), 4) AS avg_price
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping_id("o_orderstatus", "o_orderpriority").cast("long").alias("gid"),
        F.count("*").alias("n"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
    )


@query(
    "agg_collect",
    oracle="""
    SELECT s_nationkey, array_to_string(list_sort(list(s_name)), '|') AS names
    FROM supplier GROUP BY s_nationkey
    """,
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collect group values as a sorted array (serialized for the hash
    compare). Bounded groups only — collect_list is memory-unbounded."""
    s = load(spark, sf_dir, "supplier")
    return s.groupBy("s_nationkey").agg(
        F.array_join(F.sort_array(F.collect_list("s_name")), "|").alias("names")
    )


_EVENT_TYPES = ("view", "click", "purchase", "signup", "error")


@query(
    "agg_pivot",
    oracle="""
    SELECT strftime(ts, '%Y%m%d') AS dt,
           count(*) FILTER (event_type = 'view') AS view,
           count(*) FILTER (event_type = 'click') AS click,
           count(*) FILTER (event_type = 'purchase') AS purchase,
           count(*) FILTER (event_type = 'signup') AS signup,
           count(*) FILTER (event_type = 'error') AS error
    FROM events GROUP BY 1
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event_type → one count column per type. Pivot values are
    declared explicitly — at scale an undeclared pivot needs an extra
    distinct pass to discover them."""
    ev = load(spark, sf_dir, "events").withColumn(
        "dt", F.date_format("ts", "yyyyMMdd")
    )
    out = (
        ev.groupBy("dt").pivot("event_type", list(_EVENT_TYPES)).agg(F.count(F.lit(1)))
    )
    return out.na.fill(0, subset=list(_EVENT_TYPES))


@query(
    "agg_conditional",
    oracle="""
    SELECT event_type,
           count(*) FILTER (value > 100) AS n_big,
           ROUND(sum(value) FILTER (value > 100), 2) AS sum_big,
           ROUND(avg(value) FILTER (value > 100), 4) AS avg_big
    FROM events GROUP BY event_type
    """,
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    big = F.when(F.col("value") > 100, F.col("value"))
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(big).alias("n_big"),
        F.round(F.sum(big), 2).alias("sum_big"),
        F.round(F.avg(big), 4).alias("avg_big"),
    )


@query(
    "agg_salted_twophase",
    oracle="""
    SELECT event_type, count(*) AS n, ROUND(sum(value), 2) AS sum_value
    FROM events GROUP BY event_type
    """,
)
def agg_salted_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant aggregation: the grouping key is salted (16 ways on
    a uniform column) so one hot key spreads over 16 reducers, then the
    salt is aggregated away. events.event_type has only 5 values — at
    100 TB a plain groupBy puts a fifth of the corpus on one task; the
    two-phase shape bounds any reducer at 1/16 of a key's rows. (Spark's
    map-side partial aggregation already does this implicitly when
    upstream partitioning is uniform; explicit salting is the pattern
    for when it is not, e.g. after a join that clustered the hot key.)
    """
    ev = load(spark, sf_dir, "events")
    salted = ev.withColumn("salt", F.pmod(F.col("event_id"), F.lit(16)))
    partial = salted.groupBy("event_type", "salt").agg(
        F.count("*").alias("pn"), F.sum("value").alias("psum")
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n"), F.round(F.sum("psum"), 2).alias("sum_value")
    )


@query(
    "agg_histogram_fixed",
    oracle="""
    SELECT event_type,
           CAST(CASE WHEN value < 0 THEN 0
                     WHEN value >= 500.0 THEN 21
                     ELSE floor(value * 20.0 / 500.0) + 1 END AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
    """,
)
def agg_histogram_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-domain histogram per group via ``width_bucket`` — one
    map-side bucket assignment + one hash aggregation, the O(n) shape
    that replaces per-group sorts for distribution profiling. The bucket
    edge formula is written EXPLICITLY (floor(x·n/width)+1 with under/
    overflow buckets 0 and n+1, the SQL-standard width_bucket contract)
    and identically on both sides, so edge doubles agree bit-for-bit —
    DuckDB has no width_bucket and engine-specific implementations could
    disagree at representability boundaries anyway."""
    ev = load(spark, sf_dir, "events")
    bucket = (
        F.when(F.col("value") < 0, 0)
        .when(F.col("value") >= 500.0, 21)
        .otherwise(F.floor(F.col("value") * 20.0 / 500.0) + 1)
        .cast("bigint")
        .alias("bucket")
    )
    return ev.groupBy("event_type", bucket).agg(F.count("*").alias("n"))


@query(
    "agg_mode_deterministic",
    oracle="""
    WITH c AS (
      SELECT c_nationkey, c_mktsegment, COUNT(*) AS cnt
      FROM customer GROUP BY 1, 2
    ),
    r AS (
      SELECT c_nationkey, c_mktsegment, cnt,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY cnt DESC, c_mktsegment ASC) AS rn
      FROM c
    )
    SELECT c_nationkey, c_mktsegment AS mode_segment, CAST(cnt AS BIGINT) AS n
    FROM r WHERE rn = 1
    """,
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE (most frequent value) per group: count + one
    windowed argmax with an explicit value tiebreak. Spark 3.4's native
    ``mode()`` is tie-arbitrary — unacceptable under a value-hash
    contract — so the operator pins ties by segment name; the window
    partitions on the group key (25 nations — no global window)."""
    from pyspark.sql import Window as W

    counts = (
        load(spark, sf_dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count("*").alias("cnt"))
    )
    w = W.partitionBy("c_nationkey").orderBy(
        F.col("cnt").desc(), F.col("c_mktsegment").asc()
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_nationkey",
            F.col("c_mktsegment").alias("mode_segment"),
            F.col("cnt").cast("bigint").alias("n"),
        )
    )


@query(
    "agg_unpivot",
    oracle="""
    WITH wide AS (
      SELECT l_returnflag,
             round(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) :: DOUBLE
               AS sum_qty,
             round(SUM(CAST(l_discount AS DECIMAL(18,2))), 2) :: DOUBLE
               AS sum_disc,
             round(SUM(CAST(l_tax AS DECIMAL(18,2))), 2) :: DOUBLE AS sum_tax
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, metric, val
    FROM wide
    UNPIVOT (val FOR metric IN (sum_qty, sum_disc, sum_tax))
    """,
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt — the inverse of ``agg_pivot``: a wide per-group
    aggregate is rotated into (group, metric, value) long form, the
    shape feeding metric stores and plotting layers. Spark's native
    ``DataFrame.unpivot`` compiles to an Expand node (one output row
    per metric per input row, map-side — no shuffle beyond the
    aggregation that built the wide table); DuckDB's UNPIVOT clause
    replays it. DECIMAL sums + round(2) keep the value column
    engine-exact."""
    li = load(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum(F.col("l_quantity").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("sum_qty"),
        F.round(F.sum(F.col("l_discount").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("sum_disc"),
        F.round(F.sum(F.col("l_tax").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("sum_tax"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_disc", "sum_tax"],
        variableColumnName="metric",
        valueColumnName="val",
    )


@query(
    "agg_weighted_median",
    oracle="""
    WITH ordered AS (
      SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber,
             SUM(CAST(l_quantity AS DECIMAL(18,4))) OVER (
               PARTITION BY l_returnflag
               ORDER BY l_extendedprice, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cw,
             SUM(CAST(l_quantity AS DECIMAL(18,4))) OVER (
               PARTITION BY l_returnflag
             ) AS total_w
      FROM lineitem
    ), hit AS (
      SELECT *,
             row_number() OVER (
               PARTITION BY l_returnflag
               ORDER BY l_extendedprice, l_orderkey, l_linenumber
             ) AS rn
      FROM ordered WHERE 2 * cw >= total_w
    )
    SELECT l_returnflag,
           ROUND(l_extendedprice, 2) AS weighted_median,
           CAST(ROUND(total_w, 2) AS DOUBLE) AS total_weight
    FROM hit WHERE rn = 1
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median: the price at which half the total QUANTITY mass
    sits on each side, per return flag — the robust centre a plain
    percentile (agg_percentile) can't give when rows carry unequal
    mass. Classic cumulative-weight construction: one total order per
    group (tie-broken to a unique key), a running decimal cumsum, and
    the first row whose doubled cumulative weight reaches the group
    total. DECIMAL accumulation on both engines makes the crossing
    index bit-identical regardless of float summation order. One
    shuffle on the group key; at 100 TB swap the exact sort for
    approx_percentile on a weight-expanded sketch when ppm error is
    acceptable."""
    li = load(spark, sf_dir, "lineitem")
    order_cols = [F.col("l_extendedprice"), F.col("l_orderkey"), F.col("l_linenumber")]
    wq = F.col("l_quantity").cast("decimal(18,4)")
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("l_returnflag")
    ctx = li.select(
        "l_returnflag",
        "l_extendedprice",
        "l_orderkey",
        "l_linenumber",
        F.sum(wq).over(w_cum).alias("cw"),
        F.sum(wq).over(w_all).alias("total_w"),
    ).filter(2 * F.col("cw") >= F.col("total_w"))
    w_pick = Window.partitionBy("l_returnflag").orderBy(*order_cols)
    return (
        ctx.withColumn("rn", F.row_number().over(w_pick))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.round("l_extendedprice", 2).alias("weighted_median"),
            F.round("total_w", 2).cast("double").alias("total_weight"),
        )
    )


@query(
    "agg_entropy",
    oracle="""
    WITH cnt AS (
      SELECT strftime(ts, '%Y-%m-%d') AS dt, event_type,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY dt, event_type
    ), tot AS (
      SELECT dt, SUM(n) AS total, CAST(count(*) AS BIGINT) AS n_types
      FROM cnt GROUP BY dt
    )
    SELECT c.dt, t.n_types,
           CAST(ROUND(SUM(CAST(ROUND(
             -(CAST(c.n AS DOUBLE) / t.total)
               * ln(CAST(c.n AS DOUBLE) / t.total), 9) AS DECIMAL(20,9))),
             6) AS DOUBLE) AS entropy,
           CAST(ROUND(SUM(CAST(ROUND(
             (CAST(c.n AS DOUBLE) / t.total)
               * (CAST(c.n AS DOUBLE) / t.total), 9) AS DECIMAL(20,9))),
             6) AS DOUBLE) AS gini_sum
    FROM cnt c JOIN tot t ON c.dt = t.dt
    GROUP BY c.dt, t.n_types
    """,
)
def agg_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributional diversity metrics per day — Shannon entropy and
    the Simpson/Gini concentration Σp² of the event-type mix (the
    balance checks a training-data pipeline runs per source/shard).
    Two chained hash aggs (category counts → per-group totals → metric
    sum), all map-side combinable. Each -p·ln p term is one IEEE
    double expression rounded to 9 decimals and cast DECIMAL before
    the final sum, so aggregation order can never wiggle the 6-decimal
    output (the repo's round-then-DECIMAL convention for float sums
    across engines)."""
    ev = load(spark, sf_dir, "events")
    cnt = (
        ev.withColumn("dt", F.date_format("ts", "yyyy-MM-dd"))
        .groupBy("dt", "event_type")
        .agg(F.count("*").alias("n"))
    )
    tot = cnt.groupBy("dt").agg(
        F.sum("n").alias("total"), F.count("*").alias("n_types")
    )
    p = F.col("n").cast("double") / F.col("total")
    ent_term = F.round(-p * F.log(p), 9).cast("decimal(20,9)")
    gini_term = F.round(p * p, 9).cast("decimal(20,9)")
    return (
        cnt.join(tot, "dt")
        .groupBy("dt", "n_types")
        .agg(
            F.round(F.sum(ent_term), 6).cast("double").alias("entropy"),
            F.round(F.sum(gini_term), 6).cast("double").alias("gini_sum"),
        )
    )


@query(
    "agg_moments_merge",
    oracle="""
    WITH partials AS (
      SELECT event_type, strftime(ts, '%Y-%m-%d') AS dt,
             CAST(count(*) AS BIGINT) AS n,
             SUM(CAST(ROUND(value, 9) AS DECIMAL(28,9))) AS s1,
             SUM(CAST(ROUND(value * value, 9) AS DECIMAL(28,9))) AS s2
      FROM events GROUP BY event_type, dt
    ), merged AS (
      SELECT event_type,
             CAST(SUM(n) AS BIGINT) AS n,
             SUM(s1) AS s1, SUM(s2) AS s2
      FROM partials GROUP BY event_type
    )
    SELECT event_type, n,
           CAST(ROUND(CAST(s1 AS DOUBLE) / n, 6) AS DOUBLE) AS mean_value,
           CAST(ROUND(
             (n * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
               / (CAST(n AS DOUBLE) * (n - 1)), 6) AS DOUBLE) AS var_value
    FROM merged
    """,
)
def agg_moments_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-moments variance — the parallel-aggregation law made
    explicit: per-(type, day) partials (n, Σx, Σx²) merge by simple
    addition into per-type totals, from which mean and sample variance
    derive algebraically. This is HOW every distributed engine computes
    var/stddev internally; materializing the partials makes them
    reusable (incremental maintenance — etl_incremental_agg_merge's
    law, extended to second moments) and mergeable across days,
    shards, or streaming epochs without touching raw rows again.
    Moment sums are round-then-DECIMAL, so the merged totals — and
    therefore the derived variance — are bit-identical across engines
    and aggregation orders; the final formula is evaluated on exact
    decimals cast to double in one deterministic expression."""
    ev = load(spark, sf_dir, "events")
    partials = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("dt")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.round("value", 9).cast("decimal(28,9)")).alias("s1"),
        F.sum(
            F.round(F.col("value") * F.col("value"), 9).cast("decimal(28,9)")
        ).alias("s2"),
    )
    merged = partials.groupBy("event_type").agg(
        F.sum("n").alias("n"),
        F.sum("s1").alias("s1"),
        F.sum("s2").alias("s2"),
    )
    n = F.col("n")
    s1d = F.col("s1").cast("double")
    s2d = F.col("s2").cast("double")
    return merged.select(
        "event_type",
        "n",
        F.round(s1d / n, 6).alias("mean_value"),
        F.round(
            (n * s2d - s1d * s1d) / (n.cast("double") * (n - 1)), 6
        ).alias("var_value"),
    )


@query(
    "agg_abc_pareto",
    oracle="""
    WITH rev AS (
      SELECT p.p_brand,
             SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount), 4)
                      AS DECIMAL(28,4))) AS revenue
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY p.p_brand
    ), tot AS (SELECT SUM(revenue) AS t FROM rev
    ), ranked AS (
      SELECT r.p_brand, r.revenue,
             SUM(r.revenue) OVER (
               ORDER BY r.revenue DESC, r.p_brand
               ROWS UNBOUNDED PRECEDING) AS cum_rev,
             t.t
      FROM rev r, tot t
    )
    SELECT p_brand,
           CAST(ROUND(CAST(revenue AS DOUBLE), 2) AS DOUBLE) AS revenue,
           CAST(ROUND(CAST(cum_rev AS DOUBLE) / CAST(t AS DOUBLE), 6)
                AS DOUBLE) AS cum_share,
           CASE WHEN 5 * (cum_rev - revenue) < 4 * t THEN 'A'
                WHEN 20 * (cum_rev - revenue) < 19 * t THEN 'B'
                ELSE 'C' END AS abc_class
    FROM ranked
    """,
)
def agg_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto revenue classification per brand: rank brands by
    revenue, accumulate share, and class A/B/C at the 80% / 95%
    cumulative cuts — the inventory-analysis staple. Class boundaries
    compare EXACT DECIMALS via cross-multiplication (5·cum < 4·total
    instead of cum/total < 0.8), so no float division ever decides a
    class; the prior-cumulative convention (class from the share
    BEFORE this brand) makes the first boundary-crossing brand still
    'A' — the textbook rule. The rank window is global but runs over
    the BRAND aggregate (bounded cardinality, the dq_skew_audit
    exemption); revenue itself aggregates distributed with map-side
    partials."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    rev = (
        li.join(F.broadcast(p.select("p_partkey", "p_brand")),
                li.l_partkey == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
                ).cast("decimal(28,4)")
            ).alias("revenue")
        )
    )
    tot = rev.agg(F.sum("revenue").alias("t"))
    w = Window.orderBy(F.col("revenue").desc(), "p_brand").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = rev.crossJoin(F.broadcast(tot)).select(
        "p_brand",
        "revenue",
        F.sum("revenue").over(w).alias("cum_rev"),
        "t",
    )
    prior = F.col("cum_rev") - F.col("revenue")
    return ranked.select(
        "p_brand",
        F.round(F.col("revenue").cast("double"), 2).alias("revenue"),
        F.round(
            F.col("cum_rev").cast("double") / F.col("t").cast("double"), 6
        ).alias("cum_share"),
        F.when(5 * prior < 4 * F.col("t"), "A")
        .when(20 * prior < 19 * F.col("t"), "B")
        .otherwise("C")
        .alias("abc_class"),
    )


@query(
    "agg_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    ), trans AS (
      SELECT prev_type, event_type AS next_type,
             CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, next_type
    ), tot AS (
      SELECT prev_type, SUM(n) AS row_total FROM trans GROUP BY prev_type
    )
    SELECT t.prev_type, t.next_type, t.n,
           CAST(ROUND(t.n / CAST(o.row_total AS DOUBLE), 6) AS DOUBLE) AS p
    FROM trans t JOIN tot o ON t.prev_type = o.prev_type
    """,
)
def agg_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of the event stream: counts
    and row-normalized probabilities of (previous type -> next type)
    per user journey — the session-flow model behind next-action
    prediction and anomalous-sequence detection. One user-partitioned
    lag window + one hash agg on the (5x5-bounded) transition key;
    the row totals re-join as a broadcast. The probability is a single
    exact division (exact BIGINT counts), identical across engines."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    trans = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count("*").alias("n"))
    tot = trans.groupBy("prev_type").agg(F.sum("n").alias("row_total"))
    return trans.join(F.broadcast(tot), "prev_type").select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.col("row_total").cast("double"), 6).alias("p"),
    )


@query(
    "agg_distinct_set_ops",
    oracle="""
    WITH per_day AS (
      SELECT strftime(ts, '%Y-%m-%d') AS dt,
             CAST(count(DISTINCT CASE WHEN event_type = 'view'
                                 THEN user_id END) AS BIGINT) AS viewers,
             CAST(count(DISTINCT CASE WHEN event_type = 'purchase'
                                 THEN user_id END) AS BIGINT) AS buyers,
             CAST(count(DISTINCT CASE WHEN event_type IN ('view', 'purchase')
                                 THEN user_id END) AS BIGINT) AS either_set
      FROM events GROUP BY dt
    )
    SELECT dt, viewers, buyers, either_set,
           viewers + buyers - either_set AS both_set
    FROM per_day
    """,
)
def agg_distinct_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-set algebra per day: |viewers|, |buyers|, |either| as
    three conditional COUNT(DISTINCT)s in ONE aggregation, and the
    intersection derived by inclusion-exclusion (|A∩B| = |A|+|B|-|A∪B|)
    — no self-join, no second pass. This is the exact-count shape of
    audience-overlap analysis; at 100 TB the same algebra runs on
    mergeable sketches (sketch_hll_merge / agg_bitmap_distinct supply
    the union-mergeable counters — HLL intersection uses precisely
    this identity, with error bounds). Spark expands multi-distinct
    aggregates via a single Expand node — one shuffle."""
    ev = load(spark, sf_dir, "events")
    viewers = F.countDistinct(
        F.when(F.col("event_type") == "view", F.col("user_id"))
    )
    buyers = F.countDistinct(
        F.when(F.col("event_type") == "purchase", F.col("user_id"))
    )
    either = F.countDistinct(
        F.when(
            F.col("event_type").isin("view", "purchase"), F.col("user_id")
        )
    )
    return (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("dt"))
        .agg(
            viewers.alias("viewers"),
            buyers.alias("buyers"),
            either.alias("either_set"),
        )
        .select(
            "dt",
            "viewers",
            "buyers",
            "either_set",
            (F.col("viewers") + F.col("buyers") - F.col("either_set")).alias(
                "both_set"
            ),
        )
    )


_EQUIDEPTH_BUCKETS = 8


@query(
    "agg_histogram_equidepth",
    oracle=f"""
    WITH vc AS (
      SELECT l_quantity AS v, CAST(count(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY l_quantity
    ), cum AS (
      SELECT v, cnt,
             SUM(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(cnt) OVER () AS n
      FROM vc
    ), assigned AS (
      SELECT v, cnt,
             CAST({_EQUIDEPTH_BUCKETS} * (cum - cnt) // n AS BIGINT)
               AS bucket
      FROM cum
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS ndv,
           CAST(SUM(cnt) AS BIGINT) AS n_rows,
           MIN(v) AS lo, MAX(v) AS hi
    FROM assigned GROUP BY bucket
    """,
)
def agg_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equi-height) histogram over l_quantity — the
    optimizer statistic ANALYZE TABLE builds (agg_histogram_fixed is
    its equi-WIDTH sibling): whole value-groups are assigned to the
    bucket their PRIOR cumulative count falls in (floor(B·cum_before
    / n) — pure integer arithmetic, no quantile interpolation), so
    buckets are near-equal in row mass while never splitting a value.
    The cumulative window runs over the VALUE-COUNT relation (50
    distinct quantities — bounded cardinality, the dq_skew_audit
    exemption), never the fact table; the heavy lifting is one
    map-side-combinable count per value. Output per bucket: row mass,
    NDV, and [lo, hi] bounds — exactly the skipping metadata a
    cost-based optimizer consumes."""
    li = load(spark, sf_dir, "lineitem")
    vc = li.groupBy(F.col("l_quantity").alias("v")).agg(
        F.count("*").alias("cnt")
    )
    w_cum = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    cum = vc.select(
        "v",
        "cnt",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    assigned = cum.select(
        "v",
        "cnt",
        F.expr(
            f"CAST({_EQUIDEPTH_BUCKETS} * (cum - cnt) div n AS BIGINT)"
        ).alias("bucket"),
    )
    return assigned.groupBy("bucket").agg(
        F.count("*").alias("ndv"),
        F.sum("cnt").alias("n_rows"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    )


@query(
    "agg_gini_spend",
    oracle="""
    WITH spend AS (
      SELECT o_custkey,
             SUM(CAST(ROUND(o_totalprice, 2) AS DECIMAL(28,2))) AS x
      FROM orders GROUP BY o_custkey
    ), ranked AS (
      SELECT x,
             row_number() OVER (ORDER BY x, o_custkey) AS i,
             CAST(count(*) OVER () AS BIGINT) AS n,
             SUM(x) OVER () AS sx
      FROM spend
    )
    SELECT MIN(n) AS n_customers,
           CAST(ROUND(CAST(MIN(sx) AS DOUBLE), 2) AS DOUBLE) AS total_spend,
           CAST(ROUND(
             2.0 * CAST(SUM(i * x) AS DOUBLE)
               / (MIN(n) * CAST(MIN(sx) AS DOUBLE))
             - (MIN(n) + 1.0) / MIN(n), 6) AS DOUBLE) AS gini
    FROM ranked
    """,
)
def agg_gini_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend — the concentration metric
    behind whale-detection and fairness audits: G = 2·Σ(i·x_i)/(n·Σx)
    − (n+1)/n over ascending-sorted per-customer totals. Spend totals
    are DECIMAL (exact), the rank·value products and both sums are
    exact integers/decimals, so the only float ops are the two final
    divisions — bit-identical across engines. The rank window runs
    over the CUSTOMER AGGREGATE (key-space cardinality, the
    dq_skew_audit exemption); tied spends contribute the same Σi·x
    under any tie order, so the custkey tiebreak is for rank
    determinism only, not value stability."""
    o = load(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.round("o_totalprice", 2).cast("decimal(28,2)")).alias("x")
    )
    w_rank = Window.orderBy("x", "o_custkey")
    w_all = Window.partitionBy()
    ranked = spend.select(
        "x",
        F.row_number().over(w_rank).alias("i"),
        F.count("*").over(w_all).alias("n"),
        F.sum("x").over(w_all).alias("sx"),
    )
    n = F.min("n")
    sx = F.min("sx").cast("double")
    return ranked.agg(
        n.alias("n_customers"),
        F.round(sx, 2).alias("total_spend"),
        F.round(
            2.0 * F.sum(F.col("i") * F.col("x")).cast("double") / (n * sx)
            - (n + F.lit(1.0)) / n,
            6,
        ).alias("gini"),
    )


@query(
    "agg_gini_binned",
    oracle="""
    WITH spend AS (
      SELECT o_custkey,
             SUM(CAST(ROUND(o_totalprice, 2) AS DECIMAL(28,2))) AS x
      FROM orders GROUP BY o_custkey
    ), b AS (
      SELECT LENGTH(CAST(CAST(x * 100 AS DECIMAL(38,0)) AS VARCHAR)) * 100
             + CAST(SUBSTR(CAST(CAST(x * 100 AS DECIMAL(38,0)) AS VARCHAR),
                           1, 2) AS INT) AS bucket,
             x
      FROM spend
    ), binned AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS nb, SUM(x) AS sb
      FROM b GROUP BY bucket
    ), cum AS (
      SELECT nb, sb, SUM(sb) OVER (ORDER BY bucket) AS cb FROM binned
    ), g AS (
      SELECT CAST(SUM(nb) AS BIGINT) AS n_customers,
             CAST(COUNT(*) AS BIGINT) AS n_bins,
             ROUND(1.0 - CAST(SUM(nb * (2 * cb - sb)) AS DOUBLE)
                   / (SUM(nb) * CAST(MAX(cb) AS DOUBLE)), 6) AS gini_binned
      FROM cum
    ), ranked AS (
      SELECT x,
             row_number() OVER (ORDER BY x, o_custkey) AS i,
             CAST(count(*) OVER () AS BIGINT) AS n,
             SUM(x) OVER () AS sx
      FROM spend
    ), exact AS (
      SELECT 2.0 * CAST(SUM(i * x) AS DOUBLE)
               / (MIN(n) * CAST(MIN(sx) AS DOUBLE))
             - (MIN(n) + 1.0) / MIN(n) AS gini_exact
      FROM ranked
    )
    SELECT n_customers, n_bins, gini_binned,
           ABS(gini_binned - gini_exact) <= 0.05 AS err_ok
    FROM g, exact
    """,
)
def agg_gini_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-safe Gini — the 100 TB replacement for ``agg_gini_spend``'s
    global-rank WindowExec. The exact formula needs every customer
    globally SORTED by spend (a single-partition window at scale); this
    sibling replaces the sort with a grouped Lorenz-curve trapezoid over
    value-binned spend:

    (1) per-customer totals (one keyed shuffle, same as exact);
    (2) each total is assigned a TWO-SIGNIFICANT-DIGIT bucket computed
        on the exact cents integer (``len(digits)*100 + first-2-digits``)
        — pure integer/string ops, bit-identical across engines, no
        float log boundaries, no global pass for min/max;
    (3) per-bucket (count, sum) — HashAggregate with map-side combine
        into at most ~90 buckets/decade (a few hundred total regardless
        of row count);
    (4) grouped Gini G = 1 − Σ n_b·(C_{b-1}+C_b) / (N·S) over the
        bucket grain only (the dq_skew_audit window exemption). The
        numerator is an exact BIGINT×DECIMAL sum; the single final
        division is the only float op — deterministic to the last bit.

    Certificate (``err_ok``), computed INDEPENDENTLY on each side:
    grouped Gini differs from exact Gini by exactly the within-bin
    inequality Σ p_b·q_b·G_b (value-disjoint bins), and two-sig-digit
    bins have within-bin hi/lo ≤ r = 1.1, so G_b ≤ (r−1)/(r+1) and the
    engine asserts the SOUND data-computed bound
    0.0476·Σ(n_b·s_b)/(N·S) ≤ 0.05 — no global sort needed. The oracle
    asserts the stronger ground truth |G_binned − G_exact| ≤ 0.05 from
    a full exact-Gini recomputation; if the bound ever lied, the two
    sides would disagree and parity would fail (the round-7 advice:
    the engine previously emitted a constant True). ``gini_binned``
    itself is value-matched exactly. Plan gate in tests/test_plans.py:
    the only Window in the plan runs on the bucket grain, after the
    bucket HashAggregate."""
    o = load(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.round("o_totalprice", 2).cast("decimal(28,2)")).alias("x")
    )
    cents = (F.col("x") * 100).cast("decimal(38,0)").cast("string")
    bucket = (
        F.length(cents) * 100 + F.substring(cents, 1, 2).cast("int")
    ).alias("bucket")
    binned = spend.select(bucket, "x").groupBy("bucket").agg(
        F.count("*").alias("nb"), F.sum("x").alias("sb")
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = binned.select("nb", "sb", F.sum("sb").over(w).alias("cb"))
    return cum.agg(
        F.sum("nb").cast("long").alias("n_customers"),
        F.count("*").cast("long").alias("n_bins"),
        F.round(
            F.lit(1.0)
            - F.sum(F.col("nb") * (2 * F.col("cb") - F.col("sb"))).cast("double")
            / (F.sum("nb") * F.max("cb").cast("double")),
            6,
        ).alias("gini_binned"),
        (
            F.lit((1.1 - 1.0) / (1.1 + 1.0))
            * F.sum(F.col("nb") * F.col("sb")).cast("double")
            / (F.sum("nb").cast("double") * F.max("cb").cast("double"))
            <= 0.05
        ).alias("err_ok"),
    )


@query(
    "agg_argmax_minmax_by",
    oracle="""
    SELECT o_custkey,
           arg_max(o_orderkey,
                   CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                        * 10000000 + o_orderkey AS BIGINT)) AS best_order,
           arg_min(o_orderkey,
                   CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                        * 10000000 + o_orderkey AS BIGINT)) AS worst_order,
           ROUND(MAX(o_totalprice), 2) AS best_price,
           ROUND(MIN(o_totalprice), 2) AS worst_price
    FROM orders GROUP BY o_custkey
    """,
)
def agg_argmax_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax/argmin aggregates (max_by / min_by — SQL:2023's ANY_VALUE
    cousins): each customer's most and least expensive order id in ONE
    pass — no window, no self-join, partial-aggregable (each partition
    keeps one candidate). Both engines leave TIES implementation-
    defined, so the ordering value is made STRICTLY UNIQUE by packing
    (cents x 1e7 + orderkey) into one BIGINT — the
    determinism-by-construction move every value-hash-checked argmax
    needs (same reason the window keys carry tiebreakers). Price in
    cents via ROUND(x*100) keeps the pack integer-exact."""
    o = load(spark, sf_dir, "orders")
    pack = (
        F.round(F.col("o_totalprice") * 100, 0).cast("long") * 10000000
        + F.col("o_orderkey")
    ).cast("long")
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", pack).alias("best_order"),
        F.min_by("o_orderkey", pack).alias("worst_order"),
        F.round(F.max("o_totalprice"), 2).alias("best_price"),
        F.round(F.min("o_totalprice"), 2).alias("worst_price"),
    )


@query(
    "agg_share_of_total",
    oracle="""
    WITH per_cell AS (
      SELECT strftime(ts, '%Y-%m-%d') AS dt, event_type,
             SUM(CAST(ROUND(value, 4) AS DECIMAL(18,4))) AS v
      FROM events GROUP BY dt, event_type
    ), with_tot AS (
      SELECT dt, event_type, v,
             SUM(v) OVER (PARTITION BY dt) AS day_total,
             SUM(v) OVER () AS grand_total
      FROM per_cell
    )
    SELECT dt, event_type,
           CAST(ROUND(CAST(v AS DOUBLE), 2) AS DOUBLE) AS cell_value,
           CAST(ROUND(CAST(v AS DOUBLE) / CAST(day_total AS DOUBLE), 6)
                AS DOUBLE) AS share_of_day,
           CAST(ROUND(CAST(v AS DOUBLE) / CAST(grand_total AS DOUBLE), 6)
                AS DOUBLE) AS share_of_total
    FROM with_tot
    """,
)
def agg_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composition-over-time matrix: each (day, event type) cell's value
    as a share of its day and of the whole table — the
    percent-of-total window pattern (SUM OVER at two grouping levels
    on one pass) behind every stacked-area composition chart. The
    windows run over the (days x types) AGGREGATE — calendar-bounded —
    never the fact table; cell sums are DECIMAL-exact so both share
    divisions divide identical exact numerators/denominators.
    Contrast with win_cume_percent (rank distribution WITHIN a
    group): this is mass composition ACROSS groups."""
    ev = load(spark, sf_dir, "events")
    per_cell = ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("dt"), "event_type"
    ).agg(F.sum(F.round("value", 4).cast("decimal(18,4)")).alias("v"))
    w_day = Window.partitionBy("dt")
    w_all = Window.partitionBy()
    with_tot = per_cell.select(
        "dt",
        "event_type",
        "v",
        F.sum("v").over(w_day).alias("day_total"),
        F.sum("v").over(w_all).alias("grand_total"),
    )
    v = F.col("v").cast("double")
    return with_tot.select(
        "dt",
        "event_type",
        F.round(v, 2).alias("cell_value"),
        F.round(v / F.col("day_total").cast("double"), 6).alias(
            "share_of_day"
        ),
        F.round(v / F.col("grand_total").cast("double"), 6).alias(
            "share_of_total"
        ),
    )


@query(
    "agg_skew_kurtosis_exact",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,0))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,0))
                      * CAST(l_quantity AS DECIMAL(18,0))) AS DOUBLE) AS s2,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,0))
                      * CAST(l_quantity AS DECIMAL(18,0))
                      * CAST(l_quantity AS DECIMAL(18,0))) AS DOUBLE) AS s3,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,0))
                      * CAST(l_quantity AS DECIMAL(18,0))
                      * CAST(l_quantity AS DECIMAL(18,0))
                      * CAST(l_quantity AS DECIMAL(18,0))) AS DOUBLE) AS s4
      FROM lineitem GROUP BY l_returnflag
    ),
    m AS (
      SELECT l_returnflag, n, s1 / n AS mu,
             s2 / n - (s1 / n) * (s1 / n) AS m2,
             s3 / n - 3 * (s1 / n) * (s2 / n)
                    + 2 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
             s4 / n - 4 * (s1 / n) * (s3 / n)
                    + 6 * (s1 / n) * (s1 / n) * (s2 / n)
                    - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
      FROM s
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           CAST(ROUND(mu, 6) AS DOUBLE) AS mean_qty,
           CAST(ROUND(m3 / POW(m2, 1.5), 6) AS DOUBLE) AS skewness_pop,
           CAST(ROUND(m4 / (m2 * m2) - 3, 6) AS DOUBLE) AS excess_kurtosis
    FROM m
    """,
)
def agg_skew_kurtosis_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis per return flag,
    computed from EXACT power sums instead of the engines' builtin
    aggregates — Spark's skewness/kurtosis are population-convention
    while DuckDB's are bias-corrected sample statistics, so the
    builtins can NEVER hash-match; worse, streaming co-moment
    accumulation orders differ. The repo answer: quantities are
    integers 1–50, so Σx..Σx⁴ are EXACT in DECIMAL (map-side-combined
    integer arithmetic, Σx⁴ ≤ 3.8e11 — no overflow, no float order
    sensitivity), and the central-moment formulas then run as an
    identical fixed sequence of double ops on identical inputs —
    bit-reproducible on any cluster layout, which is the property a
    monitoring pipeline needs from a distribution-shape metric.

    Plan: one scan, one 3-key hash aggregation; the moment algebra is
    constant-folded projection work."""
    li = load(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("decimal(18,0)")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(q).cast("double").alias("s1"),
        F.sum(q * q).cast("double").alias("s2"),
        F.sum(q * q * q).cast("double").alias("s3"),
        F.sum(q * q * q * q).cast("double").alias("s4"),
    )
    n, s1, s2, s3, s4 = (F.col(c) for c in ("n", "s1", "s2", "s3", "s4"))
    mu = s1 / n
    m2 = s2 / n - mu * mu
    m3 = s3 / n - 3 * mu * (s2 / n) + 2 * mu * mu * mu
    m4 = (
        s4 / n
        - 4 * mu * (s3 / n)
        + 6 * mu * mu * (s2 / n)
        - 3 * mu * mu * mu * mu
    )
    return s.select(
        "l_returnflag",
        n.cast("long").alias("n"),
        F.round(mu, 6).alias("mean_qty"),
        F.round(m3 / F.pow(m2, 1.5), 6).alias("skewness_pop"),
        F.round(m4 / (m2 * m2) - 3, 6).alias("excess_kurtosis"),
    )


@query(
    "agg_trimmed_winsorized",
    oracle="""
    WITH edges AS (
      SELECT l_returnflag,
             quantile_cont(l_extendedprice, 0.1) AS p10,
             quantile_cont(l_extendedprice, 0.9) AS p90
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(ROUND(AVG(l.l_extendedprice), 4) AS DOUBLE) AS mean_raw,
           CAST(ROUND(AVG(CASE WHEN l.l_extendedprice BETWEEN e.p10 AND e.p90
                               THEN l.l_extendedprice END), 4) AS DOUBLE)
             AS mean_trimmed,
           CAST(ROUND(AVG(LEAST(GREATEST(l.l_extendedprice, e.p10), e.p90)),
                      4) AS DOUBLE) AS mean_winsorized
    FROM lineitem l JOIN edges e ON l.l_returnflag = e.l_returnflag
    GROUP BY l.l_returnflag
    """,
)
def agg_trimmed_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust central tendency per return flag: the 10% trimmed mean
    (drop both tails) and the winsorized mean (clamp both tails) next
    to the raw mean — the outlier-resistant estimators a metrics
    pipeline swaps in when a fat tail or a bad feed corrupts plain
    averages (complementing dq_anomaly_mad's robust SPREAD estimator).

    Plan: the per-group decile edges are one aggregation over the
    grouped scan, broadcast back onto the same scan by group key (two
    passes over cached input, the unavoidable minimum for
    rank-dependent trimming), then one aggregation computes all three
    means. Trim membership uses inclusive BETWEEN against identical
    interpolated edges on both engines; at 100 TB the edges come from
    approx_percentile and the second pass is unchanged."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    edges = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", 0.1).alias("p10"),
        F.percentile("l_extendedprice", 0.9).alias("p90"),
    )
    j = li.join(F.broadcast(edges), "l_returnflag")
    x = F.col("l_extendedprice")
    return j.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.round(F.avg(x), 4).alias("mean_raw"),
        F.round(
            F.avg(F.when(x.between(F.col("p10"), F.col("p90")), x)), 4
        ).alias("mean_trimmed"),
        F.round(
            F.avg(F.least(F.greatest(x, F.col("p10")), F.col("p90"))), 4
        ).alias("mean_winsorized"),
    )


@query(
    "agg_hhi_concentration",
    oracle="""
    WITH seg AS (
      SELECT c.c_mktsegment,
             l.l_suppkey,
             SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS rev
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment, l.l_suppkey
    ),
    tot AS (
      SELECT c_mktsegment, SUM(rev) AS seg_rev FROM seg GROUP BY c_mktsegment
    )
    SELECT s.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           CAST(ROUND(SUM(POW(10000.0 * s.rev / t.seg_rev, 2)) / 10000.0, 4)
                AS DOUBLE) AS hhi,
           ROUND(SUM(POW(10000.0 * s.rev / t.seg_rev, 2)) / 10000.0, 4)
             > 2500.0 AS concentrated
    FROM seg s JOIN tot t ON s.c_mktsegment = t.c_mktsegment
    GROUP BY s.c_mktsegment
    """,
)
def agg_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration index per market segment:
    the sum of squared supplier market shares (in percentage points,
    the antitrust convention — 10,000 = monopoly, > 2,500 =
    highly concentrated). The CONCENTRATION complement to
    agg_gini_spend's inequality: procurement risk dashboards watch HHI
    to flag segments hostage to one supplier.

    Share numerators accumulate as DECIMAL (exact — the revenue-bridge
    discipline), and each segment's shares divide by a 1-row-per-
    segment total joined back in, so the only float work is the final
    square-and-sum over exact ratios of exact decimals — identical
    division sequences on both engines, rounded at emission. Plan:
    star join with broadcast dims, two grouped aggregations on
    (segment, supplier) then (segment) — map-side combined, no
    windows."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice"
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    seg = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "l_suppkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("rev")
        )
    )
    tot = seg.groupBy(F.col("c_mktsegment").alias("seg2")).agg(
        F.sum("rev").alias("seg_rev")
    )
    j = seg.join(F.broadcast(tot), seg.c_mktsegment == tot.seg2)
    share_pp = F.lit(10000.0) * (F.col("rev") / F.col("seg_rev"))
    hhi = F.sum(F.pow(share_pp, 2)) / 10000.0
    # round-before-compare: the share-square SUM accumulates in
    # shuffle order, so the unrounded flag would be run-order-dependent
    # at the threshold (the pipeline_abc_xyz lesson).
    return j.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_suppliers"),
        F.round(hhi, 4).alias("hhi"),
        (F.round(hhi, 4) > 2500.0).alias("concentrated"),
    )
