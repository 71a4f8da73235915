"""Composite analytics pipelines — multi-operator logical plans.

Single-operator keys prove each primitive; these prove the primitives
compose under Catalyst the way real workloads use them: TPC-H-shaped
star-join reports (adapted to the fixture's columns, FIXTURES.md) and
event-stream product analytics (funnel, retention). Each is declared as
one DataFrame expression so the optimizer sees the whole plan — filter
pushdown through joins, broadcast dim selection, join reordering, and
partial aggregation all verified by the same oracle gate as everything
else.

100 TB posture: every pipeline joins facts to broadcast dims on equi
keys, filters before joining (pushdown), and aggregates with map-side
combine; the only shuffles are the aggregation keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_hive_batch_sink_spark.io import load
from flume_hive_batch_sink_spark.registry import query


@query(
    "pipeline_tpch_q3",
    oracle="""
    SELECT l.l_orderkey,
           CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                        AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15'
      AND l.l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def pipeline_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority report (TPC-H Q3 adapted): segment-filtered
    customers ⋈ date-filtered orders ⋈ lineitem, top-10 by revenue.
    Filters sit on the base tables so they push into the scans before
    either join."""
    cutoff = "1995-03-15"
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,4)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@query(
    "pipeline_tpch_q5",
    oracle="""
    SELECT n.n_name,
           CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                        AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
)
def pipeline_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier volume (TPC-H Q5 adapted): the full 6-table star
    join. Order is encoded in a revenue sort; the hash gate is
    order-insensitive so no rank column is needed."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,4)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "pipeline_tpch_q10",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                        AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
           ROUND(c.c_acctbal, 2) AS c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def pipeline_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item report (TPC-H Q10 adapted): top-20 customers by
    lost revenue in a quarter."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,4)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
    )


@query(
    "pipeline_tpch_q4",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_returnflag = 'R')
    GROUP BY o.o_orderpriority
    """,
)
def pipeline_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority checking (TPC-H Q4 adapted: the fixture has no
    commit/receipt dates, so the EXISTS predicate is "has a returned
    line"). The EXISTS compiles to a left-semi join, which never
    duplicates or widens order rows — at 100 TB the semi join ships only
    the lineitem join key, and the date filter prunes orders before the
    shuffle."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "pipeline_tpch_q6",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def pipeline_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecasting-revenue-change (TPC-H Q6): pure scan-filter-aggregate,
    no joins. All three predicates push into the parquet scan (row-group
    stats prune on shipdate at scale); the aggregate is a single
    map-side-combined reduction to one row — the cheapest possible
    100 TB query shape."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        ),
        F.count("*").alias("n_lines"),
    )


@query(
    "pipeline_tpch_q14",
    oracle="""
    SELECT ROUND(
             100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                              THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                                        AS DECIMAL(18,4))
                              ELSE 0 END) AS DOUBLE)
             / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(18,4))) AS DOUBLE), 4) AS promo_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
      AND l.l_shipdate < TIMESTAMP '1996-04-01'
    """,
)
def pipeline_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion-effect share (TPC-H Q14 adapted: the fixture's p_type is
    a category, so equality instead of LIKE 'PROMO%'). part is a
    broadcast dim; the month filter prunes lineitem before the join, so
    the only data movement is the broadcast itself."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    p = load(spark, sf_dir, "part")
    net = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    promo = F.when(F.col("p_type") == "PROMO", net).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0 * F.sum(promo).cast("double") / F.sum(net).cast("double"), 4
            ).alias("promo_pct")
        )
    )


@query(
    "pipeline_tpch_q18",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           o.o_orderdate, ROUND(o.o_totalprice, 2) AS o_totalprice,
           ROUND(SUM(l.l_quantity), 2) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
             o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
)
def pipeline_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customers (TPC-H Q18): the HAVING subquery is one
    aggregation over lineitem reused as a semi-join filter. Both the
    qualifying-order aggregate and the re-join key are l_orderkey, so
    the two lineitem passes share one shuffle partitioning (no extra
    exchange between them); customer stays broadcast."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 250)
        .select("l_orderkey")
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
    )


@query(
    "pipeline_funnel",
    oracle="""
    WITH stages AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT
      COUNT(t_view) AS n_view,
      COUNT(CASE WHEN t_click > t_view THEN 1 END) AS n_view_click,
      COUNT(CASE WHEN t_click > t_view AND t_purchase > t_click THEN 1 END)
        AS n_view_click_purchase
    FROM stages
    """,
)
def pipeline_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase funnel: per-user first-touch times in one
    pivot-style aggregation, then ordered-stage counts. Two map-side-
    combined aggregations, no joins, no windows — the cheapest funnel
    shape at 100 TB (events shuffle once, on user_id)."""
    ev = load(spark, sf_dir, "events")

    def first_ts(etype: str) -> F.Column:
        return F.min(F.when(F.col("event_type") == etype, F.col("ts")))

    stages = ev.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    ordered_click = F.col("t_click") > F.col("t_view")
    ordered_purchase = ordered_click & (F.col("t_purchase") > F.col("t_click"))
    return stages.agg(
        F.count("t_view").alias("n_view"),
        F.count(F.when(ordered_click, 1)).alias("n_view_click"),
        F.count(F.when(ordered_purchase, 1)).alias("n_view_click_purchase"),
    )


@query(
    "pipeline_retention",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    )
    SELECT strftime(a.d, '%Y-%m-%d') AS day,
           COUNT(*) AS n_active,
           COUNT(b.user_id) AS n_retained_next_day
    FROM days a
    LEFT JOIN days b ON b.user_id = a.user_id AND b.d = a.d + INTERVAL 1 DAY
    GROUP BY a.d
    """,
)
def pipeline_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day retention: distinct active (user, day) pairs
    self-joined one day forward. The self-join key is (user_id, day) —
    an equi join that co-partitions both sides on the same shuffle key,
    no theta join needed."""
    ev = load(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    nxt = days.select(
        F.col("user_id").alias("u2"), F.date_sub("d", 1).alias("d2")
    )
    return (
        days.join(
            nxt, (F.col("user_id") == F.col("u2")) & (F.col("d") == F.col("d2")), "left"
        )
        .groupBy(F.date_format("d", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count("*").alias("n_active"),
            F.count("u2").alias("n_retained_next_day"),
        )
    )


@query(
    "pipeline_tpch_q7",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(ROUND(SUM(CAST(volume AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate < TIMESTAMP '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def pipeline_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume shipping between two nations (TPC-H Q7): the same nation
    dim joins twice under different roles (supplier side, customer
    side). Both nation joins broadcast; the disjunctive nation-pair
    predicate can only be applied after both are bound, but Catalyst
    still pushes each side's IN('NATION_1','NATION_2') component down
    into the broadcasted dims via constraint propagation. Facts shuffle
    only for the final group-by."""
    s = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,4)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "pipeline_tpch_q13",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def pipeline_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution (TPC-H Q13): left outer join
    preserving order-less customers, then a double aggregation. The
    first group-by reuses the join's hash partitioning on c_custkey
    (no extra exchange); the second is a near-free rollup of ~50
    distinct counts."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@query(
    "pipeline_tpch_q19",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#5' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#9' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def pipeline_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted-revenue promotion (TPC-H Q19): a disjunction of
    conjunctive predicates spanning both join sides. Catalyst derives
    the single-side implications (p_brand IN (...), l_quantity <= 30)
    and pushes them below the join into both scans, so the broadcast
    join only sees pre-filtered rows; the residual OR evaluates post-
    join inside codegen."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#5")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#9")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30)
    )
    return j.filter(cond).agg(
        F.round(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            ),
            2,
        )
        .cast("double")
        .alias("revenue"),
        F.count("*").alias("n_lines"),
    )


@query(
    "pipeline_tpch_q22",
    oracle="""
    WITH avg_bal AS (
      SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey, count(*) AS numcust,
           CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1997-06-01')
    GROUP BY c.c_nationkey
    """,
)
def pipeline_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-sales-opportunity (TPC-H Q22 adapted): customers with
    above-average balance and no RECENT order (since mid-1997),
    grouped by nation. The recency bound replaces the original's
    "never ordered" — which is empty in this fixture at sf0.01 (every
    customer has ordered), so the anti join was attested only on
    0 = 0 rows there (round-8 verdict's vacuity class). The scalar
    average is a 1-row aggregate cross-joined as a broadcast (never
    collected to the driver — the same plan works when customer is
    10 TB); "no recent orders" is a left-anti join shipping only the
    date-filtered o_custkey slice."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "1997-06-01"
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("a")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("totacctbal"),
        )
    )


@query(
    "pipeline_tpch_q2",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    cand AS (
      SELECT ps.l_partkey AS p_partkey, s.s_name,
             ROUND(s.s_acctbal, 2) AS s_acctbal, n.n_name
      FROM ps
      JOIN supplier s ON ps.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    ranked AS (
      SELECT *, min(s_acctbal) OVER (PARTITION BY p_partkey) AS mn
      FROM cand
    )
    SELECT rk.p_partkey, p.p_name, rk.s_name, rk.s_acctbal, rk.n_name
    FROM ranked rk JOIN part p ON p.p_partkey = rk.p_partkey
    WHERE rk.s_acctbal = rk.mn
    """,
)
def pipeline_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-cost supplier (TPC-H Q2 adapted: the fixture has no
    partsupp, so the part↔supplier relation is the distinct
    (l_partkey, l_suppkey) pairs from lineitem, and min supplier
    acctbal stands in for min supplycost). The correlated scalar
    subquery of the original becomes a window min over the candidate
    set — one shuffle on p_partkey shared by the window and nothing
    else; dims broadcast. Ties on the min keep all rows in both
    engines (order-insensitive hash)."""
    ps = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load(spark, sf_dir, "part")
    cand = (
        ps.join(F.broadcast(s), ps.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "s_name",
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "n_name",
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("mn", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("mn"))
        .drop("mn")
        .join(F.broadcast(load(spark, sf_dir, "part").select("p_partkey", "p_name")),
              "p_partkey")
        .select("p_partkey", "p_name", "s_name", "s_acctbal", "n_name")
    )


@query(
    "pipeline_tpch_q9",
    oracle="""
    SELECT nation, o_year,
           CAST(ROUND(SUM(CAST(amount AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount)
               - p.p_retailprice * l.l_quantity * 0.001 AS amount
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%ring%'
    ) profit
    GROUP BY nation, o_year
    """,
)
def pipeline_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit (TPC-H Q9 adapted: no ps_supplycost in the
    fixture, so cost is proxied by p_retailprice scaled per unit). The
    LIKE filter prunes part before broadcasting; lineitem joins three
    broadcast dims pipelined in one codegen stage, then one shuffle
    for the (nation, year) rollup — the canonical star-join profile
    this engine optimizes for at 100 TB."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%ring%"))
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity") * F.lit(0.001)
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            F.round(F.sum(amount.cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("sum_profit")
        )
    )


@query(
    "pipeline_bounce_rate",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                   OR date_diff('second', lag(ts) OVER w, ts) > 1800
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id,
             SUM(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS session_id,
             ts
      FROM flagged
    ), per_sess AS (
      SELECT user_id, session_id,
             CAST(count(*) AS BIGINT) AS n_events,
             strftime(MIN(ts), '%Y-%m-%d') AS dt
      FROM sess GROUP BY user_id, session_id
    )
    SELECT dt,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounces,
           CAST(ROUND(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                      / CAST(count(*) AS DOUBLE), 4) AS DOUBLE)
             AS bounce_rate
    FROM per_sess GROUP BY dt
    """,
)
def pipeline_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate — the web-analytics composite over idle-gap
    sessionization (30-min timeout, the reference's idleTimeout
    semantics): a bounce is a single-event session, attributed to the
    day the session STARTED (MIN ts — a session straddling midnight
    counts once). Same integer gap logic as idle_sessionize
    (date_diff on whole seconds — no float timestamps), one shuffle
    on user_id shared by both windows, then a day-keyed rollup whose
    cardinality is the calendar."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap_s.isNull() | (gap_s > 1800), 1).otherwise(0).alias(
            "new_sess"
        ),
    )
    sess = flagged.select(
        "user_id",
        "ts",
        F.sum("new_sess")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_id"),
    )
    per_sess = sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd").alias("dt"),
    )
    bounce = F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
    return per_sess.groupBy("dt").agg(
        F.count("*").alias("n_sessions"),
        bounce.alias("n_bounces"),
        F.round(bounce / F.count("*").cast("double"), 4).alias("bounce_rate"),
    )


@query(
    "pipeline_attribution_touch",
    oracle="""
    WITH p AS (
      SELECT event_id AS purchase_id, user_id, ts AS p_ts
      FROM events WHERE event_type = 'purchase'
    ), touch AS (
      SELECT user_id, event_id AS touch_id, ts AS t_ts, event_type AS channel
      FROM events WHERE event_type IN ('view', 'click')
    ), cand AS (
      SELECT p.purchase_id, p.user_id, p.p_ts, t.touch_id, t.t_ts, t.channel
      FROM p JOIN touch t
        ON p.user_id = t.user_id
       AND t.t_ts <= p.p_ts
       AND t.t_ts >= p.p_ts - INTERVAL 7 DAY
    ), firsts AS (
      SELECT purchase_id,
             MIN(ROW(t_ts, touch_id, channel)) AS ft,
             MAX(ROW(t_ts, touch_id, channel)) AS lt
      FROM cand GROUP BY purchase_id
    )
    SELECT p.purchase_id, p.user_id, p.p_ts,
           f.ft[2] AS first_touch_id, f.ft[3] AS first_channel,
           f.lt[2] AS last_touch_id, f.lt[3] AS last_channel
    FROM p LEFT JOIN firsts f ON p.purchase_id = f.purchase_id
    """,
)
def pipeline_attribution_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First- and last-touch marketing attribution: every purchase is
    attributed to the earliest and latest view/click by the same user
    in the trailing 7 days. Same bounded band-join shape as
    ts_asof_tolerance (equi key + time band residual — plan-gated
    family), but BOTH endpoints of the candidate set extract via ONE
    aggregation: min/max over a (ts, id, channel) struct, which
    partial-aggregates map-side — no window, no second shuffle.
    Unattributed purchases (no touch in the window) survive with NULL
    attribution — the audit rows a marketing pipeline must not drop.
    The struct-ordering tiebreak (ts, then event_id) is identical in
    both engines' ROW comparison semantics."""
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    touch = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("t_user_id"),
        F.col("event_id").alias("touch_id"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("channel"),
    )
    cand = p.join(
        touch,
        (F.col("user_id") == F.col("t_user_id"))
        & (F.col("t_ts") <= F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAY")),
    )
    firsts = cand.groupBy("purchase_id").agg(
        F.min(F.struct("t_ts", "touch_id", "channel")).alias("ft"),
        F.max(F.struct("t_ts", "touch_id", "channel")).alias("lt"),
    )
    return p.join(firsts, "purchase_id", "left").select(
        "purchase_id",
        "user_id",
        "p_ts",
        F.col("ft.touch_id").alias("first_touch_id"),
        F.col("ft.channel").alias("first_channel"),
        F.col("lt.touch_id").alias("last_touch_id"),
        F.col("lt.channel").alias("last_channel"),
    )


@query(
    "pipeline_weekly_churn",
    oracle="""
    WITH active AS (
      SELECT DISTINCT user_id,
             CAST((CAST(strftime(ts, '%d') AS INT) - 1) // 7 AS BIGINT)
               AS wk
      FROM events
    ), weeks AS (
      SELECT wk, CAST(count(*) AS BIGINT) AS active_users FROM active
      GROUP BY wk
    ), retained AS (
      SELECT a.wk, CAST(count(*) AS BIGINT) AS retained_users
      FROM active a JOIN active b
        ON a.user_id = b.user_id AND b.wk = a.wk + 1
      GROUP BY a.wk
    )
    SELECT w.wk, w.active_users,
           coalesce(r.retained_users, 0) AS retained_users,
           w.active_users - coalesce(r.retained_users, 0) AS churned_users,
           CAST(ROUND((w.active_users - coalesce(r.retained_users, 0))
                      / CAST(w.active_users AS DOUBLE), 4) AS DOUBLE)
             AS churn_rate
    FROM weeks w LEFT JOIN retained r ON w.wk = r.wk
    WHERE w.wk < (SELECT MAX(wk) FROM weeks)
    """,
)
def pipeline_weekly_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly churn: users active in week w with no activity in week
    w+1 — the subscription-health metric, week = integer (day-1)//7 of
    the fixture month (calendar-grain churn is the same query on a
    month key). Dataflow: one distinct on (user, week) — the only
    touch of the fact table — then week-pair retention via a
    self-equi-join on (user, week+1) and per-week counts; the final
    week is excluded (its retention window hasn't closed — the
    standard right-censoring rule). All-integer keys; one exact
    division per row of a calendar-bounded result."""
    ev = load(spark, sf_dir, "events")
    wk = ((F.dayofmonth("ts") - 1) / 7).cast("long")
    active = ev.select("user_id", wk.alias("wk")).distinct()
    weeks = active.groupBy("wk").agg(F.count("*").alias("active_users"))
    b = active.select(
        F.col("user_id").alias("b_user"), (F.col("wk") - 1).alias("prev_wk")
    )
    retained = (
        active.join(
            b,
            (active.user_id == b.b_user) & (active.wk == b.prev_wk),
        )
        .groupBy("wk")
        .agg(F.count("*").alias("retained_users"))
    )
    max_wk = weeks.agg(F.max("wk").alias("m"))
    out = (
        weeks.join(retained, "wk", "left")
        .crossJoin(F.broadcast(max_wk))
        .filter(F.col("wk") < F.col("m"))
    )
    churned = F.col("active_users") - F.coalesce(
        F.col("retained_users"), F.lit(0)
    )
    return out.select(
        "wk",
        "active_users",
        F.coalesce("retained_users", F.lit(0)).alias("retained_users"),
        churned.alias("churned_users"),
        F.round(
            churned / F.col("active_users").cast("double"), 4
        ).alias("churn_rate"),
    )


@query(
    "pipeline_new_returning",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, MIN(strftime(ts, '%Y-%m-%d')) AS first_dt
      FROM events GROUP BY user_id
    ), daily AS (
      SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS dt FROM events
    )
    SELECT d.dt,
           CAST(SUM(CASE WHEN d.dt = f.first_dt THEN 1 ELSE 0 END)
                AS BIGINT) AS new_users,
           CAST(SUM(CASE WHEN d.dt <> f.first_dt THEN 1 ELSE 0 END)
                AS BIGINT) AS returning_users
    FROM daily d JOIN first_seen f ON d.user_id = f.user_id
    GROUP BY d.dt
    """,
)
def pipeline_new_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning split: a user's first-ever active day
    classifies them 'new' that day and 'returning' every later active
    day — the acquisition-vs-engagement decomposition of DAU. Two hash
    aggs on user_id (first-seen and daily-active share the
    partitioning) + a broadcast-scale join of two user-keyed
    aggregates; string day keys keep the compare engine-exact. At
    100 TB first_seen is an incrementally-maintained snapshot
    (etl_incremental_agg_merge's MIN law — never recomputed from
    history)."""
    ev = load(spark, sf_dir, "events")
    dt = F.date_format("ts", "yyyy-MM-dd")
    first_seen = ev.groupBy("user_id").agg(F.min(dt).alias("first_dt"))
    daily = ev.select("user_id", dt.alias("dt")).distinct()
    j = daily.join(first_seen, "user_id")
    return j.groupBy("dt").agg(
        F.sum(
            F.when(F.col("dt") == F.col("first_dt"), 1).otherwise(0)
        ).alias("new_users"),
        F.sum(
            F.when(F.col("dt") != F.col("first_dt"), 1).otherwise(0)
        ).alias("returning_users"),
    )


@query(
    "pipeline_cohort_ltv",
    oracle="""
    WITH cohort AS (
      SELECT user_id,
             CAST((CAST(strftime(MIN(ts), '%d') AS INT) - 1) // 7 AS BIGINT)
               AS cohort_wk
      FROM events GROUP BY user_id
    ), spend AS (
      SELECT e.user_id, c.cohort_wk,
             CAST((CAST(strftime(e.ts, '%d') AS INT) - 1) // 7 AS BIGINT)
               - c.cohort_wk AS wk_offset,
             CAST(ROUND(e.value, 4) AS DECIMAL(18,4)) AS v
      FROM events e JOIN cohort c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase'
    ), wk_rev AS (
      SELECT cohort_wk, wk_offset, SUM(v) AS wk_value
      FROM spend GROUP BY cohort_wk, wk_offset
    ), sizes AS (
      SELECT cohort_wk, CAST(count(*) AS BIGINT) AS cohort_size
      FROM cohort GROUP BY cohort_wk
    )
    SELECT w.cohort_wk, w.wk_offset, s.cohort_size,
           CAST(ROUND(SUM(w2.wk_value), 2) AS DOUBLE) AS cum_value,
           CAST(ROUND(CAST(SUM(w2.wk_value) AS DOUBLE) / s.cohort_size, 6)
                AS DOUBLE) AS ltv_per_user
    FROM wk_rev w
    JOIN wk_rev w2 ON w2.cohort_wk = w.cohort_wk
                  AND w2.wk_offset <= w.wk_offset
    JOIN sizes s ON s.cohort_wk = w.cohort_wk
    GROUP BY w.cohort_wk, w.wk_offset, s.cohort_size
    """,
)
def pipeline_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: users grouped by first-seen week,
    purchase value accumulated by weeks-since-acquisition, normalized
    per cohort head — the LTV matrix growth teams read (each row is a
    point on one cohort's curve). Spark builds the cumulative with an
    ordered window over the (cohort, offset) aggregate — a
    calendar-bounded relation, so the window is trivially cheap; the
    oracle expresses the identical running sum as a self-join (DuckDB
    window frames and this join are equivalent on exact DECIMALs).
    Heavy lifting: one MIN-per-user agg (the incrementally
    maintainable first-seen snapshot) + one purchase-side hash agg."""
    from pyspark.sql.window import Window as W

    ev = load(spark, sf_dir, "events")
    wk = ((F.dayofmonth("ts") - 1) / 7).cast("long")
    cohort = ev.groupBy("user_id").agg(F.min(wk).alias("cohort_wk"))
    spend = (
        ev.filter(F.col("event_type") == "purchase")
        .join(cohort, "user_id")
        .select(
            "cohort_wk",
            (wk - F.col("cohort_wk")).alias("wk_offset"),
            F.round("value", 4).cast("decimal(18,4)").alias("v"),
        )
    )
    wk_rev = spend.groupBy("cohort_wk", "wk_offset").agg(
        F.sum("v").alias("wk_value")
    )
    sizes = cohort.groupBy("cohort_wk").agg(
        F.count("*").alias("cohort_size")
    )
    w_cum = (
        W.partitionBy("cohort_wk")
        .orderBy("wk_offset")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = wk_rev.select(
        "cohort_wk",
        "wk_offset",
        F.sum("wk_value").over(w_cum).alias("cum_v"),
    )
    return cum.join(F.broadcast(sizes), "cohort_wk").select(
        "cohort_wk",
        "wk_offset",
        "cohort_size",
        F.round(F.col("cum_v").cast("double"), 2).alias("cum_value"),
        F.round(
            F.col("cum_v").cast("double") / F.col("cohort_size"), 6
        ).alias("ltv_per_user"),
    )


@query(
    "pipeline_session_paths",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                   OR date_diff('second', lag(ts) OVER w, ts) > 1800
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    ), paths AS (
      SELECT user_id, session_id,
             array_to_string(list_slice(
               string_split(
                 string_agg(event_type, '>' ORDER BY ts, event_id), '>'),
               1, 5), '>') AS path
      FROM sess GROUP BY user_id, session_id
    ), counted AS (
      SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
      FROM paths GROUP BY path
    )
    SELECT path, n_sessions, rk FROM (
      SELECT path, n_sessions,
             row_number() OVER (ORDER BY n_sessions DESC, path) AS rk
      FROM counted)
    WHERE rk <= 10
    """,
)
def pipeline_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top session paths: each session's first five event types joined
    into a path signature ('view>click>purchase...'), counted across
    the corpus, top-10 — the navigation-flow mining behind funnel
    DESIGN (pipeline_funnel measures a chosen funnel; this surfaces
    which funnels exist). Sessionization reuses the 30-min idle-gap
    construction; the in-session ordering is made shuffle-proof by
    sorting the collected (ts, event_id, type) structs INSIDE the
    row (sort_array — collect order never matters), then truncating
    to 5 — bounded state per session regardless of session length.
    Path counting is an ordinary hash agg on a bounded signature
    domain; the final top-10 compiles to TakeOrdered."""
    from pyspark.sql.window import Window as W

    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    sess = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum(
            F.when(gap_s.isNull() | (gap_s > 1800), 1).otherwise(0)
        )
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("session_id"),
    )
    paths = sess.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.slice(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct("ts", "event_id", "event_type")
                        )
                    ),
                    lambda x: x["event_type"],
                ),
                1,
                5,
            ),
            ">",
        ).alias("path")
    )
    counted = paths.groupBy("path").agg(F.count("*").alias("n_sessions"))
    w_rk = W.orderBy(F.col("n_sessions").desc(), "path")
    return (
        counted.withColumn("rk", F.row_number().over(w_rk))
        .filter(F.col("rk") <= 10)
        .select("path", "n_sessions", "rk")
    )


@query(
    "pipeline_market_basket",
    oracle="""
    WITH ob AS (
      SELECT DISTINCT l_orderkey, p_brand
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    n_orders AS (SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS n
                 FROM lineitem),
    brand_supp AS (
      SELECT p_brand, CAST(count(*) AS BIGINT) AS n_brand FROM ob
      GROUP BY p_brand
    ),
    pairs AS (
      SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
             CAST(count(*) AS BIGINT) AS n_both
      FROM ob a JOIN ob b
        ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
      GROUP BY a.p_brand, b.p_brand
    )
    SELECT p.brand_a, p.brand_b, p.n_both,
           CAST(ROUND(p.n_both / (SELECT n FROM n_orders), 6) AS DOUBLE)
             AS support,
           CAST(ROUND((p.n_both * (SELECT n FROM n_orders))
                      / (sa.n_brand * CAST(sb.n_brand AS DOUBLE)), 6)
                AS DOUBLE) AS lift
    FROM pairs p
    JOIN brand_supp sa ON p.brand_a = sa.p_brand
    JOIN brand_supp sb ON p.brand_b = sb.p_brand
    WHERE p.n_both >= 20
    """,
)
def pipeline_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: support and lift for every brand pair
    co-purchased in one order (the frequent-itemset k=2 core of the
    A-Priori family — Agrawal & Srikant, VLDB'94).

    Plan shape: lineitem joins the broadcast part dim to tag each line
    with its brand, collapses to DISTINCT (order, brand) — the basket
    relation — then self-joins keyed on l_orderkey. The fan-out per
    join key is the basket's distinct-brand count (<= 25 brands, p99 =
    8 in the fixture), so the pair stage is O(orders x basket^2), NOT
    O(n^2): the classic per-basket pair generation that survives any
    order count. Pair counts aggregate with map-side combine onto at
    most C(25,2) = 300 group keys; brand marginals broadcast back for
    the lift ratio. A 100 TB deployment bounds the fan-out the same
    way — baskets are small no matter how many there are; only a
    degenerate mega-basket would need a per-basket item cap first.
    min-support floor (n_both >= 20) prunes noise pairs exactly like
    A-Priori's support threshold. Round-then-compare on both engines.
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    n_orders = float(li.select("l_orderkey").distinct().count())
    a = ob.select(
        F.col("l_orderkey").alias("k"), F.col("p_brand").alias("brand_a")
    )
    b = ob.select(
        F.col("l_orderkey").alias("k2"), F.col("p_brand").alias("brand_b")
    )
    pairs = (
        a.join(b, (a.k == b.k2) & (F.col("brand_a") < F.col("brand_b")))
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").alias("n_both"))
        .filter(F.col("n_both") >= 20)
    )
    supp = ob.groupBy("p_brand").agg(F.count("*").alias("n_brand"))
    sa = supp.select(
        F.col("p_brand").alias("brand_a"), F.col("n_brand").alias("na")
    )
    sb = supp.select(
        F.col("p_brand").alias("brand_b"), F.col("n_brand").alias("nb")
    )
    return (
        pairs.join(F.broadcast(sa), "brand_a")
        .join(F.broadcast(sb), "brand_b")
        .select(
            "brand_a",
            "brand_b",
            "n_both",
            F.round(F.col("n_both") / F.lit(n_orders), 6).alias("support"),
            F.round(
                (F.col("n_both") * F.lit(n_orders))
                / (F.col("na") * F.col("nb").cast("double")),
                6,
            ).alias("lift"),
        )
    )


@query(
    "pipeline_rfm",
    oracle="""
    WITH m AS (
      SELECT o_custkey,
             date_diff('day', MAX(o_orderdate),
                       (SELECT MAX(o_orderdate) FROM orders)) AS recency_days,
             CAST(count(*) AS BIGINT) AS frequency,
             CAST(ROUND(SUM(o_totalprice), 2) AS DOUBLE) AS monetary
      FROM orders GROUP BY o_custkey
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM m),
    scored AS (
      SELECT o_custkey, recency_days, frequency, monetary,
             1 + CAST(FLOOR(4.0 * (ROW_NUMBER() OVER (
                   ORDER BY recency_days ASC, o_custkey) - 1)
                 / (SELECT n FROM nn)) AS BIGINT) AS r_score,
             1 + CAST(FLOOR(4.0 * (ROW_NUMBER() OVER (
                   ORDER BY frequency DESC, o_custkey) - 1)
                 / (SELECT n FROM nn)) AS BIGINT) AS f_score,
             1 + CAST(FLOOR(4.0 * (ROW_NUMBER() OVER (
                   ORDER BY monetary DESC, o_custkey) - 1)
                 / (SELECT n FROM nn)) AS BIGINT) AS m_score
      FROM m
    )
    SELECT o_custkey, recency_days, frequency, monetary,
           r_score, f_score, m_score,
           CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT) AS rfm_cell
    FROM scored
    """,
)
def pipeline_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation —
    the classic CRM scoring composite. Each customer gets quartile
    scores 1-4 per dimension (1 = best: most recent, most frequent,
    highest spend) and a 3-digit cell id.

    Quartiles use the explicit rank formula `1 + floor(4*(rn-1)/n)`
    with a custkey tiebreak instead of NTILE so the bucketing is a
    DEFINED function of the data (NTILE's remainder distribution is
    engine-convention); both engines replay it bit-identically. Plan
    shape: one groupBy(o_custkey) aggregation (map-side partial) over
    orders, then three global row_number windows over the AGGREGATED
    relation — |customers|, not |orders|. The fixture's global sort is
    the same trade documented for win_ntile: at 100 TB the scale path
    is approx_percentile cut points + bucketing (win_ntile_approx,
    WindowExec-free), which this key's formula was chosen to make a
    drop-in swap. The global max(o_orderdate) anchor is a scalar
    broadcast, not a driver loop."""
    from pyspark.sql.window import Window

    orders = load(spark, sf_dir, "orders")
    # The global anchor joins in as a broadcast 1-row aggregate, NOT a
    # collected Python datetime: a driver-side datetime round-trips
    # through the Python process timezone (collect → fromtimestamp →
    # lit → mktime) and shifts the date under a non-UTC process TZ —
    # caught by the hostile-TZ driver simulation.
    mx = orders.agg(F.max("o_orderdate").alias("anchor"))
    m = (
        orders.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("cmax"),
            F.count("*").alias("frequency"),
            F.round(F.sum("o_totalprice"), 2).alias("monetary"),
        )
        .join(F.broadcast(mx))
        .select(
            "o_custkey",
            F.datediff("anchor", "cmax").alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    n = m.count()

    def _score(order_cols) -> F.Column:
        rn = F.row_number().over(Window.orderBy(*order_cols))
        return (
            1 + F.floor(F.lit(4.0) * (rn - 1) / F.lit(n))
        ).cast("long")

    scored = m.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        _score([F.col("recency_days").asc(), F.col("o_custkey")]).alias(
            "r_score"
        ),
        _score([F.col("frequency").desc(), F.col("o_custkey")]).alias(
            "f_score"
        ),
        _score([F.col("monetary").desc(), F.col("o_custkey")]).alias(
            "m_score"
        ),
    )
    return scored.withColumn(
        "rfm_cell",
        (
            F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")
        ).cast("long"),
    )


@query(
    "pipeline_time_to_convert",
    oracle="""
    WITH s AS (
      SELECT user_id, MIN(ts) AS signup_ts FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS first_purchase_ts
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= s.signup_ts
      GROUP BY e.user_id
    ),
    d AS (
      SELECT s.user_id,
             date_trunc('week', s.signup_ts) AS cohort_week,
             (epoch_us(p.first_purchase_ts) - epoch_us(s.signup_ts))
               // 1000000 AS tt_seconds
      FROM s JOIN p ON s.user_id = p.user_id
    )
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(count(*) AS BIGINT) AS n_converted,
           CAST(ROUND(quantile_cont(tt_seconds, 0.5), 2) AS DOUBLE)
             AS median_tt_s,
           CAST(ROUND(quantile_cont(tt_seconds, 0.9), 2) AS DOUBLE)
             AS p90_tt_s,
           CAST(MIN(tt_seconds) AS BIGINT) AS min_tt_s,
           CAST(MAX(tt_seconds) AS BIGINT) AS max_tt_s
    FROM d GROUP BY cohort_week
    """,
)
def pipeline_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion LATENCY by signup cohort — the companion metric to
    pipeline_funnel's conversion COUNTS: for each user, seconds from
    first signup to first subsequent purchase; per cohort week, the
    median/p90/min/max of that delay (the activation-speed curve a
    growth team watches).

    Plan: two user-grain MIN aggregations (map-side combined) and one
    equi-join on user_id — the per-user firsts collapse the raw stream
    before anything joins, so the join carries |users| rows, not
    |events|. The >= signup_ts residual rides the equi join (same
    bounded-band shape as pipeline_attribution_touch). Latencies are
    microsecond-exact integer seconds (floor-of-difference, the
    dq_freshness_lag convention); percentiles are exact interpolated
    (`percentile` ≡ `quantile_cont`) on the per-cohort grain, swapping
    to approx_percentile sketches at 100 TB per the agg_percentile
    note."""
    ev = load(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("p_ts"))
        .join(s, "user_id")
        .filter(F.col("p_ts") >= F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("p_ts").alias("first_purchase_ts"))
    )
    d = s.join(p, "user_id").select(
        F.date_trunc("WEEK", "signup_ts").alias("cohort_week"),
        F.expr(
            "(unix_micros(first_purchase_ts) - unix_micros(signup_ts))"
            " div 1000000"
        ).alias("tt_seconds"),
    )
    return d.groupBy(
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week")
    ).agg(
        F.count("*").alias("n_converted"),
        F.round(F.percentile("tt_seconds", 0.5), 2).alias("median_tt_s"),
        F.round(F.percentile("tt_seconds", 0.9), 2).alias("p90_tt_s"),
        F.min("tt_seconds").alias("min_tt_s"),
        F.max("tt_seconds").alias("max_tt_s"),
    )


@query(
    "pipeline_revenue_bridge",
    oracle="""
    WITH d AS (
      SELECT date_trunc('month', l_shipdate) AS m,
             CAST(l_extendedprice AS DECIMAL(18,2)) AS price_d,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_discount AS DECIMAL(6,2)) AS disc_amt,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(6,2)))
               * CAST(l_tax AS DECIMAL(6,2)) AS tax_amt
      FROM lineitem
    )
    SELECT strftime(m, '%Y-%m') AS ship_month,
           CAST(SUM(price_d) AS DOUBLE) AS gross,
           CAST(SUM(disc_amt) AS DOUBLE) AS discount_amt,
           CAST(SUM(tax_amt) AS DOUBLE) AS tax_amt,
           CAST(SUM(price_d - disc_amt + tax_amt) AS DOUBLE) AS net_charged
    FROM d GROUP BY 1
    """,
)
def pipeline_revenue_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue bridge — the finance decomposition every revenue
    dashboard opens with: gross book value, discount given back, tax
    collected, and the net amount actually charged (gross − discount +
    tax), bridged so the components provably sum to the total.

    Exactness discipline (the TPC-H Q1 convention taken further): the
    2-decimal columns cast to DECIMAL at the scan (the cast absorbs
    the double representation error; no ROUND anywhere — round-half
    conventions differ between engines and WILL flip a 4th decimal on
    exact-tie products), every component is then pure decimal
    multiplication, so the bridge identity gross − discount + tax =
    net holds EXACTLY and no float summation order can break it in
    either engine. Plan: one scan, one month-key aggregation with map-side
    combine — a 100 TB ledger rolls up exactly like the fixture."""
    li = load(spark, sf_dir, "lineitem")
    gross = F.col("l_extendedprice").cast("decimal(18,2)")
    disc_d = F.col("l_discount").cast("decimal(6,2)")
    tax_d = F.col("l_tax").cast("decimal(6,2)")
    disc = gross * disc_d
    tax = gross * (F.lit(1).cast("decimal(6,2)") - disc_d) * tax_d
    return li.groupBy(
        F.date_format(F.date_trunc("MONTH", "l_shipdate"), "yyyy-MM").alias(
            "ship_month"
        )
    ).agg(
        F.sum(gross).cast("double").alias("gross"),
        F.sum(disc).cast("double").alias("discount_amt"),
        F.sum(tax).cast("double").alias("tax_amt"),
        F.sum(gross - disc + tax).cast("double").alias("net_charged"),
    )


@query(
    "pipeline_ship_sla",
    oracle="""
    WITH lag AS (
      SELECT o.o_orderpriority,
             date_diff('day', o.o_orderdate, l.l_shipdate) AS lag_days
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate >= o.o_orderdate
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(ROUND(AVG(lag_days), 4) AS DOUBLE) AS avg_lag_days,
           CAST(ROUND(quantile_cont(lag_days, 0.9), 2) AS DOUBLE)
             AS p90_lag_days,
           CAST(SUM(CASE WHEN lag_days > 90 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_late,
           CAST(ROUND(SUM(CASE WHEN lag_days > 90 THEN 1 ELSE 0 END)
                      / CAST(count(*) AS DOUBLE), 6) AS DOUBLE) AS late_rate
    FROM lag GROUP BY o_orderpriority
    """,
)
def pipeline_ship_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship SLA report by priority class: per-line fulfillment
    lag (whole days, order date → ship date), its mean and p90, and
    the rate breaching a 90-day SLA — the operational complement to
    TPC-H Q4's late-order counting, at line grain where the expediting
    decisions happen. Lines shipped before their order date (data
    errors) are excluded rather than polluting the lag distribution —
    dq_constraint_suite's job is to count them.

    Plan: the fact join carries only the two date columns plus the
    broadcast priority dim column; day lags are exact integer
    datediffs on date-cast timestamps (both engines truncate
    identically — midnight-anchored fixture dates); one 5-key
    aggregation with map-side combine. Exact p90 per the
    agg_percentile convention, approx at 100 TB."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lag = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(
            "o_orderpriority",
            F.datediff("l_shipdate", "o_orderdate").alias("lag_days"),
        )
    )
    late = F.sum(F.when(F.col("lag_days") > 90, 1).otherwise(0))
    return lag.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_lines"),
        F.round(F.avg("lag_days"), 4).alias("avg_lag_days"),
        F.round(F.percentile("lag_days", 0.9), 2).alias("p90_lag_days"),
        late.alias("n_late"),
        F.round(late / F.count("*").cast("double"), 6).alias("late_rate"),
    )


@query(
    "pipeline_dau_wau_mau",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events
    ),
    days AS (SELECT DISTINCT d FROM ud),
    contrib AS (
      SELECT user_id, d AS active_day,
             unnest(generate_series(d, d + INTERVAL 29 DAY,
                                    INTERVAL 1 DAY)) AS report_day
      FROM ud
    ),
    mau AS (
      SELECT report_day, count(DISTINCT user_id) AS mau
      FROM contrib GROUP BY report_day
    ),
    wau AS (
      SELECT report_day, count(DISTINCT user_id) AS wau
      FROM contrib
      WHERE report_day <= active_day + INTERVAL 6 DAY
      GROUP BY report_day
    ),
    dau AS (
      SELECT d AS report_day, count(*) AS dau FROM ud GROUP BY d
    )
    SELECT strftime(dy.d, '%Y-%m-%d') AS dt,
           CAST(dau.dau AS BIGINT) AS dau,
           CAST(wau.wau AS BIGINT) AS wau,
           CAST(mau.mau AS BIGINT) AS mau,
           CAST(ROUND(dau.dau / CAST(mau.mau AS DOUBLE), 6) AS DOUBLE)
             AS stickiness
    FROM days dy
    JOIN dau ON dau.report_day = dy.d
    JOIN wau ON wau.report_day = dy.d
    JOIN mau ON mau.report_day = dy.d
    """,
)
def pipeline_dau_wau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / WAU / MAU / stickiness (DAU÷MAU) per day — the canonical
    product-health panel. Trailing-window distinct users CANNOT be a
    running window aggregate (COUNT DISTINCT doesn't decompose over
    frames); the scalable shape is the contribution explode: each
    (user, active day) row contributes to the ≤30 report days whose
    trailing window contains it, then one distinct-count per report
    day. Fan-out is a CONSTANT 30× on the user-day grain — which is
    already tiny relative to raw events (the first distinct collapses
    all of a user's events per day) — so the whole panel is two
    bounded aggregations at any raw volume; report days beyond the
    observed calendar are dropped by the inner join to observed days
    (trailing windows stay honest at the series edge: early days
    report partial windows by definition, the convention every
    analytics store uses).

    WAU filters the same contribution relation to a 6-day reach
    instead of exploding twice — one explode serves both windows."""
    ev = load(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.date_trunc("DAY", "ts").alias("d")
    ).distinct()
    days = ud.select("d").distinct()
    contrib = ud.select(
        "user_id",
        F.col("d").alias("active_day"),
        F.explode(
            F.sequence(
                "d",
                F.col("d") + F.expr("INTERVAL 29 DAY"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("report_day"),
    )
    mau = contrib.groupBy("report_day").agg(
        F.countDistinct("user_id").alias("mau")
    )
    wau = (
        contrib.filter(
            F.col("report_day")
            <= F.col("active_day") + F.expr("INTERVAL 6 DAY")
        )
        .groupBy("report_day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    dau = ud.groupBy(F.col("d").alias("report_day")).agg(
        F.count("*").alias("dau")
    )
    out = (
        days.join(dau, days.d == dau.report_day)
        .drop("report_day")
        .join(wau, days.d == wau.report_day)
        .drop("report_day")
        .join(mau, days.d == mau.report_day)
        .drop("report_day")
    )
    return out.select(
        F.date_format("d", "yyyy-MM-dd").alias("dt"),
        "dau",
        "wau",
        "mau",
        F.round(F.col("dau") / F.col("mau").cast("double"), 6).alias(
            "stickiness"
        ),
    )


@query(
    "pipeline_abc_xyz",
    oracle="""
    WITH wk AS (
      SELECT l_partkey, date_trunc('week', l_shipdate) AS w,
             SUM(CAST(l_quantity AS DECIMAL(18,0))) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    xyz AS (
      SELECT l_partkey,
             CAST(count(*) AS BIGINT) AS n_weeks,
             CAST(AVG(CAST(q AS DOUBLE)) AS DOUBLE) AS mu,
             CAST(stddev_samp(CAST(q AS DOUBLE)) AS DOUBLE) AS sd
      FROM wk GROUP BY l_partkey
    ),
    val AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
      FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT SUM(rev) AS t FROM val),
    ranked AS (
      SELECT l_partkey, rev,
             SUM(rev) OVER (ORDER BY rev DESC, l_partkey
                            ROWS UNBOUNDED PRECEDING) AS cum_rev
      FROM val
    ),
    abc AS (
      SELECT l_partkey,
             CASE WHEN CAST(cum_rev AS DOUBLE)
                       / CAST((SELECT t FROM tot) AS DOUBLE) <= 0.8 THEN 'A'
                  WHEN CAST(cum_rev AS DOUBLE)
                       / CAST((SELECT t FROM tot) AS DOUBLE) <= 0.95 THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM ranked
    ),
    cls AS (
      SELECT a.l_partkey, a.abc_class,
             CASE WHEN x.n_weeks < 2
                       OR ROUND(x.sd / x.mu, 9) >= 1.0 THEN 'Z'
                  WHEN ROUND(x.sd / x.mu, 9) < 0.5 THEN 'X'
                  ELSE 'Y' END AS xyz_class
      FROM abc a JOIN xyz x ON a.l_partkey = x.l_partkey
    )
    SELECT abc_class, xyz_class,
           CAST(count(*) AS BIGINT) AS n_parts
    FROM cls GROUP BY abc_class, xyz_class
    """,
)
def pipeline_abc_xyz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC-XYZ inventory classification — the supply-chain planning
    matrix: ABC slices parts by cumulative revenue share (A = the
    first 80%, B = to 95%, C = tail; agg_abc_pareto's construction)
    and XYZ by demand variability (coefficient of variation of weekly
    shipped quantity: X < 0.5 steady, Y intermediate, Z ≥ 1.0 or
    too-short history = erratic). The 9-cell count matrix drives
    stocking policy: AX = automate replenishment, CZ = make-to-order.

    Exactness: revenue and quantity sums accumulate as DECIMAL; the
    CV uses double mean/stddev over ≤ #weeks values per part
    (bounded), with the n_weeks < 2 guard routing undefined CVs to Z
    on both engines rather than dividing by a NULL stddev. Plan: two
    part-grain aggregations off one scan, a global revenue-ranked
    running sum over the PART grain (|parts| rows — the same bounded
    global window as agg_abc_pareto, approx cut points at 100 TB),
    one join, one 9-key rollup."""
    from pyspark.sql.window import Window

    li = load(spark, sf_dir, "lineitem")
    wk = li.groupBy(
        "l_partkey", F.date_trunc("WEEK", "l_shipdate").alias("w")
    ).agg(F.sum(F.col("l_quantity").cast("decimal(18,0)")).alias("q"))
    xyz = wk.groupBy("l_partkey").agg(
        F.count("*").alias("n_weeks"),
        F.avg(F.col("q").cast("double")).alias("mu"),
        F.stddev_samp(F.col("q").cast("double")).alias("sd"),
    )
    val = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("rev")
    )
    tot = val.agg(F.sum("rev").alias("t"))
    w = Window.orderBy(F.col("rev").desc(), "pk").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = val.withColumn("cum_rev", F.sum("rev").over(w))
    abc = ranked.join(F.broadcast(tot)).select(
        F.col("pk").alias("l_partkey"),
        F.when(
            F.col("cum_rev").cast("double") / F.col("t").cast("double")
            <= 0.8,
            "A",
        )
        .when(
            F.col("cum_rev").cast("double") / F.col("t").cast("double")
            <= 0.95,
            "B",
        )
        .otherwise("C")
        .alias("abc_class"),
    )
    # round-before-compare (repo convention): stddev_samp's partial-
    # aggregation order shifts sd at the last ulp between runs, which
    # flips a class for a part sitting exactly on the 0.5/1.0 CV
    # boundary — caught as run-order-dependent sf1 flakiness.
    cv = F.round(F.col("sd") / F.col("mu"), 9)
    cls = abc.join(xyz, "l_partkey").select(
        "abc_class",
        F.when((F.col("n_weeks") < 2) | (cv >= 1.0), "Z")
        .when(cv < 0.5, "X")
        .otherwise("Y")
        .alias("xyz_class"),
    )
    return cls.groupBy("abc_class", "xyz_class").agg(
        F.count("*").alias("n_parts")
    )
