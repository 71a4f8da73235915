"""TPC-H pipeline completion — the 9 queries not covered in analytics.py.

Together with plans/analytics.py this gives the full 22-query TPC-H
shape coverage (adapted to the fixture schema, FIXTURES.md: no
partsupp — the part↔supplier relation is the distinct
(l_partkey, l_suppkey) pairs observed in lineitem; no
l_shipmode/l_commitdate/l_receiptdate — "late" is proxied by
l_shipdate > o_orderdate + 60 days).

Oracle-compatibility discipline (FIXTURES.md §rules): every float SUM
goes through CAST(DECIMAL(18,4)) on BOTH engines (exact summation, no
float-order nondeterminism), ROUND then cast DOUBLE; comparisons that
gate row membership (HAVING, qty < k*avg) are done in exact decimal
arithmetic so no row flips on a float ulp.

100 TB posture: dims broadcast, facts filter before joining, correlated
EXISTS/IN become semi/anti joins shipping only join keys, scalar
subqueries become 1-row broadcast cross joins (never driver collects),
and self-aggregations share one shuffle partitioning with their re-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flume_hive_batch_sink_spark.io import load
from flume_hive_batch_sink_spark.registry import query


def _dsum(col: F.Column) -> F.Column:
    """Exact decimal sum of a double expression (both-engine pattern)."""
    return F.sum(col.cast("decimal(18,4)"))


def _money(col: F.Column, scale: int = 2) -> F.Column:
    """ROUND(decimal, scale) cast double — the oracle-stable money type."""
    return F.round(col, scale).cast("double")


@query(
    "pipeline_tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
             AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
             AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE)
             AS sum_disc_price,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                              AS DECIMAL(24,6))), 2) AS DOUBLE)
             AS sum_charge,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                 / COUNT(*), 4) AS avg_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                 / COUNT(*), 4) AS avg_price,
           ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)
                 / COUNT(*), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pipeline_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report (TPC-H Q1): the canonical scan-filter-agg.
    One pass over lineitem, all eight aggregates in a single
    HashAggregate with map-side combine; the shipdate predicate pushes
    into the parquet scan (row-group pruning at scale). Averages are
    exact-decimal sums divided by count — no float-order drift. The
    3-factor charge product casts at scale 6 (its true decimal width for
    2-decimal inputs); at scale 4 the cast lands on .00005 tie
    boundaries where Spark (HALF_UP) and DuckDB disagree. The charge SUM
    is rounded to scale 2 while still decimal: at sf1 the scale-6 sum
    × 10⁶ exceeds 2⁵³, where decimal→double conversion is 1-ulp
    engine-dependent; at scale 2 the cast is exact in both engines."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "2000-12-01")
    qty, price, disc, tax = (
        F.col("l_quantity"),
        F.col("l_extendedprice"),
        F.col("l_discount"),
        F.col("l_tax"),
    )
    cnt = F.count("*")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(qty).cast("double").alias("sum_qty"),
            _dsum(price).cast("double").alias("sum_base_price"),
            _dsum(price * (1 - disc)).cast("double").alias("sum_disc_price"),
            F.round(
                F.sum((price * (1 - disc) * (1 + tax)).cast("decimal(24,6)")), 2
            )
            .cast("double")
            .alias("sum_charge"),
            F.round(_dsum(qty).cast("double") / cnt, 4).alias("avg_qty"),
            F.round(_dsum(price).cast("double") / cnt, 4).alias("avg_price"),
            F.round(_dsum(disc).cast("double") / cnt, 4).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


@query(
    "pipeline_tpch_q8",
    oracle="""
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN nation = 'NATION_3'
                          THEN CAST(volume AS DECIMAL(18,4))
                          ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 / CAST(SUM(CAST(volume AS DECIMAL(18,4))) AS DOUBLE), 4)
             AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    """,
)
def pipeline_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share (TPC-H Q8 adapted: p_type category equality
    for the part filter; supplier nation NATION_3's share of ECONOMY-part
    revenue sold to AMERICA-region customers, by order year). Eight-table
    star join where every dim broadcasts; the two nation roles join under
    different aliases. Facts shuffle once, on the year rollup."""
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(zero))
                .cast("double")
                / F.sum(vol).cast("double"),
                4,
            ).alias("mkt_share")
        )
    )


@query(
    "pipeline_tpch_q11",
    oracle="""
    WITH pairval AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS val
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    natval AS (
      SELECT pv.l_partkey, pv.val
      FROM pairval pv
      JOIN supplier s ON pv.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_5'
    ),
    tot AS (SELECT SUM(val) AS t FROM natval),
    frac AS (SELECT 0.2 / count(*) AS f FROM supplier)
    SELECT nv.l_partkey AS p_partkey,
           CAST(ROUND(SUM(nv.val), 2) AS DOUBLE) AS part_value
    FROM natval nv, tot, frac
    GROUP BY nv.l_partkey, tot.t, frac.f
    HAVING CAST(SUM(nv.val) AS DOUBLE)
         > CAST(frac.f AS DOUBLE) * CAST(tot.t AS DOUBLE)
    """,
)
def pipeline_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important-stock identification (TPC-H Q11 adapted: no partsupp, so
    a pair's "stock value" is the summed extendedprice shipped for that
    (part, supplier) pair; NATION_5 plays GERMANY). The grand total is a
    1-row aggregate broadcast-cross-joined into the HAVING comparison —
    the same plan shape works when lineitem is 100 TB because the total
    never leaves the cluster. Both per-part and total sums are exact
    decimals; only the final fraction comparison drops to double,
    identically on both engines.

    The HAVING fraction scales with 1/SF like the spec's 0.0001/SF
    (TPC-H v3 §B.11): it is derived IN-PLAN from supplier cardinality
    (exactly 10,000·SF in these fixtures) as 0.2/|supplier| — 0.002 at
    sf0.01 (the driver's oracle scale, unchanged), 0.00002 at sf1 —
    so the key stays non-vacuous at sf≥1 instead of returning zero
    rows once the per-part share of a growing total dips below a fixed
    cutoff. Both engines compute the identical double division, and
    the 1-row fraction broadcasts like the total."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    pairval = li.groupBy("l_partkey", "l_suppkey").agg(
        _dsum(F.col("l_extendedprice")).alias("val")
    )
    natval = pairval.join(F.broadcast(s), pairval.l_suppkey == s.s_suppkey).join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    tot = natval.agg(F.sum("val").alias("t"))
    frac = load(spark, sf_dir, "supplier").agg(
        (F.lit(0.2) / F.count("*")).alias("f")
    )
    return (
        natval.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(frac))
        .groupBy("l_partkey", "t", "f")
        .agg(F.sum("val").alias("sv"))
        .filter(
            F.col("sv").cast("double")
            > F.col("f").cast("double") * F.col("t").cast("double")
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            _money(F.col("sv")).alias("part_value"),
        )
    )


@query(
    "pipeline_tpch_q12",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    GROUP BY l.l_returnflag
    """,
)
def pipeline_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-mode priority (TPC-H Q12 adapted: no l_shipmode/commit/
    receipt dates — l_returnflag plays the mode grouping and "shipped
    more than 60 days after ordering" is the lateness predicate). The
    year filter prunes lineitem pre-join; the cross-table lateness
    predicate evaluates post-join inside codegen. Conditional counts are
    integer sums (BIGINT both engines)."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "pipeline_tpch_q15",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
               AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(ROUND(r.total_rev, 2) AS DOUBLE) AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM revenue)
    """,
)
def pipeline_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier (TPC-H Q15): quarterly revenue per supplier, keep
    the max. The scalar MAX subquery becomes an unpartitioned window max
    over the (small, one-row-per-supplier) aggregate — no driver
    round-trip, and the equality is on exact decimals so ties keep all
    rows identically in both engines."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    s = load(spark, sf_dir, "supplier")
    revenue = li.groupBy("l_suppkey").agg(
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_rev")
    )
    w = Window.partitionBy()
    best = revenue.withColumn("mx", F.max("total_rev").over(w)).filter(
        F.col("total_rev") == F.col("mx")
    )
    return (
        best.join(F.broadcast(s), best.l_suppkey == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            _money(F.col("total_rev")).alias("total_revenue"),
        )
    )


@query(
    "pipeline_tpch_q16",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT ps.l_suppkey) AS supplier_cnt
    FROM ps JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#3'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 9, 15, 23, 36, 45, 49)
      AND ps.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def pipeline_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts/supplier relationship (TPC-H Q16 adapted: partsupp := the
    distinct (l_partkey, l_suppkey) pairs from lineitem; the excluded-
    supplier complaint filter is s_acctbal < 0). The NOT IN over a
    null-free key column compiles to a left-anti join shipping only
    supplier keys; part is a broadcast dim filtered before the join;
    COUNT(DISTINCT) expands to a two-phase exact distinct aggregate."""
    ps = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 15, 23, 36, 45, 49)
    )
    bad = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        ps.join(bad, ps.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "pipeline_tpch_q17",
    oracle="""
    WITH pa AS (
      SELECT l_partkey,
             SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sq,
             COUNT(*) AS cnt
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) / 7.0, 2)
                AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pa ON pa.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3'
      AND CAST(l.l_quantity AS DECIMAL(18,4)) * 2 * pa.cnt < pa.sq
    """,
)
def pipeline_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (TPC-H Q17 adapted: no container
    column; threshold 0.5×avg instead of 0.2×avg so rows survive at
    sf0.01). The correlated per-part AVG becomes a self-aggregation
    re-joined on l_partkey — it shares the join's hash partitioning, so
    lineitem shuffles once. The "qty < 0.5*avg" test is cross-multiplied
    into exact decimal arithmetic (2*qty*cnt < sum) so no row membership
    flips on a float ulp."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    pa = li.groupBy(F.col("l_partkey").alias("pa_key")).agg(
        _dsum(F.col("l_quantity")).alias("sq"), F.count("*").alias("cnt")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(pa, li.l_partkey == F.col("pa_key"))
        .filter(
            F.col("l_quantity").cast("decimal(18,4)") * 2 * F.col("cnt")
            < F.col("sq")
        )
        .agg(
            F.round(_dsum(F.col("l_extendedprice")) / 7.0, 2)
            .cast("double")
            .alias("avg_yearly")
        )
    )


@query(
    "pipeline_tpch_q20",
    oracle="""
    WITH qty AS (
      SELECT l_suppkey, l_partkey,
             SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sq
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l_suppkey, l_partkey
    ),
    heavy AS (
      SELECT DISTINCT q.l_suppkey
      FROM qty q JOIN part p ON p.p_partkey = q.l_partkey
      WHERE p.p_name LIKE '%bolt%' AND q.sq > 30
    )
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN heavy h ON h.l_suppkey = s.s_suppkey
    WHERE n.n_name = 'NATION_7'
    """,
)
def pipeline_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Potential part promotion (TPC-H Q20 adapted: no ps_availqty —
    "excess stock" is having shipped >30 units of a matching part in
    the year). Two nested IN subqueries become a chain of semi joins;
    the per-(supplier, part) quantity rollup is the only fact shuffle,
    and the threshold test is exact decimal. The original LIKE '%1%'
    predicate was vacuous — the fixture's word-pair p_names never
    contain a digit, so 0 parts matched at every scale factor and the
    semi-join chain was never attested on a real row (same digit bug
    the round-8 verdict caught in q9); '%bolt%' selects ~1/6 of parts
    and sq > 30 keeps a nonempty heavy-supplier set from sf0.01 up."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    qty = li.groupBy("l_suppkey", "l_partkey").agg(
        _dsum(F.col("l_quantity")).alias("sq")
    )
    heavy = (
        qty.join(F.broadcast(p), qty.l_partkey == p.p_partkey)
        .filter(F.col("sq") > 30)
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


@query(
    "pipeline_tpch_q21",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'F'
      AND n.n_name = 'NATION_2'
      AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    """,
)
def pipeline_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who kept orders waiting (TPC-H Q21 adapted: no
    receipt/commit dates — "late" is returnflag R; NATION_2 plays SAUDI
    ARABIA). The correlated EXISTS / NOT EXISTS with an inequality
    correlate become compound-condition left-semi / left-anti self-joins
    on lineitem: both ship only (l_orderkey, l_suppkey) pairs, join on
    the same l_orderkey partitioning, and never widen the fact rows —
    the canonical way to express "the only supplier who failed" at
    100 TB without a window over the whole order."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")

    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .alias("l3")
    )
    has_other = l1.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    )
    sole_failer = has_other.join(
        l3,
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
        "left_anti",
    )
    return (
        sole_failer.join(o, F.col("l1.l_orderkey") == o.o_orderkey)
        .join(
            F.broadcast(s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)),
            F.col("l1.l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )
