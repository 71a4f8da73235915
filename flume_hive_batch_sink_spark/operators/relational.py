"""2.B projections/filters/joins + 2.E sorts/limits/set operations.

All pure Catalyst surface — the engine's job here is to express each
operator declaratively and let the optimizer pick the physical strategy
(broadcast vs shuffle joins, TakeOrderedAndProject for top-k, partial
aggregation for distincts). Scale notes are per-operator docstrings.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flume_hive_batch_sink_spark.io import load
from flume_hive_batch_sink_spark.registry import query

# ---------------------------------------------------------------- projections


@query(
    "proj_select_alias",
    oracle="""
    SELECT c_custkey AS custkey, upper(c_name) AS name_uc,
           ROUND(c_acctbal * 1.1, 4) AS boosted_bal, c_mktsegment AS segment
    FROM customer
    """,
)
def proj_select_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"),
        F.upper("c_name").alias("name_uc"),
        F.round(F.col("c_acctbal") * 1.1, 4).alias("boosted_bal"),
        F.col("c_mktsegment").alias("segment"),
    )


@query(
    "filter_compound",
    oracle="""
    SELECT event_id, event_type, value FROM events
    WHERE ((event_type IN ('view', 'click') AND value BETWEEN 10 AND 300)
           OR (event_type = 'error' AND props LIKE '%7%'))
      AND user_id IS NOT NULL
    """,
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """σ with AND/OR/NOT, BETWEEN, IN, LIKE, IS NULL — all pushed into the
    parquet scan by Catalyst (verify with .explain: PushedFilters)."""
    ev = load(spark, sf_dir, "events")
    return ev.filter(
        (
            (F.col("event_type").isin("view", "click") & F.col("value").between(10, 300))
            | ((F.col("event_type") == "error") & F.col("props").like("%7%"))
        )
        & F.col("user_id").isNotNull()
    ).select("event_id", "event_type", "value")


@query(
    "filter_null_safe",
    oracle="""
    SELECT o_orderkey, o_orderstatus FROM orders
    WHERE NULLIF(o_orderstatus, 'O') IS NOT DISTINCT FROM NULLIF(o_orderstatus, 'F')
    """,
)
def filter_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality (`<=>`) over derived nullable columns."""
    o = load(spark, sf_dir, "orders")
    a = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    b = F.nullif(F.col("o_orderstatus"), F.lit("F"))
    return o.filter(a.eqNullSafe(b)).select("o_orderkey", "o_orderstatus")


# --------------------------------------------------------------------- joins


@query(
    "join_inner",
    oracle="""
    SELECT o_orderkey, c_name, ROUND(o_totalprice, 2) AS total
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join; Catalyst picks broadcast-hash (customer is small
    relative to orders) or SMJ at scale — never specified by hand here."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_name", F.round("o_totalprice", 2).alias("total")
    )


@query(
    "join_left",
    oracle="""
    SELECT c_custkey, o_orderkey
    FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 150000) o
      ON c_custkey = o_custkey
    """,
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "o_orderkey"
    )


@query(
    "join_right",
    oracle="""
    SELECT c_custkey, o_orderkey
    FROM (SELECT * FROM customer WHERE c_acctbal > 5000) c
    RIGHT JOIN orders o ON c_custkey = o_custkey
    """,
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000)
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "right").select(
        "c_custkey", "o_orderkey"
    )


@query(
    "join_full",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey
    FROM (SELECT * FROM customer WHERE c_acctbal > 7000) c
    FULL JOIN (SELECT * FROM orders WHERE o_totalprice > 200000) o
      ON c.c_custkey = o.o_custkey
    """,
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 7000)
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return c.join(o, c.c_custkey == o.o_custkey, "full").select(
        "c_custkey", "o_orderkey"
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence join — left_semi never duplicates or widens the left side,
    so it's strictly cheaper than join+distinct at scale."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1997-06-01')
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: lapsed customers (no order since mid-1997). The
    date bound is load-bearing for attestation, not just flavor: with
    unbounded orders every customer in the fixture has ordered at
    least once, so the difference was empty at sf0.01 and the anti
    semantics were only ever attested on 0 = 0 rows there (round-8
    verdict). The filter is pushed below the join, so only the
    recent slice of orders ships to the shuffle."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "1997-06-01"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_broadcast",
    oracle="""
    SELECT n_name, r_name, count(*) AS n_suppliers
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY n_name, r_name
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast of the dimension tables: at 100 TB the fact side
    never shuffles for a dim join — the dims ship to every executor."""
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(F.count("*").alias("n_suppliers"))
    )


@query(
    "join_theta_range",
    oracle="""
    SELECT e.event_id, s.event_id AS signup_id
    FROM events e
    JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      ON e.user_id = s.user_id
     AND e.event_id <> s.event_id
     AND e.ts >= s.ts AND e.ts <= s.ts + INTERVAL 1 HOUR
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi range join. The equi part (user_id) keys the shuffle; the
    range predicate is applied as a post-join filter, so this stays a hash
    or sort-merge join — not a cartesian product — at any scale."""
    ev = load(spark, sf_dir, "events")
    e = ev.alias("e")
    s = ev.filter(F.col("event_type") == "signup").alias("s")
    cond = (
        (F.col("e.user_id") == F.col("s.user_id"))
        & (F.col("e.event_id") != F.col("s.event_id"))
        & (F.col("e.ts") >= F.col("s.ts"))
        & (F.col("e.ts") <= F.col("s.ts") + F.expr("INTERVAL 1 HOUR"))
    )
    return e.join(s, cond).select(
        F.col("e.event_id").alias("event_id"),
        F.col("s.event_id").alias("signup_id"),
    )


@query(
    "join_cross",
    oracle="SELECT r_name, n_name FROM region CROSS JOIN nation",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian — only ever used dim×dim; both sides broadcastable."""
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@query(
    "join_asof",
    oracle="""
    WITH sign AS (
      SELECT user_id, ts, event_id AS sid FROM events WHERE event_type = 'signup'
    ), u AS (
      SELECT user_id, ts, event_id, CAST(NULL AS BIGINT) AS sid, 1 AS m FROM events
      UNION ALL
      SELECT user_id, ts, CAST(NULL AS BIGINT) AS event_id, sid, 0 AS m FROM sign
    ), lv AS (
      SELECT event_id, m,
             last_value(sid IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, m, sid NULLS LAST
                     ROWS UNBOUNDED PRECEDING) AS signup_id
      FROM u
    )
    SELECT event_id, signup_id FROM lv WHERE m = 1
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event ↔ latest signup of the same user at-or-before
    its timestamp.

    Spark has no native ASOF JOIN; the union+window formulation is the
    scalable one — a single shuffle on user_id and a running `last(…,
    ignorenulls)`, versus the O(n·m) range-join + row_number alternative.
    Signup rows sort before event rows at equal ts (m 0<1); ties among
    simultaneous signups resolve to the highest event_id.
    """
    ev = load(spark, sf_dir, "events")
    left = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.lit(None).cast("long").alias("sid"),
        F.lit(1).alias("m"),
    )
    right = (
        ev.filter(F.col("event_type") == "signup")
        .select(
            "user_id",
            "ts",
            F.lit(None).cast("long").alias("event_id"),
            F.col("event_id").alias("sid"),
            F.lit(0).alias("m"),
        )
    )
    u = left.unionByName(right)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("m"), F.col("sid").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        u.withColumn("signup_id", F.last("sid", ignorenulls=True).over(w))
        .filter(F.col("m") == 1)
        .select("event_id", "signup_id")
    )


@query(
    "join_multiway",
    oracle="""
    SELECT r_name, n_name, count(*) AS n_orders,
           ROUND(sum(o_totalprice), 2) AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: one fact, chained broadcast dims — zero fact shuffles
    until the final aggregation."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


# ------------------------------------------------------- sorts, limits, sets


@query(
    "sort_multi",
    oracle="""
    SELECT c_custkey,
           CAST(row_number() OVER (
             ORDER BY (CASE WHEN c_mktsegment = 'BUILDING' THEN NULL
                            ELSE c_acctbal END) DESC NULLS LAST,
                      c_custkey ASC) AS BIGINT) AS rank_pos
    FROM customer
    """,
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit null placement. The driver's hash is
    order-insensitive, so the sort order is materialized as a row_number
    column (FIXTURES.md oracle rules). Global sort = range-partitioned
    TakeOrdered at scale; here it feeds a single window."""
    c = load(spark, sf_dir, "customer")
    nullable_key = F.when(F.col("c_mktsegment") == "BUILDING", F.lit(None)).otherwise(
        F.col("c_acctbal")
    )
    w = Window.orderBy(nullable_key.desc_nulls_last(), F.col("c_custkey").asc())
    return c.select(
        "c_custkey", F.row_number().over(w).cast("long").alias("rank_pos")
    )


@query(
    "limit_topk",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS total
    FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50
    """,
)
def limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: orderBy+limit compiles to TakeOrderedAndProject —
    per-partition heaps + driver merge of k rows, never a full sort."""
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(50)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("total"))
    )


@query(
    "set_union_all",
    oracle="""
    SELECT event_id, event_type FROM events WHERE event_type = 'view'
    UNION ALL
    SELECT event_id, event_type FROM events WHERE value > 400
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union — no shuffle at all, just concatenated partitions."""
    ev = load(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "view").select("event_id", "event_type")
    b = ev.filter(F.col("value") > 400).select("event_id", "event_type")
    return a.unionByName(b)


@query(
    "set_union_distinct",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    UNION
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select("user_id")
    b = ev.filter(F.col("event_type") == "error").select("user_id")
    return a.union(b).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'click'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select("user_id")
    b = ev.filter(F.col("event_type") == "click").select("user_id")
    return a.intersect(b)


@query(
    "set_except",
    oracle="""
    SELECT user_id, strftime(ts, '%Y-%m-%d') AS dt
    FROM events WHERE event_type = 'view'
    EXCEPT
    SELECT user_id, strftime(ts, '%Y-%m-%d') AS dt
    FROM events WHERE event_type = 'purchase'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set difference with dedup) on the (user_id, day) grain:
    view-days with no purchase by the same user that day. The earlier
    user-only grain was vacuous in this fixture — every viewer also
    purchases at least once across the whole history, so the
    difference was empty at every scale factor and the operator was
    never attested on a real row (round-8 verdict); day-scoping makes
    the difference nonempty at every sf while keeping the same
    EXCEPT-as-shuffle-dedup-plus-anti-join physical shape."""
    ev = load(spark, sf_dir, "events")
    day = F.date_format("ts", "yyyy-MM-dd").alias("dt")
    a = ev.filter(F.col("event_type") == "view").select("user_id", day)
    b = ev.filter(F.col("event_type") == "purchase").select("user_id", day)
    return a.subtract(b)


@query(
    "join_skew_salted",
    oracle="""
    WITH d AS (
      SELECT event_type,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS type_total
      FROM events GROUP BY event_type
    )
    SELECT e.event_type, count(*) AS n,
           CAST(ROUND(SUM(CAST(e.value AS DECIMAL(18,4))
                          + CAST(d.type_total AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS blended
    FROM events e JOIN d ON e.event_type = d.event_type
    GROUP BY e.event_type
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant equi join via key salting: the probe side's join
    key has only 5 distinct values, so an unsalted shuffle join puts
    ~1/5 of the fact table on ONE reducer. Salting appends pmod(row-id,
    16) to the probe key and explodes the build side 16× with every
    salt, turning each hot key into 16 evenly-sized reducer partitions.
    Here the build side is small enough to broadcast (which is the
    right fix when possible — see join_broadcast); the salted shape is
    forced with a shuffle_hash hint because it is the pattern for
    fact⋈fact skew where neither side fits in memory. AQE's
    skewedJoin optimization automates the same split at runtime; the
    explicit version works on any Spark and under any partitioning.
    """
    ev = load(spark, sf_dir, "events")
    # Decimal accumulation end-to-end: at sf1 these are 200k-term sums
    # of ~1e12 magnitude, where double summation is partial-sum-order
    # dependent past the rounding decimals; decimal sums are exact and
    # the final scale-2 → double cast is exact in both engines.
    dim = ev.groupBy("event_type").agg(
        F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("type_total")
    )
    n_salt = 16
    fact = ev.withColumn("salt", F.pmod(F.col("event_id"), F.lit(n_salt)))
    dim_rep = dim.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).withColumnRenamed("event_type", "d_event_type")
    joined = fact.join(
        dim_rep.hint("shuffle_hash"),
        (fact.event_type == dim_rep.d_event_type)
        & (fact.salt == dim_rep.salt),
    )
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(
            F.sum(
                F.col("value").cast("decimal(18,4)")
                + F.col("type_total").cast("decimal(18,2)")
            ),
            2,
        )
        .cast("double")
        .alias("blended"),
    )


# Bucketed-table build ledger: (applicationId, table, table) → source
# fingerprint. Lets join_bucketed_colocated skip the saveAsTable pair when
# this session already built them from identical source files.
_BUCKETED_READY: dict[tuple, str] = {}


@query(
    "join_bucketed_colocated",
    oracle="""
    SELECT c.c_mktsegment,
           count(*) AS n_orders, ROUND(sum(o.o_totalprice), 2) AS total
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free fact⋈fact join via bucketing: both tables are written
    bucketed by the join key (8 buckets, sorted), so the join's required
    distribution is already satisfied on disk and the plan has NO
    Exchange before the join (asserted in tests/test_plans.py). This is
    the 100 TB pattern for repeated fact⋈fact joins: pay the
    partitioning once at write time, never at read time. Broadcast is
    disabled for this query so the co-location (not a broadcast) is what
    eliminates the shuffle.

    Pay-once is enforced ACROSS calls, not just within one: the write is
    skipped when this session already built the bucketed tables from the
    same source files (fingerprint = path + mtime + size of both source
    parquet files — a rewritten fixture rebuilds, a repeat query reuses;
    tests/test_plans.py asserts call 2 leaves the table files untouched).
    """
    out = bucketed_join_plan(spark, sf_dir)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # Materialize ONCE under the no-broadcast conf and return the
        # local rows (the etl.py dynamic-partition-overwrite idiom): the
        # attested result is the one produced by the demonstrated
        # shuffle-free sort-merge plan, not a re-execution after the
        # finally block restored broadcasting. ~5 mktsegment rows — NOT
        # a data-sized collect. The plan gate (tests/test_plans.py)
        # inspects bucketed_join_plan directly under its own conf.
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def ensure_bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple:
    """Build (or reuse) the session's bucketed orders/customer tables for
    ``sf_dir``; returns their names. Pay-once across calls via the
    source-file fingerprint cache."""
    import hashlib
    import shutil
    from urllib.parse import urlparse

    # sf-scoped table names: alternating scale factors in one session must
    # not clobber each other's bucketed tables (basename for readability,
    # path hash for uniqueness across dirs with the same basename).
    tag = "{}_{}".format(
        "".join(c if c.isalnum() else "_" for c in os.path.basename(sf_dir.rstrip("/"))),
        hashlib.md5(sf_dir.encode()).hexdigest()[:6],
    )
    ob, cb = f"bkt_orders_{tag}", f"bkt_customer_{tag}"

    def _src_fingerprint() -> str:
        parts = []
        for t in ("orders", "customer"):
            try:
                st = os.stat(os.path.join(sf_dir, f"{t}.parquet"))
                parts.append(f"{t}:{st.st_mtime_ns}:{st.st_size}")
            except OSError:
                parts.append(f"{t}:missing")
        return "|".join(parts)

    fp = _src_fingerprint()
    cache_key = (spark.sparkContext.applicationId, ob, cb)
    already_built = (
        _BUCKETED_READY.get(cache_key) == fp
        and spark.catalog.tableExists(ob)
        and spark.catalog.tableExists(cb)
    )
    if not already_built:
        warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        for tbl in (ob, cb):
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
            # a fresh session's in-memory catalog forgets managed tables but
            # their directories survive on disk; clear them or saveAsTable
            # fails with LOCATION_ALREADY_EXISTS
            shutil.rmtree(os.path.join(warehouse, tbl), ignore_errors=True)
        (
            load(spark, sf_dir, "orders")
            .write.bucketBy(8, "o_custkey")
            .sortBy("o_custkey")
            .mode("overwrite")
            .saveAsTable(ob)
        )
        (
            load(spark, sf_dir, "customer")
            .write.bucketBy(8, "c_custkey")
            .sortBy("c_custkey")
            .mode("overwrite")
            .saveAsTable(cb)
        )
        _BUCKETED_READY[cache_key] = fp
    return ob, cb


def bucketed_join_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lazy bucketed fact⋈fact plan over the session's bucketed
    tables (building them if needed) — exposed so the plan gate can
    assert SortMergeJoin-with-no-Exchange under its own broadcast conf
    without the double execution the registered key used to pay."""
    ob, cb = ensure_bucketed_tables(spark, sf_dir)
    o, c = spark.table(ob), spark.table(cb)
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@query(
    "filter_not_in_null_semantics",
    oracle="""
    SELECT
      CAST((SELECT COUNT(*) FROM orders
            WHERE o_custkey NOT IN (SELECT c_custkey FROM customer
                                    WHERE c_acctbal < 0)) AS BIGINT)
        AS not_in_nonnull,
      CAST((SELECT COUNT(*) FROM orders
            WHERE o_custkey NOT IN (SELECT CASE WHEN c_acctbal < -999.0
                                                THEN NULL ELSE c_custkey END
                                    FROM customer WHERE c_acctbal < 0)) AS BIGINT)
        AS not_in_with_null,
      CAST((SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_acctbal < 0
                                AND (CASE WHEN c.c_acctbal < -999.0 THEN NULL
                                          ELSE c.c_custkey END) = o.o_custkey))
           AS BIGINT) AS not_exists_with_null
    """,
)
def filter_not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic three-valued-logic trap, demonstrated and pinned:
    ``NOT IN (subquery)`` under SQL semantics returns UNKNOWN (i.e., no
    row) for EVERY row as soon as the subquery yields a single NULL,
    while ``NOT EXISTS`` with an equality predicate simply never matches
    the NULL and keeps the expected rows. The key computes all three
    counts — NOT IN over a null-free list, NOT IN over the same list
    with an injected NULL (collapses toward 0 asymmetrically), and the
    NOT EXISTS rewrite (unaffected) — and both engines must agree
    exactly. At scale this is also the plan difference between a
    null-aware anti join (expensive: Spark must broadcast the whole
    build side for NULL checking) and a plain LeftAnti — the reason
    production SQL style guides ban NOT IN on nullable columns."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") < 0)
    nonnull_keys = cust.select(F.col("c_custkey").alias("k"))
    withnull_keys = cust.select(
        F.when(F.col("c_acctbal") < -999.0, None)
        .otherwise(F.col("c_custkey"))
        .alias("k")
    )
    orders.createOrReplaceTempView("_nin_orders")
    nonnull_keys.createOrReplaceTempView("_nin_keys_nonnull")
    withnull_keys.createOrReplaceTempView("_nin_keys_withnull")
    # NOT IN must go through SQL so Spark plans its null-aware anti
    # join. All three counts are scalar subqueries in ONE returned
    # plan — no driver-side .collect() roundtrip re-entering via
    # createDataFrame (r10 verdict #6); Spark executes each subquery
    # as its own stage and stitches the 1-row projection.
    return spark.sql(
        """
        SELECT
          (SELECT COUNT(*) FROM _nin_orders
           WHERE o_custkey NOT IN (SELECT k FROM _nin_keys_nonnull))
            AS not_in_nonnull,
          (SELECT COUNT(*) FROM _nin_orders
           WHERE o_custkey NOT IN (SELECT k FROM _nin_keys_withnull))
            AS not_in_with_null,
          (SELECT COUNT(*) FROM _nin_orders o
           WHERE NOT EXISTS (SELECT 1 FROM _nin_keys_withnull w
                             WHERE w.k = o.o_custkey))
            AS not_exists_with_null
        """
    )


@query(
    "join_range_pointin",
    oracle="""
    WITH ranked AS (
      SELECT event_type, strftime(ts, '%Y-%m-%d') AS dt, ts,
             row_number() OVER (
               PARTITION BY event_type, strftime(ts, '%Y-%m-%d')
               ORDER BY ts, event_id) AS rn,
             count(*) OVER (
               PARTITION BY event_type, strftime(ts, '%Y-%m-%d')) AS n
      FROM events
    ), bursts AS (
      SELECT event_type AS burst_type, dt,
             MIN(CASE WHEN rn = (n + 3) // 4 THEN ts END) AS lo,
             MIN(CASE WHEN rn = (3 * n + 3) // 4 THEN ts END) AS hi
      FROM ranked GROUP BY event_type, dt
    )
    SELECT b.burst_type, b.dt,
           CAST(count(*) AS BIGINT) AS n_in_burst,
           CAST(date_diff('second', b.lo, b.hi) AS BIGINT) AS burst_len_s
    FROM events e
    JOIN bursts b
      ON strftime(e.ts, '%Y-%m-%d') = b.dt
     AND e.ts >= b.lo AND e.ts <= b.hi
     AND e.event_type <> b.burst_type
    GROUP BY b.burst_type, b.dt, b.lo, b.hi
    """,
)
def join_range_pointin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join against a derived interval
    dimension: each (event_type, day) contributes one 'burst' window
    [rank-25% ts, rank-75% ts], and the fact side counts OTHER types'
    events landing inside it (the 'what happened during the incident
    window' telemetry query). The interval dim is tiny (types x days)
    and BROADCAST, so the range join is one map-only pass over the
    fact table with the band as residual — the right plan whenever
    intervals are few and points are many; the dt equi-key additionally
    partition-prunes on a date-partitioned table. Interval bounds are
    RANK-SELECTED (integer (n+3) div 4 — no percentile interpolation),
    so boundary membership is integer-exact across engines."""
    ev = load(spark, sf_dir, "events").withColumn(
        "dt", F.date_format("ts", "yyyy-MM-dd")
    )
    w = Window.partitionBy("event_type", "dt").orderBy("ts", "event_id")
    wc = Window.partitionBy("event_type", "dt")
    ranked = ev.select(
        "event_type",
        "dt",
        "ts",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wc).alias("n"),
    )
    bursts = ranked.groupBy(
        F.col("event_type").alias("burst_type"), F.col("dt").alias("bdt")
    ).agg(
        F.min(
            F.when(F.col("rn") == F.expr("(n + 3) div 4"), F.col("ts"))
        ).alias("lo"),
        F.min(
            F.when(F.col("rn") == F.expr("(3 * n + 3) div 4"), F.col("ts"))
        ).alias("hi"),
    )
    j = ev.join(
        F.broadcast(bursts),
        (F.col("dt") == F.col("bdt"))
        & (F.col("ts") >= F.col("lo"))
        & (F.col("ts") <= F.col("hi"))
        & (F.col("event_type") != F.col("burst_type")),
    )
    return j.groupBy("burst_type", "bdt", "lo", "hi").agg(
        F.count("*").alias("n_in_burst")
    ).select(
        "burst_type",
        F.col("bdt").alias("dt"),
        "n_in_burst",
        (F.unix_timestamp("hi") - F.unix_timestamp("lo")).alias("burst_len_s"),
    )


@query(
    "join_temporal_validity",
    oracle="""
    WITH dim AS (
      SELECT user_id, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to,
             event_id AS version_id, ROUND(value, 2) AS version_value
      FROM events WHERE event_type = 'signup'
    ), fact AS (
      SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
      FROM events WHERE event_type = 'purchase'
    )
    SELECT f.purchase_id, f.user_id, f.purchase_ts,
           d.version_id, d.valid_from, d.version_value
    FROM fact f
    LEFT JOIN dim d
      ON f.user_id = d.user_id
     AND f.purchase_ts >= d.valid_from
     AND (d.valid_to IS NULL OR f.purchase_ts < d.valid_to)
    """,
)
def join_temporal_validity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal-validity (bitemporal point-in-version) join: each fact
    row picks the SCD2 dimension version whose [valid_from, valid_to)
    interval covers the fact timestamp — the join every star schema
    with type-2 history runs on every query. Because validity intervals
    PARTITION each key's timeline (built by etl_scd2_history's lead()
    construction), the band predicate matches at most one version per
    fact — no dedup pass needed. Plan: equi join on user_id with the
    interval residual; at 100 TB both sides bucket by the key and the
    dim is usually small enough to broadcast. Facts predating the
    first version surface with NULL version columns (audit rows), not
    silently dropped."""
    ev = load(spark, sf_dir, "events")
    dim = ev.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("d_user_id"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ).alias("valid_to"),
        F.col("event_id").alias("version_id"),
        F.round("value", 2).alias("version_value"),
    )
    fact = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    j = fact.join(
        dim,
        (F.col("user_id") == F.col("d_user_id"))
        & (F.col("purchase_ts") >= F.col("valid_from"))
        & (
            F.col("valid_to").isNull()
            | (F.col("purchase_ts") < F.col("valid_to"))
        ),
        "left",
    )
    return j.select(
        "purchase_id",
        "user_id",
        "purchase_ts",
        "version_id",
        "valid_from",
        "version_value",
    )


@query(
    "join_fuzzy_levenshtein",
    oracle="""
    WITH dirty AS (
      SELECT c_custkey AS d_key,
             substr(c_name, 1, CAST(c_custkey % length(c_name) AS INT))
             || substr(c_name,
                       CAST(c_custkey % length(c_name) AS INT) + 2) AS d_name,
             c_custkey % 4096 AS blk
      FROM customer
    ), clean AS (
      SELECT c_custkey, c_name, c_custkey % 4096 AS blk FROM customer
    )
    SELECT c.c_custkey, c.c_name, d.d_key, d.d_name,
           CAST(levenshtein(c.c_name, d.d_name) AS INT) AS dist
    FROM clean c JOIN dirty d
      ON c.blk = d.blk AND levenshtein(c.c_name, d.d_name) <= 1
    """,
)
def join_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy (entity-resolution) join: a 'dirty' copy of the
    customer names (one deterministically-dropped character) is matched
    back to the clean table by edit distance <= 1 WITHIN blocking
    buckets. The blocking key is what makes this scale: levenshtein is
    O(|s|^2) per pair, so the equi-join on the block key bounds the
    candidate pairs at sum(|block|^2) instead of n^2 — the same
    gate-the-quadratic-kernel pattern as LSH bands and IVF lists
    (production blocking keys come from phonetics/sorted-neighborhood;
    the mod-4096 key here stands in — sized so blocks stay O(10) rows
    at sf1: block count must GROW with the data or per-block work
    reverts to quadratic, the first thing to re-derive at 100 TB). Spark plans the equi key as a hash
    join with the distance as residual; both engines agree exactly on
    levenshtein (identical unit-cost DP)."""
    c = load(spark, sf_dir, "customer")
    dirty = c.select(
        F.col("c_custkey").alias("d_key"),
        F.concat(
            F.expr("substr(c_name, 1, CAST(c_custkey % length(c_name) AS INT))"),
            F.expr(
                "substr(c_name, CAST(c_custkey % length(c_name) AS INT) + 2)"
            ),
        ).alias("d_name"),
        (F.col("c_custkey") % 4096).alias("blk"),
    )
    clean = c.select(
        "c_custkey", "c_name", (F.col("c_custkey") % 4096).alias("blk")
    )
    j = clean.join(
        dirty,
        (clean.blk == dirty.blk)
        & (F.levenshtein("c_name", "d_name") <= 1),
    )
    return j.select(
        "c_custkey",
        "c_name",
        "d_key",
        "d_name",
        F.levenshtein("c_name", "d_name").cast("int").alias("dist"),
    )


@query(
    "sql_text_api_cte",
    oracle="""
    WITH dau AS (
      SELECT strftime(ts, '%Y-%m-%d') AS dt,
             CAST(count(DISTINCT user_id) AS BIGINT) AS active_users
      FROM events GROUP BY 1
    ), buyers AS (
      SELECT strftime(ts, '%Y-%m-%d') AS dt,
             CAST(count(DISTINCT user_id) AS BIGINT) AS buying_users
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT d.dt, d.active_users,
           coalesce(b.buying_users, 0) AS buying_users,
           CAST(ROUND(coalesce(b.buying_users, 0)
                      / CAST(d.active_users AS DOUBLE), 4) AS DOUBLE)
             AS conversion
    FROM dau d LEFT JOIN buyers b ON d.dt = b.dt
    """,
)
def sql_text_api_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-TEXT entry point: the same engine surface exercised as
    `spark.sql()` over registered temp views (CTEs, DISTINCT
    aggregates, left join, expression projection) rather than the
    DataFrame builder — the interface a BI tool or migration from
    HiveQL actually uses. Catalyst compiles both surfaces to the same
    plans, and this key pins that equivalence under the value-hash
    contract. The view registration is per-session catalog metadata
    (no data movement); the query itself is two count-distinct aggs +
    a small join on the day key."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events_sqlv")
    return spark.sql("""
        WITH dau AS (
          SELECT date_format(ts, 'yyyy-MM-dd') AS dt,
                 count(DISTINCT user_id) AS active_users
          FROM events_sqlv GROUP BY 1
        ), buyers AS (
          SELECT date_format(ts, 'yyyy-MM-dd') AS dt,
                 count(DISTINCT user_id) AS buying_users
          FROM events_sqlv WHERE event_type = 'purchase' GROUP BY 1
        )
        SELECT d.dt, d.active_users,
               coalesce(b.buying_users, 0L) AS buying_users,
               CAST(ROUND(coalesce(b.buying_users, 0L)
                          / CAST(d.active_users AS DOUBLE), 4) AS DOUBLE)
                 AS conversion
        FROM dau d LEFT JOIN buyers b ON d.dt = b.dt
    """)


@query(
    "join_null_safe",
    oracle="""
    WITH l AS (
      SELECT event_id,
             CASE WHEN event_id % 5 = 0 THEN NULL
                  ELSE user_id % 50 END AS k
      FROM events WHERE event_type = 'purchase'
    ), r AS (
      SELECT CASE WHEN n % 7 = 0 THEN NULL ELSE n END AS k,
             CAST(n AS BIGINT) AS tag
      FROM (SELECT unnest(range(50)) AS n)
    ), plain AS (
      SELECT CAST(count(*) AS BIGINT) AS n FROM l JOIN r ON l.k = r.k
    ), nullsafe AS (
      SELECT CAST(count(*) AS BIGINT) AS n
      FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
    ), null_l AS (
      SELECT CAST(count(*) AS BIGINT) AS n FROM l WHERE k IS NULL
    ), null_r AS (
      SELECT CAST(count(*) AS BIGINT) AS n FROM r WHERE k IS NULL
    )
    SELECT (SELECT n FROM plain) AS n_plain_matches,
           (SELECT n FROM nullsafe) AS n_nullsafe_matches,
           (SELECT n FROM null_l) AS n_null_left,
           (SELECT n FROM null_r) AS n_null_right,
           (SELECT n FROM nullsafe) - (SELECT n FROM plain)
             = (SELECT n FROM null_l) * (SELECT n FROM null_r)
             AS delta_is_null_cross
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM) vs plain
    `=` — the three-valued-logic JOIN trap (the join-side sibling of
    filter_null_safe and filter_not_in_null_semantics): plain equality
    silently DROPS every null-keyed row, while <=> matches null to
    null. The result pins both match counts and certifies the
    difference equals |null-left| x |null-right| — exactly the rows
    `=` discards. Planner note for 100 TB: Spark compiles `<=>` into
    a hash join (null becomes an ordinary key value), so null-safe
    semantics cost nothing extra — but a SKEWED null population then
    hashes to ONE reducer; production pipelines route the null slice
    separately (the same salting decision dq_skew_audit informs)."""
    ev = load(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        F.when(F.col("event_id") % 5 == 0, F.lit(None)).otherwise(
            F.col("user_id") % 50
        ).alias("k"),
    )
    right = spark.range(50).select(
        F.when(F.col("id") % 7 == 0, F.lit(None)).otherwise(
            F.col("id")
        ).alias("rk"),
        F.col("id").alias("tag"),
    )
    n_plain = left.join(
        F.broadcast(right), left.k == right.rk
    ).count()
    n_nullsafe = left.join(
        F.broadcast(right), left.k.eqNullSafe(right.rk)
    ).count()
    n_null_l = left.filter(F.col("k").isNull()).count()
    n_null_r = right.filter(F.col("rk").isNull()).count()
    return spark.createDataFrame(
        [
            (
                n_plain,
                n_nullsafe,
                n_null_l,
                n_null_r,
                n_nullsafe - n_plain == n_null_l * n_null_r,
            )
        ],
        "n_plain_matches BIGINT, n_nullsafe_matches BIGINT, "
        "n_null_left BIGINT, n_null_right BIGINT, "
        "delta_is_null_cross BOOLEAN",
    )


@query(
    "join_spatial_grid",
    oracle="""
    WITH pts AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 101 = 0
                  THEN 10 + (c_custkey % 100) / 250.0
                  ELSE -60 + (c_custkey * 37 % 120) + (c_custkey % 100) / 100.0
             END AS lat,
             CASE WHEN c_custkey % 101 = 0
                  THEN 20 + (c_custkey % 97) / 194.0
                  ELSE -170 + (c_custkey * 53 % 340) + (c_custkey % 97) / 97.0
             END AS lon
      FROM customer
    ),
    pairs AS (
      SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
             sin(radians(b.lat - a.lat) / 2) * sin(radians(b.lat - a.lat) / 2)
             + cos(radians(a.lat)) * cos(radians(b.lat))
               * sin(radians(b.lon - a.lon) / 2)
               * sin(radians(b.lon - a.lon) / 2) AS h
      FROM pts a JOIN pts b ON a.c_custkey < b.c_custkey
    )
    SELECT cust_a, cust_b,
           CAST(ROUND(12742.0 * asin(sqrt(h)), 2) AS DOUBLE) AS dist_km
    FROM pairs
    WHERE ROUND(6371.0 * 2 * asin(sqrt(h)), 9) < 100.0
    """,
)
def join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proximity self-join (all customer pairs within 100 km) via
    GRID BLOCKING — the spatial-join pattern that replaces the O(n²)
    cross product: each point lands in one 1°×1° cell; the probe side
    explodes into its 3×5 cell neighborhood (±1° lat covers 100 km
    everywhere; ±2° lon covers it up to the fixture's |lat| ≤ 61°,
    where 1° of longitude is ≥ 54 km) and equi-joins on the cell key,
    so candidates are only near-cell pairs; exact haversine verifies.
    Because each point OWNS exactly one cell and only the probe side
    explodes, every candidate pair arises exactly once — no distinct
    needed. This is the geohash/S2 pattern with the cell function laid
    bare; coordinates are the same deterministic synthesis as
    fn_geo_haversine (no geo columns ship in the fixture).

    The oracle is the O(n²) formulation — the certified claim is that
    blocking LOSES NOTHING within the radius. Scale: candidate count
    tracks local point density × 15 cells instead of n²; skewed cells
    (a city) are the known hotspot, handled like any skewed join key
    (salt or AQE). Round-before-compare on the radius predicate, repo
    convention."""
    c = load(spark, sf_dir, "customer")
    # every 101st customer lives in one dense "city" cell near
    # (10°, 20°) with sub-0.5° jitter (all intra-city pairs < 70 km);
    # the rest stay on the sparse global lattice. The city makes the
    # key non-vacuous at sf0.01 — the pure lattice's minimum pairwise
    # distance exceeds 100 km until sf0.1 density, so the blocking
    # join was attested only on 0 = 0 rows at the driver's gate scale
    # — and it IS the skewed hot cell the docstring warns about.
    is_hub = F.col("c_custkey") % 101 == 0
    pts = c.select(
        "c_custkey",
        F.when(is_hub, 10 + (F.col("c_custkey") % 100) / 250.0)
        .otherwise(
            -60
            + (F.col("c_custkey") * 37 % 120)
            + (F.col("c_custkey") % 100) / 100.0
        )
        .alias("lat"),
        F.when(is_hub, 20 + (F.col("c_custkey") % 97) / 194.0)
        .otherwise(
            -170
            + (F.col("c_custkey") * 53 % 340)
            + (F.col("c_custkey") % 97) / 97.0
        )
        .alias("lon"),
    )
    owner = pts.select(
        F.col("c_custkey").alias("cust_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        F.floor("lat").alias("cell_lat"),
        F.floor("lon").alias("cell_lon"),
    )
    probe = pts.select(
        F.col("c_custkey").alias("cust_a"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
        F.explode(
            F.expr(
                "flatten(transform(sequence(-1, 1), dla -> "
                "transform(sequence(-2, 2), dlo -> "
                "struct(CAST(floor(lat) + dla AS BIGINT) AS cl, "
                "CAST(floor(lon) + dlo AS BIGINT) AS co))))"
            )
        ).alias("cell"),
    )
    cand = probe.join(
        owner,
        (F.col("cell.cl") == F.col("cell_lat"))
        & (F.col("cell.co") == F.col("cell_lon"))
        & (F.col("cust_a") < F.col("cust_b")),
    )
    dlat2 = F.radians(F.col("lat_b") - F.col("lat_a")) / 2
    dlon2 = F.radians(F.col("lon_b") - F.col("lon_a")) / 2
    h = (
        F.sin(dlat2) * F.sin(dlat2)
        + F.cos(F.radians("lat_a"))
        * F.cos(F.radians("lat_b"))
        * F.sin(dlon2)
        * F.sin(dlon2)
    )
    scored = cand.withColumn("h", h)
    return scored.filter(
        F.round(F.lit(6371.0) * 2 * F.asin(F.sqrt("h")), 9) < 100.0
    ).select(
        "cust_a",
        "cust_b",
        F.round(F.lit(12742.0) * F.asin(F.sqrt("h")), 2).alias("dist_km"),
    )
