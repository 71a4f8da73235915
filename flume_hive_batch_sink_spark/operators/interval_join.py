"""Round-11 extension key: interval × interval overlap join.

The one temporal-join shape the r1–r10 surface lacked: both sides are
INTERVALS and the predicate is overlap (``a.lo <= b.hi AND b.lo <=
a.hi``). Siblings cover the neighboring shapes — ``join_range_pointin``
(point ∈ interval), ``join_temporal_validity`` (as-of validity),
``join_asof`` (nearest-earlier), ``join_spatial_grid`` (2-D grid
blocking) — this key closes the family with the calendar-bucket
blocking trick that makes interval overlap an EQUI join.

Registered registry-LAST (registry._TAIL_MODULES) so the
driver-sampling rotation prefix of earlier rounds stays stable.

Scale shape, not a nested-loop: both sides explode their interval into
the calendar months it covers, the join runs as a broadcast HASH join
on the month bucket (equi key!) with the overlap predicate as a
post-filter, and each overlapping pair survives in EXACTLY ONE bucket —
the month containing the overlap's start, ``greatest(a.lo, b.lo)``,
which by construction both intervals cover — so no distinct/dedup pass
is needed (the same one-canonical-cell trick join_spatial_grid uses in
2-D). The campaign side is a bounded dimension (mod-sample capped with
ORDER BY … LIMIT, like the PQ probe sets), so the broadcast is fixed
size at any corpus scale; for big×big interval joins the identical
bucket blocking works as a shuffle hash join on the bucket key, with
bucket grain chosen so per-bucket candidate products stay bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_hive_batch_sink_spark.io import load
from flume_hive_batch_sink_spark.registry import query

_N_CAMPAIGNS = 200

_INTERVAL_ORACLE = f"""
    WITH camp AS (
      SELECT o_orderkey AS campaign_id,
             CAST(o_orderdate AS DATE) AS c_lo,
             CAST(o_orderdate AS DATE)
               + CAST(5 + o_orderkey % 20 AS INT) AS c_hi
      FROM orders WHERE o_orderkey % 101 = 0
      ORDER BY o_orderkey LIMIT {_N_CAMPAIGNS}
    ), ship AS (
      SELECT l_orderkey, l_linenumber,
             CAST(l_shipdate AS DATE) AS s_lo,
             CAST(l_shipdate AS DATE)
               + CAST(1 + (l_orderkey + 7 * l_linenumber) % 14 AS INT)
               AS s_hi
      FROM lineitem
    )
    SELECT c.campaign_id,
           CAST(count(*) AS BIGINT) AS n_shipments,
           CAST(SUM(date_diff('day',
                    greatest(c.c_lo, s.s_lo),
                    least(c.c_hi, s.s_hi)) + 1) AS BIGINT)
             AS overlap_days
    FROM camp c JOIN ship s
      ON c.c_lo <= s.s_hi AND s.s_lo <= c.c_hi
    GROUP BY c.campaign_id
"""


@query("join_interval_overlap", oracle=_INTERVAL_ORACLE)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Campaign-window × shipment-window overlap: for each of ≤200
    campaign intervals (a mod-sampled, LIMIT-capped dimension derived
    from orders), count the shipment intervals that overlap it and sum
    the per-pair overlap length in days (closed intervals, so +1).

    The oracle states the textbook O(|A|·|B|) overlap join; the engine
    runs the bucket-blocked equi form described in the module
    docstring. All output arithmetic is integer (counts, day diffs), so
    the hash compare is exact."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")

    camp = (
        orders.filter(F.col("o_orderkey") % 101 == 0)
        .orderBy("o_orderkey")
        .limit(_N_CAMPAIGNS)
        .select(
            F.col("o_orderkey").alias("campaign_id"),
            F.to_date("o_orderdate").alias("c_lo"),
            F.date_add(
                F.to_date("o_orderdate"),
                (F.lit(5) + F.col("o_orderkey") % 20).cast("int"),
            ).alias("c_hi"),
        )
    )
    ship = li.select(
        F.to_date("l_shipdate").alias("s_lo"),
        F.date_add(
            F.to_date("l_shipdate"),
            (
                F.lit(1)
                + (F.col("l_orderkey") + 7 * F.col("l_linenumber")) % 14
            ).cast("int"),
        ).alias("s_hi"),
    )

    month = lambda c: F.trunc(c, "mm")  # noqa: E731
    camp_b = camp.select(
        "*",
        F.explode(
            F.sequence(month("c_lo"), month("c_hi"), F.expr("interval 1 month"))
        ).alias("bucket"),
    )
    ship_b = ship.select(
        "*",
        F.explode(
            F.sequence(month("s_lo"), month("s_hi"), F.expr("interval 1 month"))
        ).alias("bucket"),
    )

    # Each overlapping pair joins in exactly one bucket: the month of the
    # overlap's start, which both exploded sides necessarily generated.
    overlap_start = F.greatest("c_lo", "s_lo")
    pairs = ship_b.join(
        F.broadcast(camp_b),
        on=[
            ship_b.bucket == camp_b.bucket,
            F.col("c_lo") <= F.col("s_hi"),
            F.col("s_lo") <= F.col("c_hi"),
        ],
    ).filter(camp_b.bucket == month(overlap_start))

    return pairs.groupBy("campaign_id").agg(
        F.count("*").alias("n_shipments"),
        F.sum(
            F.datediff(F.least("c_hi", "s_hi"), overlap_start) + 1
        )
        .cast("long")
        .alias("overlap_days"),
    )
