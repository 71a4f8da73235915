"""Mergeable-sketch operators — the approximate-query surface at scale.

At 100 TB, exact COUNT(DISTINCT) and exact percentiles force full
shuffles of the keyspace; the production pattern is a fixed-size
mergeable sketch per partition combined associatively (one treeAggregate,
no key shuffle at all). Spark ships three such sketches natively and all
are exercised here: KLL-style quantile digests (``percentile_approx``),
HyperLogLog (``hll_sketch_agg`` / ``hll_union_agg`` — the partial
sketches are first-class binary values, so they can be stored per
partition/day and merged across arbitrary slices later), and Count-Min
(``count_min_sketch``, deserialized through Spark's public
``org.apache.spark.util.sketch.CountMinSketch``).

Oracle design: approximation algorithms differ engine-to-engine, so
value-hashing the estimates against DuckDB is meaningless. Instead each
result embeds the sketch's OWN accuracy certificate — a boolean computed
in Spark comparing estimate vs the exactly-computed answer on the same
data — alongside exact columns the oracle reproduces. The hash gate then
fails if the sketch ever drifts outside its published error bound, while
the oracle still pins the exact-side values and result shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_hive_batch_sink_spark.io import load
from flume_hive_batch_sink_spark.registry import query


@query(
    "agg_approx_quantile",
    oracle="""
    SELECT DISTINCT event_type,
           true AS p50_ok, true AS p95_ok
    FROM events
    """,
)
def agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate per-group quantiles with an in-result accuracy
    certificate: ``percentile_approx`` (GK/KLL-style digest, mergeable,
    single pass) vs the exact ``percentile`` on the same rows; the
    booleans assert |approx − exact| ≤ 1.0 on the ~[0, 100] value
    domain. At scale only the approx path survives — exact percentile
    is the verifier, not the product."""
    ev = load(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, 10000).alias("a50"),
        F.percentile_approx("value", 0.95, 10000).alias("a95"),
        F.percentile("value", 0.5).alias("e50"),
        F.percentile("value", 0.95).alias("e95"),
    )
    return agg.select(
        "event_type",
        (F.abs(F.col("a50") - F.col("e50")) <= 1.0).alias("p50_ok"),
        (F.abs(F.col("a95") - F.col("e95")) <= 1.0).alias("p95_ok"),
    )


@query(
    "sketch_hll_merge",
    oracle="""
    SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS n_groups,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           true AS hll_ok
    FROM events
    """,
)
def sketch_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-wise HLL sketch + associative union — the mergeable-
    sketch pattern for distinct counting across slices: one binary
    sketch per event_type (storable per partition/day), a single
    ``hll_union_agg`` to the corpus-wide estimate, certified within 5%
    of the exact distinct user count. No row-level shuffle of user_id
    ever happens on the sketch path — only 5 fixed-size binaries move."""
    ev = load(spark, sf_dir, "events")
    per_group = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sketch")
    )
    merged = per_group.agg(
        F.count("*").alias("n_groups"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est_users"),
    )
    exact = ev.agg(F.countDistinct("user_id").alias("exact_users"))
    return merged.crossJoin(F.broadcast(exact)).select(
        F.col("n_groups").cast("long").alias("n_groups"),
        F.col("exact_users").cast("long").alias("exact_users"),
        (
            F.abs(F.col("est_users") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("hll_ok"),
    )


@query(
    "sketch_cms_counts",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_exact, true AS cms_ok
    FROM events GROUP BY event_type
    """,
)
def sketch_cms_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency sketch over the event-type stream, built
    distributed by ``count_min_sketch`` (seed 42 — deterministic) and
    read back through Spark's public CountMinSketch codec. Each group's
    estimate is certified against the exact count with the CMS
    guarantee est ∈ [exact, exact + ε·N]. The sketch is one ~KB binary
    aggregated without any key shuffle; the exact counts ride along as
    oracle-checked columns. The tiny k-row certificate table is built on
    the driver — the data-sized aggregation all happened in the sketch
    and the exact groupBy, both distributed."""
    ev = load(spark, sf_dir, "events")
    eps, conf = 0.0001, 0.99
    sk_row = ev.agg(
        F.count_min_sketch(
            "event_type", F.lit(eps), F.lit(conf), F.lit(42)
        ).alias("cms"),
        F.count("*").alias("total"),
    ).collect()[0]
    cms = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(sk_row["cms"])
    )
    total = sk_row["total"]
    exact = (
        ev.groupBy("event_type").agg(F.count("*").alias("n_exact")).collect()
    )
    rows = []
    for r in exact:
        est = cms.estimateCount(r["event_type"])
        ok = r["n_exact"] <= est <= r["n_exact"] + eps * total
        rows.append((r["event_type"], r["n_exact"], bool(ok)))
    return spark.createDataFrame(
        rows, "event_type string, n_exact long, cms_ok boolean"
    )


@query(
    "agg_bitmap_distinct",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via mergeable bitmaps — the middle ground
    between a full countDistinct expansion and an HLL estimate: integer
    keys are bucketed (32k ids per bitmap), each bucket aggregates to a
    fixed-size bitmap with map-side OR-combine, and the distinct count
    is the sum of bitmap popcounts. Unlike the HLL path this is exact
    (hash-checked against COUNT(DISTINCT) directly — no tolerance
    certificate needed); unlike raw countDistinct, what shuffles is one
    bitmap per (group, bucket), not one row per distinct key."""
    ev = load(spark, sf_dir, "events")
    per_bucket = ev.groupBy(
        "event_type", F.bitmap_bucket_number("user_id").alias("bkt")
    ).agg(
        F.bitmap_construct_agg(F.bitmap_bit_position("user_id")).alias("bm")
    )
    return per_bucket.groupBy("event_type").agg(
        F.sum(F.bitmap_count("bm")).cast("long").alias("n_users")
    )
