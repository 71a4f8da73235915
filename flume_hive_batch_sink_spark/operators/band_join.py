"""Round-12 extension key: ε-band join via bucket blocking.

|x − y| ≤ ε between two big relations is the numeric sibling of the
interval-overlap join — the shape behind price-matching, sensor
cross-validation, and tolerance reconciliation. A naive theta join is
a cartesian product; the classic rewrite blocks both sides into
⌊x/ε⌋ buckets so every qualifying pair co-occurs in adjacent buckets,
turning the join into an EQUI join on the bucket id.

Registered registry-LAST (registry._TAIL_MODULES): new rounds append so
the driver-sampling rotation prefix of earlier rounds stays stable.

100 TB posture: both sides shuffle ONCE on the bucket id (hash
partitioning — a shuffle-hash/sort-merge equi join, never a nested
loop); each pair is generated in exactly ONE bucket pairing (the
bucket of the smaller value, which is either equal to or one below
the other side's bucket), so no distinct pass is needed. Candidate
volume is Σ per-bucket |a|·|b| over adjacent buckets — it tracks
value-density·ε, not |A|·|B|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_hive_batch_sink_spark.io import load
from flume_hive_batch_sink_spark.registry import query

_EPS = "0.02"  # dollars; DECIMAL literal so bucketing is exact

_BAND_ORACLE = f"""
    -- DECIMAL(12,2) casts on BOTH engines: the fixture column is a
    -- DOUBLE of 2-dp values, and a raw double band compare can flip a
    -- pair whose true diff is exactly eps by one ULP; the nearest-2dp
    -- decimal is unambiguous, so the band decision is exact
    SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
           CAST(CAST(b.p_retailprice AS DECIMAL(12,2))
                - CAST(a.p_retailprice AS DECIMAL(12,2)) AS DOUBLE)
             AS price_diff
    FROM part a JOIN part b
      ON a.p_partkey < b.p_partkey
     AND abs(CAST(a.p_retailprice AS DECIMAL(12,2))
             - CAST(b.p_retailprice AS DECIMAL(12,2)))
         <= CAST({_EPS} AS DECIMAL(12,2))
     AND a.p_brand <> b.p_brand
"""


@query("join_band_epsilon", oracle=_BAND_ORACLE)
def join_band_epsilon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-brand part pairs whose retail prices agree within ε=0.02:
    |price_a − price_b| ≤ ε, id-ordered pairs, via ε-bucket blocking.

    Prices are DECIMAL(12,2) in the fixture, so ``floor(price / ε)``
    is exact integer arithmetic — no float can move a bucket boundary.
    Side A probes its own bucket and the next one up (bucket, bucket+1);
    side B is keyed once by its own bucket. A qualifying pair with
    price_a ≤ price_b sits at bucket_b ∈ {{bucket_a, bucket_a + 1}}, and
    the canonical orientation (emit from the smaller price's probe,
    ties broken by partkey order inside the residual filter) generates
    each pair exactly once — the llm-blocking discipline
    (join_interval_overlap's one-canonical-bucket rule) applied to a
    numeric band. The oracle is the direct theta self-join, which
    DuckDB can afford at gate scale."""
    part = load(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", F.col("p_retailprice").cast("decimal(12,2)").alias("price")
    )
    eps = F.lit(_EPS).cast("decimal(12,2)")
    bucket = F.floor(F.col("price") / eps).cast("long")
    a = part.select(
        F.col("p_partkey").alias("ka"),
        F.col("p_brand").alias("ba"),
        F.col("price").alias("pa"),
        bucket.alias("bkt"),
    )
    # probe buckets: own and next-up; the pair materializes where the
    # SMALLER price's probe row meets the LARGER price's keyed row, so
    # each qualifying pair appears under exactly one (bucket, offset)
    probe = a.withColumn("off", F.explode(F.array(F.lit(0), F.lit(1)))).select(
        "ka", "ba", "pa", (F.col("bkt") + F.col("off")).alias("jbkt")
    )
    b = part.select(
        F.col("p_partkey").alias("kb"),
        F.col("p_brand").alias("bb"),
        F.col("price").alias("pb"),
        bucket.alias("jbkt"),
    )
    pairs = probe.join(b, "jbkt").filter(
        # band + canonical orientation: a holds the smaller price (ties
        # by key), so (a,b) is generated once even when both sit in one
        # bucket; brand inequality and id-ordering for the output shape
        (F.col("pb") - F.col("pa") >= 0)
        & (F.col("pb") - F.col("pa") <= eps)
        & (
            (F.col("pb") > F.col("pa"))
            | (F.col("ka") < F.col("kb"))
        )
        & (F.col("ka") != F.col("kb"))
        & (F.col("ba") != F.col("bb"))
    )
    return pairs.select(
        F.least("ka", "kb").alias("part_a"),
        F.greatest("ka", "kb").alias("part_b"),
        # signed relative to partkey order, exact decimal difference
        F.when(F.col("ka") < F.col("kb"), F.col("pb") - F.col("pa"))
        .otherwise(F.col("pa") - F.col("pb"))
        .cast("double")
        .alias("price_diff"),
    )
