"""Round-12 extension key: grouped rate estimates with Wilson intervals.

Every experimentation / funnel readout ends in "conversion rate by
group, with uncertainty"; the Wilson score interval is the standard
binomial CI for that readout (robust at small n and extreme p, unlike
the normal approximation). SQL-expressible end-to-end, so the oracle
replays it exactly.

Registered registry-LAST (registry._TAIL_MODULES): new rounds append so
the driver-sampling rotation prefix of earlier rounds stays stable.

100 TB posture: one map-side-combined hash aggregation to (group, n, k)
— two BIGINTs per group cross the exchange — then the interval is pure
per-row double math on those integers. Both engines evaluate the
IDENTICAL expression tree on identical integer inputs, so the doubles
match bit-for-bit before the 6-dp rounding even applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_hive_batch_sink_spark.io import load
from flume_hive_batch_sink_spark.registry import query

_Z = 1.96  # 95% two-sided
_VALUE_CUT = 50.0  # "converted" = event value above this

_WILSON_ORACLE = f"""
    WITH g AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN value > {_VALUE_CUT} THEN 1 ELSE 0 END)
                  AS BIGINT) AS k
      FROM events GROUP BY event_type
    )
    SELECT event_type, n, k,
           CAST(ROUND(CAST(k AS DOUBLE) / n, 6) AS DOUBLE) AS rate,
           CAST(ROUND(
             ((CAST(k AS DOUBLE) / n + {_Z} * {_Z} / (2.0 * n))
              - {_Z} * sqrt(CAST(k AS DOUBLE) / n
                            * (1.0 - CAST(k AS DOUBLE) / n) / n
                            + {_Z} * {_Z} / (4.0 * n * n)))
             / (1.0 + {_Z} * {_Z} / n), 6) AS DOUBLE) AS ci_lo,
           CAST(ROUND(
             ((CAST(k AS DOUBLE) / n + {_Z} * {_Z} / (2.0 * n))
              + {_Z} * sqrt(CAST(k AS DOUBLE) / n
                            * (1.0 - CAST(k AS DOUBLE) / n) / n
                            + {_Z} * {_Z} / (4.0 * n * n)))
             / (1.0 + {_Z} * {_Z} / n), 6) AS DOUBLE) AS ci_hi
    FROM g
"""


@query("agg_ratio_ci_wilson", oracle=_WILSON_ORACLE)
def agg_ratio_ci_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type conversion rate (value > {cut}) with the Wilson
    95% score interval: center (p̂ + z²/2n)/(1 + z²/n), half-width
    z·√(p̂(1−p̂)/n + z²/4n²)/(1 + z²/n).

    The expression trees below mirror the oracle's parenthesization
    term-for-term — same divisions in the same order — so the IEEE
    doubles agree exactly, not just to rounding."""
    ev = load(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("value") > _VALUE_CUT, 1).otherwise(0))
        .cast("long")
        .alias("k"),
    )
    n = F.col("n").cast("double")
    p = F.col("k").cast("double") / n
    z2 = F.lit(_Z) * F.lit(_Z)
    center = p + z2 / (F.lit(2.0) * n)
    half = F.lit(_Z) * F.sqrt(
        p * (F.lit(1.0) - p) / n + z2 / (F.lit(4.0) * n * n)
    )
    denom = F.lit(1.0) + z2 / n
    return g.select(
        "event_type",
        "n",
        "k",
        F.round(p, 6).alias("rate"),
        F.round((center - half) / denom, 6).alias("ci_lo"),
        F.round((center + half) / denom, 6).alias("ci_hi"),
    )
