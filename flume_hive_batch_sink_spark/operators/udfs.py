"""2.H — UDF / UDAF / UDTF surface.

UDFs are the slow path by design: everything that CAN be a builtin
expression elsewhere in this engine is one. These operators exist to
prove the full surface — row-at-a-time Python UDF, Arrow-vectorized
pandas UDF, custom pandas UDAF, explode-style table function, and
grouped-map `applyInPandas` — with oracle-matched results. Arrow batch
transfer keeps the pandas variants ~10-100× cheaper than row-at-a-time;
at 100 TB the grouped-map pattern holds because state is per-group, not
per-partition.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf

from flume_hive_batch_sink_spark.io import load
from flume_hive_batch_sink_spark.registry import query


@query(
    "udf_python_scalar",
    oracle="""
    SELECT event_id,
           CASE WHEN value >= 400 THEN 'high' WHEN value >= 100 THEN 'mid'
                ELSE 'low' END AS tier
    FROM events
    """,
)
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (value → tier label). Kept off hot paths;
    the CASE WHEN twin in fn_cond is the production form."""

    # no type hints on the closure: PySpark 4 tries to infer the eval
    # type from them and warns when they don't name a supported pattern
    # — the decorator's returnType is the whole contract here
    @udf("string")
    def tier(value):
        if value >= 400:
            return "high"
        if value >= 100:
            return "mid"
        return "low"

    ev = load(spark, sf_dir, "events")
    return ev.select("event_id", tier("value").alias("tier"))


@query(
    "udf_pandas_vectorized",
    oracle="""
    WITH stats AS (
      SELECT avg(value) AS mu, stddev_samp(value) AS sigma FROM events
    )
    SELECT event_id, ROUND((value - mu) / sigma, 4) AS zscore
    FROM events, stats
    """,
)
def udf_pandas_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar pandas UDF: z-score of value against
    global moments (computed JVM-side, broadcast via cross join)."""

    @pandas_udf("double")
    def zscore(v: pd.Series, mu: pd.Series, sigma: pd.Series) -> pd.Series:
        return (v - mu) / sigma

    ev = load(spark, sf_dir, "events")
    stats = ev.agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    return ev.crossJoin(F.broadcast(stats)).select(
        "event_id", F.round(zscore("value", "mu", "sigma"), 4).alias("zscore")
    )


@query(
    "udaf_aggregator",
    oracle="""
    SELECT event_type, ROUND(exp(avg(ln(value + 1))), 6) AS geo_mean
    FROM events GROUP BY event_type
    """,
)
def udaf_aggregator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate as a pandas UDAF (grouped-agg pandas UDF):
    geometric mean of value+1 per event type."""
    import numpy as np

    @pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:
        return float(np.exp(np.log(v + 1.0).mean()))

    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(geo_mean("value"), 6).alias("geo_mean")
    )


@query(
    "udtf_explode_like",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    """,
)
def udtf_explode_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table function surface: one row → n rows (tokenizer). The builtin
    explode(split(…)) is the codegen'd form of a per-row UDTF."""
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))


@query(
    "udf_grouped_map",
    oracle="""
    WITH g AS (
      SELECT user_id,
             epoch(ts - lag(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)) AS gap
      FROM events
    )
    SELECT user_id, count(*) AS n_events,
           coalesce(ROUND(avg(gap), 3), -1.0) AS avg_gap_s
    FROM g GROUP BY user_id
    """,
)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-user inter-event gap statistics.
    Each group arrives as one pandas DataFrame; state is bounded by the
    largest single user's history, not the partition."""

    def gap_stats(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        gaps = pdf["ts"].diff().dt.total_seconds().dropna()
        avg_gap = round(float(gaps.mean()), 3) if len(gaps) else -1.0
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "avg_gap_s": [avg_gap],
            }
        )

    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    return ev.groupBy("user_id").applyInPandas(
        gap_stats, "user_id BIGINT, n_events BIGINT, avg_gap_s DOUBLE"
    )
