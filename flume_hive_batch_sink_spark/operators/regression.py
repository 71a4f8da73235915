"""Round-11 extension key: SQL-standard linear-regression aggregates.

The `REGR_*` family (SQL:2003 §10.9; implemented by both Spark ≥3.5 and
DuckDB as built-ins) is the grouped ordinary-least-squares surface BI
tools compile trend lines to. `agg_stats` covers the second-moment
statistics (stddev/var/corr); this key covers the regression fits —
slope, intercept, R² of price on quantity per return flag.

Registered registry-LAST (registry._TAIL_MODULES): new rounds append so
the driver-sampling rotation prefix of earlier rounds stays stable.

100 TB posture: one map-side-combined hash aggregation — REGR_* are
algebraic aggregates (sums of x, y, xy, x², y² and a count), so the
shuffle carries one partial-moment row per (group × map partition) and
the fit is computed from merged moments. Results round to 6 dp on both
engines (the agg_stats convention for float aggregates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_hive_batch_sink_spark.io import load
from flume_hive_batch_sink_spark.registry import query

_REGR_ORACLE = """
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 6)
             AS intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2
    FROM lineitem GROUP BY l_returnflag
    """


@query("agg_regression_by_group", oracle=_REGR_ORACLE)
def agg_regression_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped OLS via the SQL-standard REGR_* aggregates: per return
    flag, the slope/intercept/R² of extended price regressed on
    quantity (y on x — both engines take (y, x) argument order), plus
    the group count. Rounded to 6 dp so cross-engine float summation
    order cannot flip the hash (the agg_stats convention; slope
    magnitudes here are ~10³ with ~1e-9 relative spread)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.round(
            F.regr_slope(F.col("l_extendedprice"), F.col("l_quantity")), 6
        ).alias("slope"),
        F.round(
            F.regr_intercept(F.col("l_extendedprice"), F.col("l_quantity")),
            6,
        ).alias("intercept"),
        F.round(
            F.regr_r2(F.col("l_extendedprice"), F.col("l_quantity")), 6
        ).alias("r2"),
    )
