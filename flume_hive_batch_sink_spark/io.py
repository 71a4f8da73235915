"""Table loaders for the driver-generated testdata (TESTDATA.md).

All ten tables are plain parquet; Spark's vectorized parquet reader gives
columnar scans with predicate pushdown + column pruning for free, so the
loader deliberately does nothing beyond ``spark.read.parquet`` — filters
and projections belong in the operators so Catalyst can push them into
the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _ensure_session_confs(spark: SparkSession) -> None:
    """Confs every query depends on, set at load time so operators work
    under the driver's vanilla session (both are runtime-settable):

    - ``events.parquet`` stores ``ts`` as parquet TIMESTAMP(NANOS), which
      Spark's reader rejects; the legacy conf reads it as nanos-since-epoch
      LONG and the loader converts (values are µs-aligned, verified).
    - tz-naive testdata + DuckDB-naive oracle ⇒ pin session tz to UTC so
      TimestampType wall-clock math matches the oracle byte-for-byte.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    _ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # nanos LONG → TimestampType. Integer DIV, not float division:
        # epoch-ns ≈ 1.7e18 exceeds double's 2^53 integer range, so
        # `ts / 1000` silently rounds to the wrong microsecond.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLES}
