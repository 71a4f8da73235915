"""Source/sink format connectors beyond parquet: JSON lines and ORC.

The reference serializes events to files under Hive partition dirs in a
configurable format (delimited text, columnar) [R-pub: serializer family,
SURVEY.md §0.1]. Our format surface is Spark's native DataSource
connectors; each roundtrip operator proves a format's write → rescan path
is lossless against the parquet source of truth, the same contract
`scan_csv_roundtrip` proves for delimited text (operators/ingest.py).

100 TB posture: all three formats are splittable and scanned by the
vectorized readers; schema is always declared on rescan (never inferred —
inference is an extra full pass over the data at scale).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_hive_batch_sink_spark.io import load
from flume_hive_batch_sink_spark.registry import query

_PROJECTED = """
    SELECT event_id, date_trunc('second', ts) AS ts, user_id, event_type,
           ROUND(value, 4) AS value
    FROM events
"""


def _events_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical serializable projection of events (second-precision
    ts, rounded value) shared by every format roundtrip."""
    return load(spark, sf_dir, "events").select(
        "event_id",
        F.date_trunc("second", "ts").alias("ts"),
        "user_id",
        "event_type",
        F.round("value", 4).alias("value"),
    )


@query("scan_json_roundtrip", oracle=_PROJECTED)
def scan_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serialize events to JSON lines, rescan with a declared schema.

    JSON is the headers-and-body-friendly interchange format (the Flume
    event's closest self-describing analogue); timestamps travel as
    ISO-8601 strings and are re-parsed, proving the round-trip is
    value-lossless at second precision.
    """
    ev = _events_projection(spark, sf_dir).withColumn(
        "ts", F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
    )
    out = os.path.join(tempfile.mkdtemp(prefix="json_roundtrip_"), "events_json")
    ev.write.mode("overwrite").json(out)
    back = spark.read.schema(
        "event_id BIGINT, ts STRING, user_id BIGINT, event_type STRING, value DOUBLE"
    ).json(out)
    return back.select(
        "event_id",
        F.to_timestamp("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        "user_id",
        "event_type",
        "value",
    )


@query("scan_orc_roundtrip", oracle=_PROJECTED)
def scan_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serialize events to ORC, rescan. ORC is the Hive-native columnar
    format — the one a Hive batch sink of the reference's era would roll
    files in; types (incl. TIMESTAMP) survive natively, no string hop.
    """
    ev = _events_projection(spark, sf_dir)
    out = os.path.join(tempfile.mkdtemp(prefix="orc_roundtrip_"), "events_orc")
    ev.write.mode("overwrite").orc(out)
    return spark.read.orc(out)
