"""The reference replacement: Structured Streaming → Hive-partitioned table.

`sogou/flume-hive-batch-sink` drains channel batches into time-partition
directories, rolls files, registers partitions, and writes done-flags
[SURVEY.md §0.1, reconstructed]. Here each micro-batch epoch plays the
channel transaction: ``foreachBatch`` writes the epoch partitioned by
(dt, hr) with **dynamic partition overwrite keyed by epoch id**, so a
replayed epoch (the analogue of Flume's rollback→redeliver) overwrites
its own previous output instead of duplicating — checkpoint WAL +
idempotent epoch writes = exactly-once table state (SURVEY.md §3.3).
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from flume_hive_batch_sink_spark.operators.ingest import (
    with_partition_keys,
    write_done_markers,
)


def write_epoch(
    epoch_df: DataFrame,
    epoch_id: int,
    out_dir: str,
    max_records_per_file: int = 1_000_000,
) -> None:
    """Idempotent epoch write: partition layout epoch=/dt=/hr=.

    Dynamic overwrite scoped to this epoch's partitions — a retried
    epoch replaces exactly the partitions it wrote before. At scale the
    repartition bounds concurrent writers per Hive partition (the
    `maxOpenFiles` analogue) and maxRecordsPerFile is the roll policy.
    """
    spark = epoch_df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (
        with_partition_keys(epoch_df)
        .withColumn("epoch", F.lit(epoch_id))
        .repartition(F.col("dt"), F.col("hr"))
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("epoch", "dt", "hr")
        .parquet(out_dir)
    )


def start_hive_sink(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str | None = None,
) -> StreamingQuery:
    """writeStream.foreachBatch(hive-partitioned write), availableNow."""
    chk = checkpoint_dir or tempfile.mkdtemp(prefix="chk_hive_sink_")
    if checkpoint_dir is None:
        atexit.register(shutil.rmtree, chk, ignore_errors=True)
    return (
        stream_df.writeStream.foreachBatch(
            lambda df, eid: write_epoch(df, eid, out_dir)
        )
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )


def read_sink_table(spark: SparkSession, out_dir: str) -> DataFrame:
    """Re-read the sink output as the logical table (epoch is an
    implementation detail of idempotency, not part of the table)."""
    return spark.read.parquet(out_dir).drop("epoch")


def finalize_partitions(spark: SparkSession, out_dir: str) -> list[str]:
    """Post-commit protocol: done-markers per completed partition (the
    reference's metastore-registration + done-flag step)."""
    return write_done_markers(spark, out_dir)


__all__ = [
    "write_epoch",
    "start_hive_sink",
    "read_sink_table",
    "finalize_partitions",
]
