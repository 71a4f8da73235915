"""Round-12 extension key: orphan-file audit (the VACUUM dry-run).

Every table format with job-scoped commits accumulates orphans —
files in the table directory that no manifest references (killed
writers, speculative task output, aborted compactions). Finding them
is the read side of VACUUM, and it pairs with this repo's commit
machinery (etl_partition_manifest_checksum / etl_merge_commit_versions
record what a committed table SHOULD contain; this key finds what is
on disk but shouldn't be).

Registered registry-LAST (registry._TAIL_MODULES): new rounds append so
the driver-sampling rotation prefix of earlier rounds stays stable.

100 TB posture: the directory listing is DISTRIBUTED — Spark's
``binaryFile`` source parallelizes the file enumeration and prunes the
content column away (only path + length are read, never file bytes),
and the orphan set falls out of a broadcast anti-join of that listing
against the manifest. A driver-side os.walk would serialize on one
core exactly when the table is large enough to matter.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_hive_batch_sink_spark.io import load
from flume_hive_batch_sink_spark.registry import query

_ORPHAN_ORACLE = """
    SELECT 'orphan_region_' || CAST(r_regionkey AS VARCHAR) || '.tmp'
             AS rel_path,
           CAST(length(r_name) AS BIGINT) AS n_bytes
    FROM region
"""


@query("etl_orphan_file_audit", oracle=_ORPHAN_ORACLE)
def etl_orphan_file_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Find files on disk that the table's manifest does not reference.

    Harness: nation is written as a committed parquet table and its
    manifest (the file listing at commit time) is captured; one orphan
    per region is then planted in the directory (deterministic name and
    size — content = the region name — so the oracle can state the
    expected audit result from the region table alone). The audit
    re-lists the directory with the binaryFile source (distributed,
    content column pruned), anti-joins the broadcast manifest, and
    returns the orphans' relative paths and sizes."""
    import shutil
    import tempfile

    base = tempfile.mkdtemp(prefix="orphan_audit_")
    tbl = os.path.join(base, "nation_tbl")
    try:
        load(spark, sf_dir, "nation").write.mode("overwrite").parquet(tbl)
        listing = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*")
            .load(tbl)
            .select("path", "length")
        )
        manifest = listing.select("path")  # commit-time snapshot
        manifest_rows = manifest.collect()  # bounded: files per commit

        regions = load(spark, sf_dir, "region").select(
            "r_regionkey", "r_name"
        ).collect()
        for r in regions:
            p = os.path.join(tbl, f"orphan_region_{r.r_regionkey}.tmp")
            with open(p, "wb") as f:
                f.write(r.r_name.encode())

        manifest_df = spark.createDataFrame(manifest_rows, "path STRING")
        audit = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*")
            .load(tbl)
            .select("path", "length")
            .join(F.broadcast(manifest_df), "path", "left_anti")
            .select(
                F.element_at(F.split("path", "/"), -1).alias("rel_path"),
                F.col("length").cast("long").alias("n_bytes"),
            )
            # _SUCCESS and checksum markers are commit metadata, not
            # data files — a real VACUUM whitelists them the same way
            .filter(~F.col("rel_path").startswith("_"))
        )
        # materialize before the temp tree is removed (etl.py idiom);
        # one row per orphan — bounded by what was planted, never data
        return spark.createDataFrame(audit.collect(), audit.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)
