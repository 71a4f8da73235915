"""SparkSession factory tuned for this engine.

Used by tests and bench.py. The driver passes its own session into
``queries()`` callables, so operator code must never create sessions —
only this module (and only for local runs).

Scale posture: these settings are the local[32] test profile. On a real
cluster the same code runs unchanged; only ``spark.sql.shuffle.partitions``
(or AQE target sizes) and executor sizing move with the data volume.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _package_root() -> str:
    """Directory that must be on every PYTHON WORKER's sys.path for
    ``mapInPandas``/UDF closures referencing this package to unpickle
    (the repo root — parent of the package directory)."""
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def get_spark(app_name: str = "flume-hive-batch-sink-spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # Python workers resolve imports from the PYTHONPATH the JVM hands
    # them, not from the driver's sys.path — so a conftest/sys.path fix
    # alone leaves every mapInPandas key dying with a worker
    # ModuleNotFoundError when the process is launched from outside the
    # repo root (round-8 verdict). Export it in the driver env (local
    # mode workers inherit it) AND as executorEnv (cluster mode).
    root = _package_root()
    parts = os.environ.get("PYTHONPATH", "").split(os.pathsep)
    if root not in parts:
        os.environ["PYTHONPATH"] = os.pathsep.join([root] + [p for p in parts if p])
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"])
        # tz-naive testdata timestamps; pin UTC so date functions are
        # deterministic regardless of host tz (SURVEY.md §2 pitfalls).
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet uses parquet TIMESTAMP(NANOS); see io._ensure_session_confs
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Round-15: AQE coalesces post-shuffle partitions by INPUT
        # bytes, which under-parallelizes CPU-dense stages fed by
        # byte-light exchanges (candidate-pair joins fan a few MB of
        # (id, key) rows out to 10⁷-10⁸ pair slots; AQE was running
        # them on 1-2 tasks). The default 1 MB floor is what
        # parallelism-first coalescing bottoms out at; 64 KB lets it
        # keep the configured parallelism for those slim exchanges.
        # Worst case (floor too low) is simply "no coalescing", i.e.
        # the configured spark.sql.shuffle.partitions — never more.
        # Measured: llm_jaccard_dedup 8.4 s → 4.0 s at sf0.1 from this
        # conf alone. Scale note: a 100 TB deployment that prefers
        # fewer, larger post-shuffle partitions overrides this together
        # with shuffle.partitions; the fan-out operators additionally
        # pin their explosive stages with explicit repartition() so
        # they stay wide even under a vanilla session.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    return builder.getOrCreate()
