"""Hostile-timezone driver simulation (the round-6 RFM lesson).

The driver runs a VANILLA SparkSession in whatever timezone the host
has; the loader self-configures UTC, but any value that round-trips
through the Python process (collect → datetime → lit) silently picks up
the PROCESS timezone and shifts calendar arithmetic by a day. The fix
is structural — global scalars join in as broadcast 1-row aggregates —
and this test keeps it that way: the date/calendar-sensitive keys must
hash-match their oracles inside a subprocess whose TZ is Asia/Shanghai
(UTC+8, no DST — the maximally confusing stable offset).

One subprocess, one session, all keys — the startup cost is paid once.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Keys whose results depend on calendar arithmetic, timestamp
# collection, or date truncation — the tz-sensitive surface.
TZ_SENSITIVE = [
    "pipeline_rfm",
    "pipeline_time_to_convert",
    "ts_seasonal_decompose",
    "ts_peak_concurrency",
    "ts_autocorrelation",
    "etl_backfill_planner",
    "win_wow_change",
    "dq_freshness_lag",
    "dq_psi_drift",
]

_DRIVER = """
import sys
sys.path.insert(0, {repo!r})
sys.path.insert(0, {tests!r})
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.driver.extraJavaOptions", "-Duser.timezone=Asia/Shanghai")
    .getOrCreate()
)
from oracle import compare
import __spark_entry__ as e
q, o = e.queries(), e.oracle_sql()
for k in {keys!r}:
    compare(q[k](spark, {sf!r}), o[k], {sf!r})
    print("TZOK", k, flush=True)
print("ALL-TZOK", flush=True)
"""


def _run_hostile_tz(keys: list[str]) -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR_T2", "/root/testdata/sf0.01")
    env = dict(os.environ, TZ="Asia/Shanghai")
    script = _DRIVER.format(
        repo=REPO, tests=os.path.join(REPO, "tests"), keys=keys, sf=sf
    )
    proc = subprocess.run(
        [sys.executable, "-c", script],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=2400,
    )
    assert "ALL-TZOK" in proc.stdout, (
        f"hostile-TZ run failed:\nstdout tail: {proc.stdout[-2000:]}\n"
        f"stderr tail: {proc.stderr[-2000:]}"
    )


def test_calendar_keys_survive_hostile_process_tz():
    _run_hostile_tz(TZ_SENSITIVE)


def test_sampled_registry_survives_hostile_process_tz():
    """Rotating hostile-TZ sweep over the WHOLE registry, not just the
    curated calendar list: the collect-relit bug class (a value
    round-tripping through a driver-side datetime) can enter through
    ANY key, so every key gets this gate on a 3-round rotation —
    ``md5(key) % 3 == round_idx % 3`` picks ~1/3 of the registry, and
    ``round_idx`` (the count of driver BENCH_r*.json artifacts)
    advances each round, so three consecutive rounds cover everything.
    One subprocess, one session; ~100 keys ≈ a few minutes."""
    import glob
    import hashlib

    sys.path.insert(0, REPO)
    from flume_hive_batch_sink_spark import registry
    from flume_hive_batch_sink_spark.registry import load_all_operators

    load_all_operators()
    round_idx = len(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    keys = sorted(
        k
        for k in registry.QUERIES
        if k in registry.ORACLES
        and int(hashlib.md5(k.encode()).hexdigest(), 16) % 3 == round_idx % 3
    )
    assert keys, "sampling schedule selected no keys"
    _run_hostile_tz(keys)
