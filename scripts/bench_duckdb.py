#!/usr/bin/env python
"""DuckDB twin of bench.py — measures the SAME six headline queries (the
registered oracle SQL of each headline key) on the same parquet, so the
Spark:DuckDB ratio can be computed at ANY scale factor, not just the
sf0.1 BASELINE.md snapshot.

Two numbers per query, closing the protocol-asymmetry note in bench.py:
``warm2`` replicates the BASELINE.md protocol exactly (single second-run
measurement, fetchall included); ``median`` is the median of the same
rep count bench.py uses, so either protocol can be compared like-for-like.

Usage: python scripts/bench_duckdb.py [sf_dir] — prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

from oracle import duckdb_connect  # noqa: E402

from flume_hive_batch_sink_spark.registry import (  # noqa: E402
    ORACLES,
    load_all_operators,
)

HEADLINE = (
    ("q1", "agg_group_basic"),
    ("join3", "join_multiway"),
    ("topk_window", "topk_per_group"),
    ("hourly_rollup", "batch_counters"),
    ("cosine_top100", "llm_sim_topk_pairs"),
    ("exact_dedup", "llm_exact_dedup"),
)


def run(sf_dir: str, reps: int | None = None) -> dict:
    from bench import parse_sf

    sf = parse_sf(sf_dir)
    load_all_operators()
    con = duckdb_connect(sf_dir)
    if reps is None:
        reps = max(5, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "7")))

    warm2: dict[str, float] = {}
    median: dict[str, float] = {}
    for name, key in HEADLINE:
        sql = ORACLES[key]
        samples = []
        for i in range(2 + reps):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            dt = time.perf_counter() - t0
            if i == 1:
                warm2[name] = round(dt, 4)  # BASELINE.md protocol
            if i >= 2:
                samples.append(dt)
        median[name] = round(statistics.median(samples), 4)

    return {
        "metric": "duckdb_headline_queries",
        "sf": sf,
        "unit": "sec",
        "warm2_total": round(sum(warm2.values()), 4),
        "median_total": round(sum(median.values()), 4),
        "warm2": warm2,
        "median": median,
        "reps": reps,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    print(json.dumps(run(sf_dir)))


if __name__ == "__main__":
    main()
