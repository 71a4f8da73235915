#!/usr/bin/env python
"""Round-16 A/B probe: AQE-off cloned session (partitioning.fanout_session)
for the fan-out dedup keys.

Interleaved same-session A/B per the measurement discipline: each rep
alternates arms (SPARK_GRAFT_FANOUT_AQE=1 -> AQE on, the round-15
behavior; unset -> the clone path), timing one noop-sink execution of a
freshly built plan. Warm medians of N per arm; first-run excluded.

Usage: python scripts/probe_fanout_aqe.py [sf_dir] [reps] [key ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from flume_hive_batch_sink_spark import registry  # noqa: E402
from flume_hive_batch_sink_spark.registry import load_all_operators  # noqa: E402
from flume_hive_batch_sink_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.1"
    reps = int(args[1]) if len(args) > 1 and args[1].isdigit() else 5
    keys = [a for a in args[2:] if "/" not in a] or [
        "llm_near_dedup_minhash",
        "llm_jaccard_dedup",
    ]
    load_all_operators()
    spark = get_spark("probe_fanout_aqe")
    sc = spark.sparkContext
    for key in keys:
        fn = registry.QUERIES[key]
        times: dict[str, list[float]] = {"aqe_on": [], "aqe_off": []}
        # one unmeasured warmup per arm (shuffle files, codegen)
        for arm in ("aqe_on", "aqe_off"):
            os.environ["SPARK_GRAFT_FANOUT_AQE"] = (
                "1" if arm == "aqe_on" else "0"
            )
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        for r in range(reps):
            for arm in ("aqe_on", "aqe_off"):
                os.environ["SPARK_GRAFT_FANOUT_AQE"] = (
                    "1" if arm == "aqe_on" else "0"
                )
                sc.setJobDescription(f"probe:{key}:{arm}:{r}")
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                times[arm].append(time.perf_counter() - t0)
                sc.setJobDescription(None)
        os.environ.pop("SPARK_GRAFT_FANOUT_AQE", None)
        on = statistics.median(times["aqe_on"])
        off = statistics.median(times["aqe_off"])
        print(
            f"{key}: aqe_on median {on:.2f}s {sorted(round(t, 2) for t in times['aqe_on'])} "
            f"| aqe_off median {off:.2f}s {sorted(round(t, 2) for t in times['aqe_off'])} "
            f"| speedup {on / off:.2f}x",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
