#!/usr/bin/env python
"""Per-key wall-clock sweep with the noop sink (optimization guide §1.4).

Times every registered query at a given sf_dir: plan build (which for
the iterative dedup/CC keys includes their eager driver-loop work),
first noop-sink execution, and one warm repeat. The noop sink computes
every column of every row and discards it, so the timing is the
operator's compute, not the driver fetch. Jobs are labelled
(`sweep:<key>`) per guide §1.5.

Usage: python scripts/sweep_keys.py [sf_dir] [out.json] [key ...]
Defaults: /root/testdata/sf0.1, /tmp/sweep_result.json, all keys.
Honors SPARK_GRAFT_CACHE_INPUTS like bench.py (set it to 1 for the
bench-comparable warm-input mode).
"""

from __future__ import annotations

import json
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
    # a .json first arg is an OUTPUT path, never the data dir (ADVICE r15)
    sf_dir = (
        args[0]
        if args and "/" in args[0] and not args[0].endswith(".json")
        else "/root/testdata/sf0.1"
    )
    out_path = None
    keys = []
    for a in args:
        if a.endswith(".json"):
            out_path = a
        elif "/" not in a:
            keys.append(a)
    out_path = out_path or "/tmp/sweep_result.json"
    load_all_operators()
    keys = [k for k in (keys or sorted(registry.QUERIES)) if k in registry.QUERIES]
    spark = get_spark("sweep_keys")
    sc = spark.sparkContext
    out: dict[str, dict] = {}
    for key in keys:
        sc.setJobDescription(f"sweep:{key}")
        t0 = time.perf_counter()
        try:
            df = registry.QUERIES[key](spark, sf_dir)
            t_build = time.perf_counter() - t0
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t_first = time.perf_counter() - t1
            t2 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t_warm = time.perf_counter() - t2
            out[key] = {
                "build_s": round(t_build, 3),
                "first_s": round(t_first, 3),
                "warm_s": round(t_warm, 3),
            }
            print(
                f"{key:36s} build {t_build:7.2f}  first {t_first:7.2f}"
                f"  warm {t_warm:7.2f}",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 — sweep must survive any key
            out[key] = {"err": repr(e)[:300]}
            print(f"{key:36s} ERR {e!r}", flush=True)
        finally:
            sc.setJobDescription(None)
    Path(out_path).write_text(json.dumps(out, indent=1, sort_keys=True))
    slow = sorted(
        (v.get("build_s", 0) + v.get("first_s", 0), k)
        for k, v in out.items()
        if "err" not in v
    )[-25:]
    print("\nslowest (build+first):")
    for s, k in reversed(slow):
        print(f"  {k:36s} {s:7.2f}s")
    errs = [k for k, v in out.items() if "err" in v]
    if errs:
        print("ERRORS:", " ".join(errs))
    return 1 if errs else 0


if __name__ == "__main__":
    raise SystemExit(main())
