#!/usr/bin/env python
"""Run every registered query against its DuckDB oracle — the local
replica of the driver's t2 gate. Usage:

    python scripts/check_parity.py [--rows-only] [sf_dir] [key ...]

Defaults to sf0.01 (the driver's t2 scale) and all keys.

``--rows-only`` skips the DuckDB comparison and just executes every
query (counting rows) — the scale smoke mode for sf0.1+, where some
ground-truth oracles (all-pairs token joins) are quadratically more
expensive than the operators they verify.
"""

from __future__ import annotations

import sys
import time
import traceback
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

from oracle import compare  # noqa: E402

from flume_hive_batch_sink_spark import registry  # noqa: E402
from flume_hive_batch_sink_spark.registry import load_all_operators  # noqa: E402
from flume_hive_batch_sink_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    rows_only_mode = "--rows-only" in args
    args = [a for a in args if a != "--rows-only"]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    keys = [a for a in args if "/" not in a] or sorted(registry.QUERIES)

    load_all_operators()
    keys = [k for k in (keys or sorted(registry.QUERIES)) if k in registry.QUERIES]
    spark = get_spark("check_parity")

    n_pass = n_fail = n_rows_only = 0
    failures: list[str] = []
    for key in keys:
        t0 = time.time()
        try:
            df = registry.QUERIES[key](spark, sf_dir)
            if key in registry.ORACLES and not rows_only_mode:
                compare(df, registry.ORACLES[key], sf_dir)
                n_pass += 1
                status = "OK   "
            else:
                n = df.count()
                assert n >= 0
                n_rows_only += 1
                status = f"ROWS({n})"
        except Exception:
            n_fail += 1
            status = "FAIL "
            failures.append(key)
            traceback.print_exc(limit=8)
        print(f"{status} {key:32s} {time.time() - t0:6.2f}s", flush=True)

    print(
        f"\n{n_pass} oracle-pass, {n_rows_only} rows-only, {n_fail} fail "
        f"out of {len(keys)} at {sf_dir}"
    )
    if failures:
        print("FAILED:", " ".join(failures))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
