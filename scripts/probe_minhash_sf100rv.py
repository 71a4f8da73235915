#!/usr/bin/env python
"""Round-13 next-decade probe: llm_near_dedup_minhash over the 5M-doc
realistic-vocabulary fixture (testdata/sf100rv, built by
gen_docs_realvocab.gen_scale) — the flagship 100 TB dedup claim run one
decade past the r12 sf10rv campaign. Rows-only (no oracle at this
scale); the point is wall-clock slope vs sf10rv's 103.9 s and any new
defect class the next decade exposes.

Usage: python scripts/probe_minhash_sf100rv.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from flume_hive_batch_sink_spark.registry import (  # noqa: E402
    QUERIES,
    load_all_operators,
)
from flume_hive_batch_sink_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else str(
        REPO / "testdata" / "sf100rv"
    )
    load_all_operators()
    # Probe-scale scratch: the exact-verify of ~1e8 surviving candidate
    # pairs needs ~60 GB of shuffle+sort-spill scratch ON TOP of the
    # job's retained shuffles — more than the sandbox's ~76 GB free
    # disk (two ENOSPC runs recorded in SCALE.md). Spread local dirs
    # across the 126 GB tmpfs and the disk (Spark round-robins blocks),
    # the local stand-in for a cluster's per-executor NVMe scratch.
    shm = "/dev/shm/spark_probe"
    os.makedirs(shm, exist_ok=True)
    os.environ.setdefault("SPARK_LOCAL_DIRS", f"{shm},/tmp")
    spark = get_spark("minhash_sf100rv")
    print("loadavg_start", round(os.getloadavg()[0], 2), flush=True)
    t0 = time.perf_counter()
    n = QUERIES["llm_near_dedup_minhash"](spark, sf_dir).count()
    dt = time.perf_counter() - t0
    print(
        f"llm_near_dedup_minhash {sf_dir}: {dt:.1f}s rows={n} "
        f"loadavg_end={round(os.getloadavg()[0], 2)}",
        flush=True,
    )


if __name__ == "__main__":
    main()
