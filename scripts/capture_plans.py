#!/usr/bin/env python
"""Capture .explain("formatted") for queries into plans/<tag>/<key>_<suffix>.txt.

Usage: python scripts/capture_plans.py <tag> <suffix> [sf_dir] [key ...]
e.g.   python scripts/capture_plans.py r15 before /root/testdata/sf0.1 q1 ...

Keys default to the six bench headline queries (bench.HEADLINE names
resolve through their registry keys). Plans are captured WITHOUT the
input cache so the scan nodes show real PushedFilters/ReadSchema, and
with AQE off (matching the bench's sub-GB profile) so the initial plan
is the executed plan.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
os.environ.setdefault("SPARK_GRAFT_CACHE_INPUTS", "0")

from flume_hive_batch_sink_spark import registry  # noqa: E402
from flume_hive_batch_sink_spark.registry import load_all_operators  # noqa: E402
from flume_hive_batch_sink_spark.session import get_spark  # noqa: E402

HEADLINE_KEYS = {
    "q1": "agg_group_basic",
    "join3": "join_multiway",
    "topk_window": "topk_per_group",
    "hourly_rollup": "batch_counters",
    "cosine_top100": "llm_sim_topk_pairs",
    "exact_dedup": "llm_exact_dedup",
}


def main() -> int:
    tag, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    sf_dir = rest[0] if rest and "/" in rest[0] else "/root/testdata/sf0.1"
    names = [a for a in rest if "/" not in a] or list(HEADLINE_KEYS)
    out_dir = REPO / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)
    load_all_operators()
    spark = get_spark("capture_plans")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    import contextlib
    import io as _io

    for name in names:
        key = HEADLINE_KEYS.get(name, name)
        df = registry.QUERIES[key](spark, sf_dir)
        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        path = out_dir / f"{name}_{suffix}.txt"
        path.write_text(plan)
        n_ex = plan.count("Exchange")
        print(f"wrote {path}  (Exchange x{n_ex})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
