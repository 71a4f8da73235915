#!/usr/bin/env python
"""LSH bucket-width diagnostic: the instrument that localized the
round-13 sf100rv ENOSPC to band-key entropy exhaustion (SCALE.md).

Aggregates the (band_idx, band_key) width distribution WITHOUT ever
materializing candidate pairs — Σw² bounds the pre-distinct pair count,
hot_w2 shows how much of it the >cap tier owns, and the top-10 widths
identify degenerate buckets (at a fixed small vocabulary, a token
ranked low in both of a band's permutations buckets every doc
containing it). Run this BEFORE a dedup campaign on a new corpus to
size the candidate volume.

Usage: python scripts/probe_minhash_diag.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from flume_hive_batch_sink_spark.io import load  # noqa: E402
from flume_hive_batch_sink_spark.llm.dedup import (  # noqa: E402
    _BUCKET_CAP,
    minhash_bands,
    token_arrays,
)
from flume_hive_batch_sink_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else str(
        REPO / "testdata" / "sf100rv"
    )
    spark = get_spark("minhash_diag")
    docs = load(spark, sf, "documents")
    bands = minhash_bands(token_arrays(docs))
    t0 = time.perf_counter()
    widths = bands.groupBy("band_idx", "band_key").agg(
        F.count("*").alias("w")
    )
    cap = F.lit(_BUCKET_CAP)
    w2 = F.col("w") * F.col("w")
    stats = widths.agg(
        F.count("*").alias("n_buckets"),
        F.sum("w").alias("n_rows"),
        F.max("w").alias("max_w"),
        F.sum(w2).alias("sum_w2"),
        F.sum(F.when(F.col("w") > cap, w2).otherwise(0)).alias("hot_w2"),
        F.sum(F.when(F.col("w") > cap, 1).otherwise(0)).alias("hot_buckets"),
        F.sum(F.when(F.col("w") > cap, F.col("w")).otherwise(0)).alias(
            "hot_rows"
        ),
    ).collect()[0]
    print(dict(stats.asDict()), f"{time.perf_counter() - t0:.1f}s", flush=True)
    top = widths.orderBy(F.col("w").desc()).limit(10).collect()
    print("top widths:", [r["w"] for r in top], flush=True)


if __name__ == "__main__":
    main()
