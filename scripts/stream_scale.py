#!/usr/bin/env python
"""Round-12 streaming STATE-scale rehearsal: the stateful streaming
shapes over chunked replay with the RocksDB state store provider.

The round-11 sf10 rehearsal was batch-only; this is the streaming axis
— the reference's core competency (an unbounded channel drained into
Hive). Five shapes, each the dataflow of a registered stream_* key,
run over N ts-ordered micro-batches so the watermark actually ADVANCES
between batches and state eviction is observable:

  windowed_agg   stream_watermark's shape: watermark + 1h tumbling agg,
                 append mode. State = open windows; eviction = windows
                 the watermark passed.
  dedup_wm       stream_dedup_wm's shape: dropDuplicatesWithinWatermark
                 on event_id. State = ids within the watermark horizon;
                 on a ts-ordered replay this is the shape whose state
                 would be O(corpus) without eviction.
  ss_join        stream_stream_join's shape: purchases⋈signups within
                 2h, watermarks both sides. State = buffered rows both
                 sides inside the horizon.
  custom_state   stream_custom_state's shape: applyInPandasWithState
                 per-user counters (NoTimeout — state is bounded by
                 |users|, the documented contract; no eviction
                 expected).
  custom_state_ttl  stream_custom_state_ttl's shape (round 13): the
                 same counters under EventTimeTimeout with a 45-min
                 TTL and sentinel-closed replay — eviction > 0 and
                 final state ≪ |users| is the whole point.
  session_window stream_session_window's shape (round 13): native
                 session_window agg — the most state-intensive shape
                 (windows MERGE across batches, not just accumulate);
                 closed sessions must evict behind the watermark.
  agg_complete   stream_agg_update's shape: complete-mode groupBy
                 event_type (state bounded by key cardinality).

Per shape we record, from StreamingQueryProgress: per-batch input rows,
batch duration, watermark, and the state operator's numRowsTotal /
numRowsUpdated / numRowsRemoved + stateMemory / RocksDB customMetrics —
the evidence that (a) eviction actually shrinks state and (b) final
state is bounded ≪ input rows. Output goes to the noop sink: the
pipeline runs end-to-end but nothing data-sized is collected.

Usage: python scripts/stream_scale.py [sf_dir] [n_chunks]
Prints one JSON document; tee into artifacts/round12_stream_<sf>.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from flume_hive_batch_sink_spark.session import get_spark  # noqa: E402
from flume_hive_batch_sink_spark.streaming import harness  # noqa: E402

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def _state_summary(progress: list[dict]) -> dict:
    """Fold the per-batch progress into the numbers SCALE.md needs."""
    batches = []
    total_removed = 0
    final_total = 0
    mem_bytes = 0
    for p in progress:
        ops = p.get("stateOperators") or []
        row = {
            "batchId": p.get("batchId"),
            "input_rows": p.get("numInputRows"),
            "batch_ms": (p.get("durationMs") or {}).get("triggerExecution"),
            "watermark": (p.get("eventTime") or {}).get("watermark"),
        }
        if ops:
            op = ops[0]
            row.update(
                state_rows=op.get("numRowsTotal"),
                updated=op.get("numRowsUpdated"),
                removed=op.get("numRowsRemoved"),
            )
            total_removed += op.get("numRowsRemoved") or 0
            # explicit None checks: a final batch that fully DRAINED its
            # state reports numRowsTotal=0, which is a legitimate value —
            # `or` would silently keep the previous batch's nonzero count
            v = op.get("numRowsTotal")
            final_total = v if v is not None else final_total
            m = op.get("stateMemory")
            if m is None:
                m = op.get("memoryUsedBytes")
            mem_bytes = m if m is not None else mem_bytes
            cm = op.get("customMetrics") or {}
            sst = cm.get("rocksdbTotalSSTFilesBytes")
            if sst is not None:
                row["rocksdb_sst_bytes"] = sst
        batches.append(row)
    return {
        "n_batches": len(batches),
        "input_rows": sum(b.get("input_rows") or 0 for b in batches),
        "final_state_rows": final_total,
        "total_removed": total_removed,
        "state_mem_bytes": mem_bytes,
        "batches": batches,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark("stream_scale")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB)
    provider = spark.conf.get("spark.sql.streaming.stateStore.providerClass")

    results: dict[str, dict] = {}

    def run(name: str, df, mode: str) -> None:
        t0 = time.perf_counter()
        _, progress = harness.run_with_progress(
            df, f"scale_{name}", mode, spark, fmt="noop"
        )
        wall = round(time.perf_counter() - t0, 2)
        results[name] = {"wall_s": wall, **_state_summary(progress)}
        s = results[name]
        print(
            f"{name:14s} {wall:8.1f}s  batches={s['n_batches']}  "
            f"in={s['input_rows']}  state={s['final_state_rows']}  "
            f"removed={s['total_removed']}",
            file=sys.stderr,
            flush=True,
        )

    # 1. windowed agg with watermark (stream_watermark shape)
    s = harness.replay_chunks(spark, sf_dir, n_chunks=n_chunks)
    run(
        "windowed_agg",
        s.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count("*").alias("n")),
        "append",
    )

    # 2. dedup within watermark (stream_dedup_wm shape) — the shape
    # whose state is O(corpus) unless the watermark evicts
    s = harness.replay_chunks(spark, sf_dir, n_chunks=n_chunks)
    run(
        "dedup_wm",
        s.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
            ["event_id"]
        ),
        "append",
    )

    # 3. stream-stream time-range join (stream_stream_join shape)
    p = (
        harness.replay_chunks(spark, sf_dir, n_chunks=n_chunks)
        .filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "1 hour")
        .alias("p")
    )
    g = (
        harness.replay_chunks(spark, sf_dir, n_chunks=n_chunks)
        .filter(F.col("event_type") == "signup")
        .withWatermark("ts", "1 hour")
        .alias("s")
    )
    run(
        "ss_join",
        p.join(
            g,
            F.expr(
                "p.user_id = s.user_id AND p.ts >= s.ts "
                "AND p.ts <= s.ts + INTERVAL 2 HOUR"
            ),
        ).select(
            F.col("p.event_id").alias("purchase_id"),
            F.col("s.event_id").alias("signup_id"),
        ),
        "append",
    )

    # 4. custom state (stream_custom_state shape): per-user counters
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

    s = harness.replay_chunks(spark, sf_dir, n_chunks=n_chunks)
    run(
        "custom_state",
        s.groupBy("user_id").applyInPandasWithState(
            update,
            "user_id BIGINT, n_events BIGINT",
            "n BIGINT",
            "update",
            GroupStateTimeout.NoTimeout,
        ),
        "update",
    )

    # 4b. custom state with event-time TTL (stream_custom_state_ttl
    # shape): idle users evict; sentinels drain everything at the end
    from flume_hive_batch_sink_spark.streaming import state_ttl

    s = harness.replay_chunks_with_sentinels(
        spark, sf_dir, n_chunks=n_chunks, sentinel_offsets_min=(120, 240)
    )
    run("custom_state_ttl", state_ttl.ttl_counters_stream(spark, s), "update")

    # 4c. native session windows (stream_session_window shape): per-user
    # 6h-gap sessions merge in state and close behind the watermark
    s = harness.replay_chunks(spark, sf_dir, n_chunks=n_chunks)
    run(
        "session_window",
        s.withWatermark("ts", "10 minutes")
        .groupBy("user_id", F.session_window("ts", "6 hours").alias("w"))
        .agg(F.count("*").alias("n")),
        "append",
    )

    # 5. complete-mode aggregate (stream_agg_update shape)
    s = harness.replay_chunks(spark, sf_dir, n_chunks=n_chunks)
    run(
        "agg_complete",
        s.groupBy("event_type").agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        ),
        "complete",
    )

    print(
        json.dumps(
            {
                "metric": "stream_state_scale",
                "sf_dir": sf_dir,
                "n_chunks": n_chunks,
                "state_store_provider": provider,
                "loadavg_1m": round(os.getloadavg()[0], 2),
                "shapes": results,
            }
        )
    )


if __name__ == "__main__":
    main()
