#!/usr/bin/env python
"""Round-14 probe (VERDICT r13 item 7): exercise the IVF closure-budget
fallback (_centroid_probes_join, the blocked-GEMM assignment) at real
size instead of only under a test monkeypatch.

Two measurements, one JSON line each:

1. identity@500k — generate a 500k×64 embeddings fixture
   (testdata/emb500k, seeded, same recipe as gen_sf.py), build the
   trained quantizer once, run centroid assignment through BOTH paths
   (closure kernel vs blocked-GEMM join) and compare the full
   (vec_id, cid, probes) relation distributed (join + mismatch count —
   never collected): the dispatch must be invisible bit-for-bit.
2. end_to_end@sf10rv — run the whole llm_ann_ivf_kmeans operator (the
   200k-vector search, Σ|cluster|² inverted-list GEMM included) with
   the closure budget forced to 0 so the join path carries training +
   assignment end-to-end; record wall and the recall certificate.

Usage: python scripts/probe_ivf_joinpath.py
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_VEC = 500_000
DIM = 64


def gen_emb(out: Path) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(77)
    out.mkdir(parents=True, exist_ok=True)
    vecs = rng.normal(size=(N_VEC, DIM)).astype(np.float32)
    dup = rng.choice(
        np.arange(N_VEC // 10, N_VEC), int(0.05 * N_VEC), replace=False
    )
    src = rng.integers(0, N_VEC // 10, dup.size)
    vecs[dup] = vecs[src] + rng.normal(
        scale=0.01, size=(dup.size, DIM)
    ).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    pq.write_table(
        pa.table(
            {
                "vec_id": np.arange(N_VEC, dtype=np.int64),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(vecs.ravel(), type=pa.float32()), DIM
                ).cast(pa.list_(pa.float32())),
                "label": rng.integers(0, 10, N_VEC).astype(np.int32),
            }
        ),
        out / "embeddings.parquet",
        row_group_size=16 * 1024,
    )


def main() -> None:
    shm = "/dev/shm/spark_probe"
    os.makedirs(shm, exist_ok=True)
    os.environ.setdefault("SPARK_LOCAL_DIRS", f"{shm},/tmp")

    from pyspark.sql import functions as F

    from flume_hive_batch_sink_spark.io import load
    from flume_hive_batch_sink_spark.llm import similarity as S
    from flume_hive_batch_sink_spark.session import get_spark

    emb_dir = REPO / "testdata" / "emb500k"
    if not (emb_dir / "embeddings.parquet").exists():
        print("generating emb500k fixture ...", file=sys.stderr, flush=True)
        gen_emb(emb_dir)

    spark = get_spark("ivf_joinpath_probe")
    emb = load(spark, str(emb_dir), "embeddings")
    n = emb.count()
    k = S._quantizer_k(n)
    nprobe = max(1, math.ceil(0.8 * k))
    cent = S._kmeans_centroids(emb, k, n_vec=n)
    e_df = emb.select("vec_id", S._as_double("embedding").alias("e"))

    t0 = time.perf_counter()
    closure = S._centroid_probes(e_df, cent, nprobe)
    n_closure = closure.count()
    t_closure = time.perf_counter() - t0

    budget0 = S._ASSIGN_CLOSURE_DOUBLES
    S._ASSIGN_CLOSURE_DOUBLES = 0
    try:
        t0 = time.perf_counter()
        joined = S._centroid_probes(e_df, cent, nprobe)
        n_join = joined.count()
        t_join = time.perf_counter() - t0

        both = closure.alias("a").join(joined.alias("b"), "vec_id")
        mismatches = both.filter(
            (F.col("a.cid") != F.col("b.cid"))
            | (F.col("a.probes") != F.col("b.probes"))
        ).count()
        print(
            json.dumps(
                {
                    "probe": "identity@emb500k",
                    "n_vec": n,
                    "k": k,
                    "nprobe": nprobe,
                    "closure_sec": round(t_closure, 1),
                    "join_sec": round(t_join, 1),
                    "rows": [n_closure, n_join],
                    "mismatches": mismatches,
                }
            ),
            flush=True,
        )

        sf10rv = str(REPO / "testdata" / "sf10rv")
        t0 = time.perf_counter()
        row = S.llm_ann_ivf_kmeans(spark, sf10rv).collect()[0]
        print(
            json.dumps(
                {
                    "probe": "end_to_end_joinpath@sf10rv",
                    "wall_sec": round(time.perf_counter() - t0, 1),
                    "n_queries": row["n_queries"],
                    "recall_ok": bool(row["recall_ok"]),
                }
            ),
            flush=True,
        )
    finally:
        S._ASSIGN_CLOSURE_DOUBLES = budget0


if __name__ == "__main__":
    main()
