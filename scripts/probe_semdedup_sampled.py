#!/usr/bin/env python
"""Round-15 scale rehearsal for the SAMPLED SemDeDup-kmeans certificate
(VERDICT r14 item 4): the parent key's exact truth tier was the scale
ceiling — 48.5 GB scratch / most of 1,901 s at 500k vectors — while the
operator itself is shuffle-bounded. Two measurements:

1. **emb500k, full sampled certificate** (`llm_semdedup_kmeans_sampled`
   end to end): the SAME operator the parent runs, but the certificate
   truth comes from one linear |sample|·n closure-GEMM pass instead of
   the all-pairs n² job. Expect the truth share of the wall to collapse
   (the operator's multiprobe search is now the whole cost) and peak
   scratch to drop from ~50 GB to the blocked-search working set.

2. **emb5m, truth tier alone** (`_sampled_truth_hits` at 5M vectors):
   the certification method a decade above the parent's ceiling. The
   FULL operator at 5M is not rehearsable in this sandbox — the
   isotropic fixture forces nprobe = 0.8k, so the multiprobe search is
   inherently ~0.8·n² BLAS plus a d-side shuffle ≈ 166 GB (the ENOSPC
   class the r14 blocking fixed at 500k); on a real clustered corpus a
   deployment runs nprobe ≪ k and the operator is list-local. What had
   to be proven at 5M is that the CERTIFICATE no longer needs the n²
   truth job — this measures exactly that path, with scratch bounded by
   the 8k-query sample.

Prints one JSON line; scratch is sampled from the Spark local dirs
every 2 s on a daemon thread (same protocol as probe_dedup_scale.py).
"""

from __future__ import annotations

import json
import math
import os
import sys
import threading
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_5M = 5_000_000
DIM = 64


def gen_emb(out: Path, n: int, seed: int = 7) -> None:
    """Seeded isotropic float32 embeddings — same recipe as
    probe_ivf_joinpath.gen_emb, sized by ``n``."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    writer = None
    chunk = 250_000
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        mat = rng.standard_normal((hi - lo, DIM), dtype=np.float32)
        tbl = pa.table(
            {
                "vec_id": pa.array(range(lo, hi), type=pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(mat.ravel(), type=pa.float32()), DIM
                ).cast(pa.list_(pa.float32())),
                "label": pa.array(
                    (rng.integers(0, 10, hi - lo)).astype("int32")
                ),
            }
        )
        if writer is None:
            writer = pq.ParquetWriter(
                out / "embeddings.parquet", tbl.schema
            )
        writer.write_table(tbl, row_group_size=64 * 1024)
    if writer is not None:
        writer.close()


class ScratchWatcher:
    def __init__(self, dirs: list[str]):
        self.dirs = dirs
        self.peak = 0
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._run, daemon=True)

    def _du(self) -> int:
        total = 0
        for d in self.dirs:
            for root, _, files in os.walk(d):
                for f in files:
                    try:
                        total += os.path.getsize(os.path.join(root, f))
                    except OSError:
                        pass
        return total

    def _run(self):
        while not self._stop.is_set():
            self.peak = max(self.peak, self._du())
            time.sleep(2.0)

    def __enter__(self):
        self._t.start()
        return self

    def __exit__(self, *a):
        self._stop.set()
        self._t.join(timeout=5)


def main() -> None:
    shm = "/dev/shm/spark_probe_sem"
    os.makedirs(shm, exist_ok=True)
    os.environ.setdefault("SPARK_LOCAL_DIRS", f"{shm},/tmp/spark_probe_sem")
    os.makedirs("/tmp/spark_probe_sem", exist_ok=True)

    from flume_hive_batch_sink_spark.io import load
    from flume_hive_batch_sink_spark.llm import similarity as S
    from flume_hive_batch_sink_spark.session import get_spark

    spark = get_spark("semdedup_sampled_probe")
    watch_dirs = [shm, "/tmp/spark_probe_sem"]
    out: dict = {"probe": "semdedup_sampled@r15"}

    # --- tier 1: full sampled certificate at 500k -----------------
    emb500k = REPO / "testdata" / "emb500k"
    if not (emb500k / "embeddings.parquet").exists():
        print("generating emb500k ...", file=sys.stderr, flush=True)
        gen_emb(emb500k, 500_000, seed=7)
    with ScratchWatcher(watch_dirs) as w:
        t0 = time.perf_counter()
        row = S.llm_semdedup_kmeans_sampled(
            spark, str(emb500k)
        ).collect()[0]
        wall = time.perf_counter() - t0
    out["emb500k_certificate"] = {
        "n_vecs": row["n_vecs"],
        "n_sampled": row["n_sampled"],
        "n_true_dups": row["n_true_dups"],
        "precision_ok": row["precision_ok"],
        "recall_ok": row["recall_ok"],
        "wall_sec": round(wall, 1),
        "peak_scratch_gb": round(w.peak / (1 << 30), 2),
    }
    print(json.dumps(out["emb500k_certificate"]), file=sys.stderr, flush=True)

    # --- tier 2: truth tier alone at 5M ---------------------------
    emb5m = REPO / "testdata" / "emb5m"
    if not (emb5m / "embeddings.parquet").exists():
        print("generating emb5m ...", file=sys.stderr, flush=True)
        gen_emb(emb5m, N_5M, seed=11)
    emb = load(spark, str(emb5m), "embeddings")
    n_vec = emb.count()
    with ScratchWatcher(watch_dirs) as w:
        t0 = time.perf_counter()
        truth = S._sampled_truth_hits(emb, n_vec, S._SEMDEDUP_KMEANS_T)
        n_true = truth.count()
        wall = time.perf_counter() - t0
    n_sampled = emb.filter(S._sem_q_pred(n_vec)).count()
    out["emb5m_truth_tier"] = {
        "n_vecs": n_vec,
        "n_sampled": n_sampled,
        "n_true_dups": n_true,
        "wall_sec": round(wall, 1),
        "peak_scratch_gb": round(w.peak / (1 << 30), 2),
        "dots": n_sampled * n_vec,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
