#!/usr/bin/env python
"""Round-15 PQ/ADC constant-factor profile (VERDICT r14 item 7):
llm_ann_pq measured 348.5 s over 500k vectors in the round-14
rehearsal — linear, but ~27× llm_ann_lsh's wall on the same fixture.
This probe breaks the wall down by stage and A/Bs the round-15
scaled-int64 kernels against the decimal reference on emb500k:

- encode: |corpus|·m·k kernel evaluations (64M sqdist kernels at 500k)
- exact truth tier: |corpus|·|q| full 64-term dot kernels (128M)
- adc scan: |corpus|·|q| 8-term LUT walks (128M)

Hypothesis under test: the wall is BigDecimal allocation in Spark's
decimal arithmetic (one object per add/cast, inside the hottest loops),
not shuffle or scan — the int64 twins keep the same exact values
(tests/test_quantizer.py::TestPQInt64Kernels pins bit-identity) while
staying allocation-free in whole-stage codegen.

Prints one JSON line with per-stage walls for both kernel paths.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark_pq,/tmp/spark_pq")
    os.makedirs("/dev/shm/spark_pq", exist_ok=True)
    os.makedirs("/tmp/spark_pq", exist_ok=True)

    from pyspark.sql import functions as F

    from flume_hive_batch_sink_spark.io import load
    from flume_hive_batch_sink_spark.llm import similarity as S
    from flume_hive_batch_sink_spark.session import get_spark

    sf_dir = str(REPO / "testdata" / "emb500k")
    if not Path(sf_dir, "embeddings.parquet").exists():
        print("emb500k fixture missing — run probe_ivf_joinpath first",
              file=sys.stderr)
        sys.exit(2)

    spark = get_spark("pq_profile")
    emb = load(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", S._as_double("embedding").alias("e"))

    def stage_encode() -> int:
        anch = (
            e.filter(F.col("vec_id") % S._PQ_ANCHOR_MOD == 3)
            .orderBy("vec_id")
            .limit(S._PQ_K)
        )
        codebook = S._pq_sub_explode(
            anch.select(F.col("vec_id").alias("cid"), "e"), F.col("e"), "cs"
        )
        par = spark.sparkContext.defaultParallelism
        sqd_kernel = (
            S._LONG_SQDIST if S._PQ_INT64_KERNELS else S._DEC_SQDIST
        )
        subv = S._pq_sub_explode(e, F.col("e"), "vs").repartition(par)
        enc0 = subv.join(F.broadcast(codebook), "s").withColumn(
            "sqd", F.expr(sqd_kernel.format(a="vs", b="cs"))
        )
        codes = (
            enc0.groupBy("vec_id", "s")
            .agg(F.min(F.struct("sqd", "cid")).alias("mn"))
            .select("vec_id", "s", F.col("mn.cid").alias("cid"))
        )
        return codes.count()

    def stage_exact() -> int:
        return S._pq_exact_top10(e).count()

    def stage_full() -> int:
        return S.llm_ann_pq(spark, sf_dir).count()

    out: dict = {"probe": "pq_profile@emb500k", "stages": {}}
    for path_name, flag in (("int64", True), ("decimal", False)):
        S._PQ_INT64_KERNELS = flag
        rec = {}
        for stage_name, fn in (
            ("encode", stage_encode),
            ("exact_truth", stage_exact),
            ("full_operator", stage_full),
        ):
            t0 = time.perf_counter()
            n = fn()
            rec[stage_name] = {
                "wall_sec": round(time.perf_counter() - t0, 1),
                "rows": n,
            }
            print(f"{path_name}/{stage_name}: {rec[stage_name]}",
                  file=sys.stderr, flush=True)
        out["stages"][path_name] = rec
    S._PQ_INT64_KERNELS = True
    full_dec = out["stages"]["decimal"]["full_operator"]["wall_sec"]
    full_int = out["stages"]["int64"]["full_operator"]["wall_sec"]
    out["speedup_full"] = round(full_dec / max(full_int, 0.1), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
