import sys, time
from pathlib import Path
REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
from pyspark.sql import functions as F
from flume_hive_batch_sink_spark.session import get_spark
from flume_hive_batch_sink_spark.io import load
from flume_hive_batch_sink_spark.llm.dedup import token_arrays, minhash_bands
spark = get_spark("minhash_diag")
sf = str(REPO / "testdata" / "sf100rv")
docs = load(spark, sf, "documents")
bands = minhash_bands(token_arrays(docs))
t0 = time.perf_counter()
widths = bands.groupBy("band_idx", "band_key").agg(F.count("*").alias("w"))
stats = widths.agg(
    F.count("*").alias("n_buckets"),
    F.sum("w").alias("n_rows"),
    F.max("w").alias("max_w"),
    F.sum(F.col("w") * F.col("w")).alias("sum_w2"),
    F.sum(F.when(F.col("w") > 64, F.col("w") * F.col("w")).otherwise(0)).alias("hot_w2"),
    F.sum(F.when(F.col("w") > 64, 1).otherwise(0)).alias("hot_buckets"),
    F.sum(F.when(F.col("w") > 64, F.col("w")).otherwise(0)).alias("hot_rows"),
).collect()[0]
print(dict(stats.asDict()), f"{time.perf_counter()-t0:.1f}s", flush=True)
top = widths.orderBy(F.col("w").desc()).limit(10).collect()
print([r["w"] for r in top], flush=True)
