"""Deterministic sampling and dataset splitting for training pipelines.

Training-data pipelines need splits and samples that are (a) stable
across reruns and cluster sizes, (b) free of coordination, and (c)
derivable per-row. ``rand()``-based sampling fails (a) the moment
partitioning changes; the standard fix is content-addressed bucketing:
hash a stable key with a salt, and map hash ranges to splits. md5 is
used (not xxhash64) because its hex output is bit-identical across
engines, making the operators oracle-checkable — at 100 TB the same
code runs unchanged, one codegen'd digest per row, no shuffle at all
until the final audit aggregation.

Hex-string range thresholds: two lowercase hex chars order
lexicographically exactly like their numeric value, so thresholds like
``< 'cc'`` (204/256 ≈ 79.7%) define precise, engine-agnostic rate
cuts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_hive_batch_sink_spark.io import load
from flume_hive_batch_sink_spark.registry import query


def _bucket(key_col, salt: str):
    """First two hex chars of md5(key || ':' || salt) — a uniform,
    deterministic 256-bucket assignment computed in codegen."""
    return F.substring(
        F.md5(F.concat(key_col.cast("string"), F.lit(":" + salt))), 1, 2
    )


@query(
    "split_train_test",
    oracle="""
    SELECT split, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM (
      SELECT CASE WHEN h < 'cc' THEN 'train'
                  WHEN h < 'e6' THEN 'val'
                  ELSE 'test' END AS split,
             n_chars
      FROM (
        SELECT n_chars,
               substring(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 2) AS h
        FROM documents
      )
    )
    GROUP BY split
    """,
)
def split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~80/10/10 train/val/test split of the corpus by
    content-addressed hash of doc_id. Any executor can classify any row
    with zero coordination; re-running on re-partitioned (or re-grown)
    data never reassigns an existing document. Output is the split
    audit (counts + char volume per split)."""
    d = load(spark, sf_dir, "documents")
    h = _bucket(F.col("doc_id"), "split")
    split = (
        F.when(h < "cc", "train").when(h < "e6", "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@query(
    "sample_stratified",
    oracle="""
    SELECT doc_id, lang
    FROM (
      SELECT doc_id, lang,
             substring(md5(CAST(doc_id AS VARCHAR) || ':sample'), 1, 2) AS h
      FROM documents
    )
    WHERE h < (CASE WHEN lang = 'en' THEN '1a' ELSE '67' END)
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic downsampling: English (the
    overrepresented stratum in web corpora) kept at ~10% ('1a'/256),
    every other language at ~40% ('67'/256) — the standard corpus
    rebalancing move, expressed as a per-row hash threshold keyed by
    stratum. Pure filter: no shuffle, no state, same sample under any
    partitioning."""
    d = load(spark, sf_dir, "documents")
    h = _bucket(F.col("doc_id"), "sample")
    threshold = F.when(F.col("lang") == "en", "1a").otherwise("67")
    return d.filter(h < threshold).select("doc_id", "lang")
