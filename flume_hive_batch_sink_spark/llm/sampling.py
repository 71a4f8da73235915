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


# Target corpus mixture by language — the domain-reweighting move
# (DoReMi-style targets, fixed here as part of the operator contract).
_MIX_TARGETS = {"en": 0.4, "zh": 0.25, "de": 0.15, "es": 0.1, "fr": 0.1}

_MIX_CASE_SQL = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in _MIX_TARGETS.items())
    + " ELSE 0.0 END"
)

_DOMAIN_MIX_ORACLE = f"""
    WITH counts AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_total
      FROM documents GROUP BY lang
    ), tot AS (SELECT CAST(sum(n_total) AS DOUBLE) AS t FROM counts),
    rates AS (
      SELECT lang, n_total,
             CAST(FLOOR(LEAST(1.0, ({_MIX_CASE_SQL}) * t / n_total) * 256)
                  AS INT) AS thr_int
      FROM counts, tot
    ), thr AS (
      SELECT lang, n_total,
             CASE WHEN thr_int >= 256 THEN 'zz'
                  ELSE printf('%02x', thr_int) END AS thr_hex
      FROM rates
    ), kept AS (
      SELECT d.lang
      FROM documents d JOIN thr r ON d.lang = r.lang
      WHERE substring(md5(CAST(d.doc_id AS VARCHAR) || ':mix'), 1, 2)
            < r.thr_hex
    )
    SELECT r.lang, r.n_total, CAST(count(k.lang) AS BIGINT) AS n_kept
    FROM thr r LEFT JOIN kept k ON k.lang = r.lang
    GROUP BY r.lang, r.n_total
"""


@query("llm_domain_mix", oracle=_DOMAIN_MIX_ORACLE)
def llm_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain mixing: downsample each language toward a target mixture.
    Per-language keep-rates are derived from the actual counts (rate =
    min(1, target_share · total / n_lang)), quantized to a 256-bucket
    hex threshold, and applied with the same content-addressed md5
    bucketing as the other samplers — so the realized subsample is
    deterministic under any partitioning and repeatable as the corpus
    grows. The rate table is a per-language aggregate broadcast back
    onto the corpus: no shuffle of the documents themselves. Output is
    the mixture audit (kept vs total per language). Rates ≥ 1 map to a
    sentinel threshold above the hex alphabet ('zz') — keep-all —
    because floor(256) would render as 3 hex chars and break the
    2-char lexicographic compare. The rate arithmetic uses the same
    left-associated target*total/n expression in both engines so the
    double results are bit-identical."""
    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count("*").cast("long").alias("n_total"))
    tot = counts.agg(F.sum("n_total").cast("double").alias("t"))

    target = F.lit(0.0)
    for k, v in _MIX_TARGETS.items():
        target = F.when(F.col("lang") == k, F.lit(v)).otherwise(target)
    # NOTE: (target * t) / n_total — same association as the oracle SQL
    thr_int = F.floor(
        F.least(F.lit(1.0), target * F.col("t") / F.col("n_total")) * 256
    ).cast("int")
    thr = (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "n_total",
            F.when(thr_int >= 256, F.lit("zz"))
            .otherwise(F.format_string("%02x", thr_int))
            .alias("thr_hex"),
        )
    )
    h = _bucket(F.col("doc_id"), "mix")
    kept = (
        d.join(F.broadcast(thr), "lang")
        .filter(h < F.col("thr_hex"))
        .groupBy("lang")
        .agg(F.count("*").cast("long").alias("n_kept"))
    )
    return (
        thr.join(kept, "lang", "left")
        .select(
            "lang",
            "n_total",
            F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
        )
    )
