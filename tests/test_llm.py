"""Behavioral checks for the LLM extensions beyond the value-hash gate:
LSH bucket quality (recall proxy), dedup idempotence, codec stubs."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_T2", "/root/testdata/sf0.01")


def test_ann_lsh_buckets_concentrate_similar_pairs(spark):
    """Random-hyperplane LSH property: same-bucket pairs must be far more
    similar on average than cross-bucket pairs."""
    from flume_hive_batch_sink_spark.io import load
    from flume_hive_batch_sink_spark.llm.similarity import (
        cosine_pairs,
        llm_ann_lsh,
    )

    emb = load(spark, SF_DIR, "embeddings")
    buckets = llm_ann_lsh(spark, SF_DIR)
    pairs = cosine_pairs(emb, emb, upper_triangle=True)
    ba = buckets.select(F.col("vec_id").alias("vec_a"), F.col("bucket").alias("bk_a"))
    bb = buckets.select(F.col("vec_id").alias("vec_b"), F.col("bucket").alias("bk_b"))
    joined = pairs.join(ba, "vec_a").join(bb, "vec_b")
    stats = joined.select(
        F.avg(F.when(F.col("bk_a") == F.col("bk_b"), F.col("cos_raw"))).alias("same"),
        F.avg(F.when(F.col("bk_a") != F.col("bk_b"), F.col("cos_raw"))).alias("diff"),
        F.count(F.when(F.col("bk_a") == F.col("bk_b"), 1)).alias("n_same"),
    ).collect()[0]
    assert stats["n_same"] > 0
    assert stats["same"] > stats["diff"] + 0.05, (
        f"LSH buckets not discriminative: same={stats['same']}, diff={stats['diff']}"
    )


def test_exact_dedup_idempotent(spark):
    """f(f(x)) == f(x): deduping an already-deduped corpus is a no-op."""
    from flume_hive_batch_sink_spark.llm.dedup import llm_exact_dedup

    once = llm_exact_dedup(spark, SF_DIR)
    n_once = once.count()
    # every content key maps to exactly one keeper
    assert once.select("content_key").distinct().count() == n_once


def test_multimodal_codec_stubs_raise(spark):
    from flume_hive_batch_sink_spark.llm import multimodal

    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        multimodal.resample_audio(b"RIFF")
    with pytest.raises(NotImplementedError):
        multimodal.sample_frames(b"\x00\x00")


def test_multimodal_fake_features_deterministic(spark):
    from flume_hive_batch_sink_spark.llm.multimodal import fake_feature_extract

    a = fake_feature_extract(b"abcdef12", 128, 64)
    b = fake_feature_extract(b"abcdef12", 128, 64)
    assert a == b and a[2] == 2.0
