"""Determinism gate (SURVEY.md §5.2.5): run the seed- or order-sensitive
operators twice and require identical canonical results.

The DuckDB oracle pins values once; this gate catches the class of bug
the oracle can miss on a lucky run — unseeded randomness, partition-order
dependence (collect_list without sort), tie-breaks left to the planner —
before the driver's double execution does.
"""

from __future__ import annotations

import os

import pytest

from flume_hive_batch_sink_spark import registry
from flume_hive_batch_sink_spark.registry import load_all_operators

load_all_operators()

# Slow tier (round-16): double-execution determinism sweep over ~150 keys (~10 min). Deselected by the default run
# (pytest.ini addopts); the committed round gate runs -m "".
pytestmark = pytest.mark.slow

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_T2", "/root/testdata/sf0.01")

# the keys where nondeterminism could plausibly hide: hash families,
# pandas kernels, window tie-breaks, approximate sketches, collects
RISKY = [
    "llm_ann_lsh",
    "llm_ann_ivf",
    "llm_near_dedup_minhash",
    "llm_sim_topk_pairs",
    "llm_knn_label",
    "agg_approx_distinct",
    "agg_collect",
    "udf_grouped_map",
    "topk_per_group",
    "limit_topk",
    "llm_dup_clusters",
    "sample_stratified",
    "split_train_test",
    "ts_hourly_ohlc",
    "etl_merge_upsert",
    "llm_domain_mix",
    "llm_pack_sequences",
    "llm_curation_pipeline",
    "agg_approx_quantile",
    "sketch_hll_merge",
    "sketch_cms_counts",
    "win_count_distinct_over",
    "ts_interpolate",
    "llm_semdedup",
    "llm_semdedup_kmeans",
    "llm_ann_ivf_kmeans",
    "win_ntile_approx",
    # round-5 additions: hash-based sampling/dedup and iterative/graph
    # operators where partition order or float summation could hide
    "graph_pagerank",
    "graph_triangles",
    "llm_substring_dup_spans",
    "llm_containment_dedup",
    "sketch_bloom_prejoin",
    "sample_weighted_poisson",
    "multimodal_decode_jpeg",
    "llm_curation_pipeline_v2",
    "graph_pointer_doubling_depth",
    "etl_zorder_layout",
    "etl_incremental_agg_merge",
    "etl_table_diff",
    # round-5 continuation: PQ codes/ranking, BPE argmax-merge loop,
    # reservoir hash ranks, CDC last-writer ranks, streak tie-breaks,
    # weighted-median crossing index, overwrite read-back
    "llm_ann_pq",
    "llm_bpe_merges",
    "sample_reservoir_group",
    "etl_cdc_apply",
    "win_streak_islands",
    "ts_asof_tolerance",
    "agg_weighted_median",
    "etl_dynamic_partition_overwrite",
    "agg_entropy",
    "llm_unigram_logprob",
    "dq_anomaly_mad",
    "ts_ewma_window",
    "win_event_pattern",
    "graph_kcore",
    "join_range_pointin",
    "join_temporal_validity",
    "multimodal_phash_dedup",
    "fn_url_normalize",
    "llm_embed_quantize_int8",
    "dq_skew_audit",
    "multimodal_audio_vad",
    "graph_degree_dist",
    "win_rolling_median",
    "sample_kcenter_diverse",
    "llm_bigram_logprob",
    "join_fuzzy_levenshtein",
    "agg_moments_merge",
    "multimodal_patchify",
    "fn_ip_cidr",
    "ingest_dlq_routing",
    "etl_cascade_delete_audit",
    "sql_text_api_cte",
    "ts_cusum_changepoint",
    "agg_abc_pareto",
    "dq_constraint_suite",
    "llm_dedup_rep_quality",
    "pipeline_bounce_rate",
    "pipeline_attribution_touch",
    "agg_markov_transitions",
    "agg_distinct_set_ops",
    "fn_geo_haversine",
    "llm_lexical_diversity",
    "agg_histogram_equidepth",
    "dq_observe_metrics",
    "llm_hard_negative_mining",
    "agg_gini_spend",
    "sketch_hll_intersection",
    "llm_prefix_dup",
    "pipeline_weekly_churn",
    "join_null_safe",
    "pipeline_new_returning",
    "fn_uuid_deterministic",
    "fn_encoding_roundtrip",
    "pipeline_cohort_ltv",
    "pipeline_session_paths",
    "agg_argmax_minmax_by",
    "etl_partition_manifest_checksum",
    "agg_share_of_total",
    # round-6 additions: hash-based assignment/selection, rank
    # tie-breaks, window minima over tie-prone hash arrays
    "sample_ab_assignment",
    "sample_balanced_classes",
    "llm_winnowing_fingerprint",
    "pipeline_rfm",
    "pipeline_market_basket",
    "graph_common_neighbors",
    "ts_peak_concurrency",
    "sketch_kmv_distinct",
    "llm_zipf_fit",
    "graph_adamic_adar",
    "llm_source_overlap_matrix",
    "win_skyline_2d",
    "agg_trimmed_winsorized",
    "ts_calendar_heatmap",
    "llm_lsh_band_pr",
    "llm_epoch_shuffle",
    "llm_incremental_dedup",
    "pipeline_abc_xyz",
    "agg_hhi_concentration",
    "join_spatial_grid",
    "ts_stl_anomaly",
    "dq_ks_test",
    "sample_group_holdout",
    # round-7 additions: binned Lorenz ranks, trained-quantizer A/B
    # (k-means sample selection + argmax encode both hash/tie-prone)
    "agg_gini_binned",
    "llm_ann_pq_trained",
    "split_temporal",
    "llm_minhash_estimate_sampled",
    "llm_lsh_band_pr_sampled",
    # round-9 additions: decimal-summed log-ratio keep flag (DSIR),
    # packed float-argmin bucket assignment, support-thresholded pair
    # counts over a self-join
    "llm_dsir_importance",
    "multimodal_aspect_bucket",
    "graph_copurchase_projection",
    "llm_lsh_band_sweep",
    "llm_bm25_topdocs",
    # round-10 additions: pow()-derived mixing weights behind a
    # round-then-DECIMAL normalizer, float-ordered budget window with
    # doc_id tiebreak, dup-label window over a hashed text key
    "llm_temperature_mix",
    "sample_token_budget",
    "llm_quality_calibration",
    # round-11 additions: float tertile cutoffs behind a 6-dp round
    # (ULP-tie-prone CASE thresholds), bucket-blocked overlap join whose
    # one-canonical-bucket dedup must not double-count pairs
    "llm_ccnet_perplexity_bucket",
    "join_interval_overlap",
    # round-11 tail: greedy integer-weighted merge argmax (lexicographic
    # ties), integer-µs |dt| pick with at-or-before tie rule, exact-
    # integer triangle argmax with event_id tiebreak
    "llm_bpe_encode",
    "join_asof_nearest",
    "ts_downsample_lttb",
    # round-12 additions: decimal-summed entropy behind a 6-dp keep
    # threshold, count-tie trigram ranks, closed-form CI doubles,
    # session windows emitted under a watermark cutoff, rank-exact
    # tertile cutoffs (rewritten this round)
    "llm_char_entropy_filter",
    "llm_wimbd_topngrams",
    "agg_ratio_ci_wilson",
    "stream_session_window",
    # round-13 addition: TTL eviction emissions — the per-user SUM must
    # be batching- and timing-invariant across two full replays
    "stream_custom_state_ttl",
]


def canonical(df) -> list[tuple]:
    rows = [tuple(r) for r in df.collect()]
    return sorted(rows, key=repr)


@pytest.mark.parametrize("key", RISKY)
def test_double_run_identical(spark, key):
    fn = registry.QUERIES[key]
    assert canonical(fn(spark, SF_DIR)) == canonical(fn(spark, SF_DIR))


# Round-15 (VERDICT r14 #2): partition-count invariance. These keys
# emit ROUNDED float aggregates; a plain round(avg(double), k) flips on
# rounding-boundary cells whenever partial-agg accumulation order
# changes — which is exactly what a real cluster's different input
# splits do. ts_gapfill_ffill / ts_interpolate sat on 4 such boundary
# cells at sf0.01 and are now computed order-free (timeseries._avg4);
# this gate repartitions EVERY input to 1, 7, and 32 partitions via the
# io.load hook and requires bit-identical canonical output, so the
# fragility class cannot silently return.
PARTITION_SENSITIVE = [
    "ts_gapfill_ffill",
    "ts_interpolate",
    "agg_group_basic",  # round(avg(l_quantity),4) — integer-valued, must stay safe
    "agg_entropy",      # the round-then-DECIMAL reference recipe
    "win_sliding_frame",  # frame-ordered window avg — order fixed by ORDER BY
    # round-15 widening: every remaining round(avg(continuous-double))
    # grouped-agg key outside the original timeseries sweep scope —
    # the same latent class, gated rather than assumed safe
    "agg_cube",                 # round(avg(o_totalprice),4)
    "agg_conditional",          # round(avg(value>100),4)
    "agg_trimmed_winsorized",   # three round(avg(price-ish),4) columns
    "pipeline_ship_sla",        # round(avg(datediff),4) — int-valued terms
    "llm_embedding_norm_audit", # round(avg(nrm),4)
    "llm_text_stats",           # round(avg(token counts),4) — int-valued
    "llm_lang_filter_pipeline", # round(avg(n_chars),4) — int-valued
    # round-15 numpy kernels that emit BATCH-LOCAL top-k merged by a
    # final window: result must be invariant to how rows land in
    # batches/partitions (the global-winner-is-a-local-winner argument)
    "llm_ann_pq",
    "llm_hard_negative_mining",
]


@pytest.mark.parametrize("key", PARTITION_SENSITIVE)
def test_partition_count_invariant(spark, key):
    fn = registry.QUERIES[key]
    results = []
    for n in ("1", "7", "32"):
        os.environ["SPARK_GRAFT_REPARTITION_INPUTS"] = n
        try:
            results.append(canonical(fn(spark, SF_DIR)))
        finally:
            os.environ.pop("SPARK_GRAFT_REPARTITION_INPUTS", None)
    assert results[0] == results[1] == results[2], (
        f"{key}: output varies with input partition count — "
        "aggregation-order-fragile rounding"
    )
