"""Corpus mixing, token budgeting, and quality-score calibration.

Three curation-tuning operators a training-data pipeline runs between
"corpus is clean" and "corpus is a training mix":

- temperature mixing (the multilingual-LM sampling scheme popularized
  by multilingual BERT/XLM-R data prep): domain sampling weights
  w_i ∝ p_i^τ flatten the empirical distribution so low-resource
  domains are up-sampled without drowning the head;
- token-budget selection: each source contributes its best documents
  up to a fixed token budget — the knapsack-shaped step that turns a
  quality score into an actual corpus cut;
- quality-score calibration: bucket the score and measure, per bucket,
  the rate of an independent badness signal (exact duplication) — the
  curve that tells you whether the score is worth thresholding on.

All three follow the repo's oracle-compatibility conventions: discrete
choices (bucket ids, keep/drop) derive from exact integer or
lexicographic comparisons, float metrics are rounded on both sides,
multi-row double sums go round-then-DECIMAL so aggregation order never
shows, and sampling/ordering is content-addressed (deterministic under
any partitioning). This module is imported LAST in
``load_all_operators`` so its keys append to the END of the registry —
the driver-sampling rotation orders never-checked keys by registry
position, and inserting earlier would reshuffle the attested prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flume_hive_batch_sink_spark.io import load
from flume_hive_batch_sink_spark.registry import query

# Mixing temperature: τ=0.7 is the conventional multilingual flattening
# point (τ=1 keeps the empirical mix, τ→0 approaches uniform).
_MIX_TAU = 0.7

# Per-source token budget for the selection audit. At sf0.01 each of
# the 20 sources holds ~925 tokens, so 500 forces a real cut (some
# docs kept, some dropped — never vacuous); at sf1 it keeps ~0.5% and
# exercises the same plan at 100x the per-source backlog.
_TOKEN_BUDGET = 500


@query(
    "llm_temperature_mix",
    oracle=f"""
    WITH per AS (
      SELECT lang,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY lang
    ), tot AS (
      SELECT CAST(SUM(n_tokens) AS DOUBLE) AS t FROM per
    ), powed AS (
      SELECT lang, n_docs, n_tokens,
             n_tokens / t.t AS p,
             ROUND(POW(n_tokens / t.t, {_MIX_TAU}), 12) AS ptau
      FROM per, tot t
    ), z AS (
      SELECT CAST(SUM(CAST(ptau AS DECIMAL(18,12))) AS DOUBLE) AS z
      FROM powed
    )
    SELECT lang, n_docs, n_tokens,
           CAST(ROUND(p, 6) AS DOUBLE) AS p_raw,
           CAST(ROUND(ptau / z.z, 6) AS DOUBLE) AS w_temp,
           CAST(ROUND(ptau / z.z / p, 6) AS DOUBLE) AS boost
    FROM powed, z
    """,
)
def llm_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain mixing weights: per language, the
    empirical token share p_i and the sampling weight
    w_i = p_i^τ / Σ_j p_j^τ at τ=0.7, plus boost = w_i/p_i (the
    oversampling factor a data loader applies per domain — >1 means
    the domain is repeated, <1 means it is subsampled). This is the
    weight table llm_domain_mix-style downsampling consumes when the
    target mixture is derived from the corpus itself rather than set
    by hand.

    Plan shape: one hash aggregate over the corpus (token counts are
    map-side size(split()) — no explode), then everything else is
    algebra on a |domains|-row relation with two broadcast 1-row
    totals; nothing quadratic, nothing windowed, scale-independent of
    corpus size. Oracle compatibility: pow() is rounded to 12dp on
    both sides before the normalizer sum (which is round-then-DECIMAL,
    so aggregation order can't show), and all reported metrics round
    to 6dp — no discrete choice depends on a float."""
    d = load(spark, sf_dir, "documents")
    per = d.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.size(F.split("text", " ")))
        .cast("long")
        .alias("n_tokens"),
    )
    tot = per.agg(F.sum("n_tokens").cast("double").alias("t"))
    powed = per.join(F.broadcast(tot), F.lit(True)).select(
        "lang",
        "n_docs",
        "n_tokens",
        (F.col("n_tokens") / F.col("t")).alias("p"),
        F.round(
            F.pow(F.col("n_tokens") / F.col("t"), F.lit(_MIX_TAU)), 12
        ).alias("ptau"),
    )
    z = powed.agg(
        F.sum(F.col("ptau").cast("decimal(18,12)"))
        .cast("double")
        .alias("z")
    )
    return powed.join(F.broadcast(z), F.lit(True)).select(
        "lang",
        "n_docs",
        "n_tokens",
        F.round("p", 6).alias("p_raw"),
        F.round(F.col("ptau") / F.col("z"), 6).alias("w_temp"),
        F.round(F.col("ptau") / F.col("z") / F.col("p"), 6).alias("boost"),
    )


@query(
    "sample_token_budget",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
             len(list_distinct(string_split(text, ' ')))
               / CAST(len(string_split(text, ' ')) AS DOUBLE) AS q
      FROM documents
    ), ranked AS (
      SELECT source, toks, q,
             SUM(toks) OVER (
               PARTITION BY source ORDER BY q DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum
      FROM scored
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN cum <= {_TOKEN_BUDGET} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(SUM(toks) AS BIGINT) AS tokens_total,
           CAST(SUM(CASE WHEN cum <= {_TOKEN_BUDGET} THEN toks ELSE 0 END)
                AS BIGINT) AS tokens_kept,
           CAST(ROUND(SUM(CASE WHEN cum <= {_TOKEN_BUDGET} THEN toks
                               ELSE 0 END) / {_TOKEN_BUDGET}.0, 6)
                AS DOUBLE) AS budget_util
    FROM ranked GROUP BY source
    """,
)
def sample_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus selection: each source contributes its
    highest-quality documents (quality = distinct-token ratio, the
    llm_quality_score lead signal) until a fixed token budget is
    exhausted — greedy by score, which is the exact knapsack relaxation
    every production curation cut uses ("take the best N tokens per
    domain"). Output is the per-source audit: docs and tokens kept vs
    available, and budget utilization.

    Plan shape: scoring is map-side expression work; the only shuffle
    is the hash partition on source for the running-sum window, whose
    ORDER BY is deterministic on both engines (exact double from the
    same integer division, doc_id tiebreak). The window is PARTITIONED
    — per-source external sort, never a single-task global sort; at
    100 TB a skewed source bounds one partition's sort, which is the
    same cost profile as any per-key sessionization, and the budget cut
    could equally run on a per-source pre-aggregated candidate tier
    first (the documented escape hatch for pathological skew). Keep
    membership is cum <= budget with an exact BIGINT running sum, so
    the kept set is bit-stable under any partitioning."""
    d = load(spark, sf_dir, "documents")
    toks = F.size(F.split("text", " ")).cast("long")
    q = F.size(F.array_distinct(F.split("text", " "))) / F.size(
        F.split("text", " ")
    ).cast("double")
    scored = d.select("doc_id", "source", toks.alias("toks"), q.alias("q"))
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("q").desc(), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = scored.select(
        "source", "toks", F.sum("toks").over(w).alias("cum")
    )
    kept = F.when(F.col("cum") <= _TOKEN_BUDGET, F.col("toks")).otherwise(
        F.lit(0)
    )
    return ranked.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum((F.col("cum") <= _TOKEN_BUDGET).cast("int"))
        .cast("long")
        .alias("n_kept"),
        F.sum("toks").cast("long").alias("tokens_total"),
        F.sum(kept).cast("long").alias("tokens_kept"),
        F.round(F.sum(kept) / float(_TOKEN_BUDGET), 6).alias("budget_util"),
    )


@query(
    "llm_quality_calibration",
    oracle="""
    WITH scored AS (
      SELECT len(list_distinct(string_split(text, ' ')))
               / CAST(len(string_split(text, ' ')) AS DOUBLE) AS q,
             CASE WHEN COUNT(*) OVER (
                    PARTITION BY md5(substr(lower(trim(text)), 1, 120))
                  ) > 1 THEN 1 ELSE 0 END AS is_dup
      FROM documents
    ), bucketed AS (
      SELECT LEAST(CAST(FLOOR(q * 10) AS INT), 9) AS bucket,
             ROUND(q, 9) AS q_r, is_dup
      FROM scored
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(is_dup) AS BIGINT) AS n_dup,
           CAST(ROUND(SUM(is_dup) / CAST(count(*) AS DOUBLE), 6) AS DOUBLE)
             AS dup_rate,
           CAST(ROUND(CAST(SUM(CAST(q_r AS DECIMAL(18,12))) AS DOUBLE)
                      / count(*), 6) AS DOUBLE) AS avg_q
    FROM bucketed GROUP BY bucket
    """,
)
def llm_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-score calibration curve: bucket the distinct-token-ratio
    score into 10 fixed-width bins and measure each bin's exact-
    duplicate rate — an independent badness signal the score never saw.
    A score worth thresholding on shows dup_rate falling as the bucket
    rises; a flat curve means the cut point is arbitrary. This is the
    measurement a pipeline runs BEFORE picking llm_quality_score's
    filter threshold or sample_token_budget's ranking signal. The
    duplicate label uses the repo's normalized dedup key (md5 of the
    lowercased/trimmed 120-char prefix, the llm_exact_dedup
    convention) — raw-text equality is degenerate on this corpus (zero
    dups at sf0.01), which would have made the whole curve a
    constant-zero certificate.

    Plan shape: fixed-width bucketing is map-side integer math (no
    ntile — a global-order window would single-task the corpus; the
    deliberate trade is equal-width bins instead of equal-population,
    the agg_histogram_fixed convention). The duplicate label is a
    count-over-text window — one hash shuffle on the text key, group
    sizes bounded by duplication multiplicity exactly like
    llm_exact_dedup. Mean score per bucket goes round-then-DECIMAL so
    aggregation order can't leak into the 6-dp report."""
    d = load(spark, sf_dir, "documents")
    q = F.size(F.array_distinct(F.split("text", " "))) / F.size(
        F.split("text", " ")
    ).cast("double")
    norm_key = F.md5(F.substring(F.lower(F.trim(F.col("text"))), 1, 120))
    dup = (F.count("*").over(Window.partitionBy(norm_key)) > 1).cast("int")
    scored = d.select(
        q.alias("q"), dup.alias("is_dup")
    ).select(
        F.least(F.floor(F.col("q") * 10).cast("int"), F.lit(9)).alias(
            "bucket"
        ),
        F.round("q", 9).alias("q_r"),
        "is_dup",
    )
    return scored.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("is_dup").cast("long").alias("n_dup"),
        F.round(F.sum("is_dup") / F.count("*").cast("double"), 6).alias(
            "dup_rate"
        ),
        F.round(
            F.sum(F.col("q_r").cast("decimal(18,12)")).cast("double")
            / F.count("*"),
            6,
        ).alias("avg_q"),
    )
