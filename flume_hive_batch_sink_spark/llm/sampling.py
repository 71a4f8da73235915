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
from pyspark.sql.window import Window

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


@query(
    "sample_weighted_poisson",
    oracle="""
    WITH s AS (
      SELECT o_orderpriority, o_totalprice,
             (CAST(o_orderkey AS BIGINT) * 2654435761 + 7)
               % 2147483647 % 1000000 < floor(o_totalprice) AS picked,
             floor(o_totalprice) / 1000000.0 AS p_i
      FROM orders
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN picked THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
           round(SUM(CASE WHEN picked
                 THEN CAST(o_totalprice AS DECIMAL(18,4)) END), 2) :: DOUBLE
             AS sum_sampled,
           round(SUM(CASE WHEN picked THEN o_totalprice / p_i END), 2)
             AS ht_total_estimate,
           round(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) :: DOUBLE
             AS true_total
    FROM s GROUP BY 1
    """,
)
def sample_weighted_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted Poisson sampling with a Horvitz–Thompson total
    estimator: each order is included with probability proportional to
    its weight (p_i = floor(o_totalprice)/1e6), decided by a
    DETERMINISTIC engine-portable hash of the key — the repartition-
    stable, replayable analogue of rand() < p_i (same reasoning as
    split_train_test's content-addressed split, but weight-biased: the
    pattern behind importance-weighted corpus subsampling, where
    high-quality documents get proportionally higher keep rates). The
    HT estimate Σ x_i/p_i over the sample is unbiased for the group
    total; the result carries estimate AND truth side by side so the
    oracle pins both (and the reader sees the estimator's actual
    error).

    100 TB shape: inclusion is one map-side integer expression — no
    shuffle, no RNG state, no driver coordination; the aggregation is
    an ordinary partial-agg groupBy. DECIMAL for exact sums, round(2)
    on the float HT column per the round-on-both-sides convention."""
    orders = load(spark, sf_dir, "orders")
    p_i = F.floor("o_totalprice") / 1_000_000.0
    picked = (
        (F.col("o_orderkey").cast("bigint") * 2654435761 + 7)
        % 2147483647
        % 1_000_000
        < F.floor("o_totalprice")
    )
    s = orders.select(
        "o_orderpriority",
        "o_totalprice",
        picked.alias("picked"),
        p_i.alias("p_i"),
    )
    return s.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_total"),
        F.sum(F.when(F.col("picked"), 1).otherwise(0)).alias("n_sampled"),
        F.round(
            F.sum(
                F.when(
                    F.col("picked"), F.col("o_totalprice").cast("decimal(18,4)")
                )
            ),
            2,
        )
        .cast("double")
        .alias("sum_sampled"),
        F.round(
            F.sum(F.when(F.col("picked"), F.col("o_totalprice") / F.col("p_i"))), 2
        ).alias("ht_total_estimate"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("true_total"),
    )


@query(
    "sample_reservoir_group",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR) || ':res'), doc_id
             ) AS rk
      FROM documents
    )
    SELECT lang, doc_id, rk FROM ranked WHERE rk <= 20
    """,
)
def sample_reservoir_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed reservoir sampling, k=20 per language stratum: each
    row draws a uniform deterministic key (md5 of its id) and the k
    smallest keys per group win — the order-statistics formulation of
    reservoir sampling, which unlike the sequential algorithm needs no
    scan order and is repartition-stable. Fixed-size output per group
    regardless of group size (vs sample_stratified's fixed-RATE
    thresholding). Implemented as one hash-partitioned window; at
    100 TB Spark's rank-limit pushes a per-partition top-k ahead of the
    shuffle so only k rows per (partition x group) ever move — the
    classic distributed-reservoir merge."""
    d = load(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":res")))
    w = Window.partitionBy("lang").orderBy(key, "doc_id")
    return (
        d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20)
        .select("lang", "doc_id", "rk")
    )


_KCENTER_K = 8

_KC_SQD = (
    "list_sum(list_transform(list_zip({a}, {b}), "
    "x -> CAST(ROUND((x[1] - x[2]) * (x[1] - x[2]), 9) AS DECIMAL(20,9))))"
)


def _kcenter_oracle() -> str:
    parts = [f"""
    WITH e AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), c0 AS MATERIALIZED (
      SELECT vec_id, e FROM e ORDER BY vec_id LIMIT 1
    ), m1 AS MATERIALIZED (
      SELECT v.vec_id, v.e,
             {_KC_SQD.format(a="v.e", b="(SELECT e FROM c0)")} AS mind
      FROM e v WHERE v.vec_id <> (SELECT vec_id FROM c0)
    )"""]
    for r in range(1, _KCENTER_K):
        parts.append(f"""
    , c{r} AS MATERIALIZED (
      SELECT vec_id, e, mind FROM m{r} ORDER BY mind DESC, vec_id LIMIT 1
    )""")
        if r < _KCENTER_K - 1:
            parts.append(f"""
    , m{r + 1} AS MATERIALIZED (
      SELECT v.vec_id, v.e,
             LEAST(v.mind,
                   {_KC_SQD.format(a="v.e", b=f"(SELECT e FROM c{r})")})
               AS mind
      FROM m{r} v WHERE v.vec_id <> (SELECT vec_id FROM c{r})
    )""")
    sel = ["""
    SELECT 0 AS r, (SELECT vec_id FROM c0) AS vec_id,
           CAST(NULL AS DOUBLE) AS sel_dist"""]
    for r in range(1, _KCENTER_K):
        sel.append(f"""
    SELECT {r} AS r, vec_id, CAST(mind AS DOUBLE) AS sel_dist FROM c{r}""")
    return "".join(parts) + " UNION ALL ".join(sel)


@query("sample_kcenter_diverse", oracle=_kcenter_oracle())
def sample_kcenter_diverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center (farthest-point) coreset selection over the
    embedding column — the diversity-sampling move for training-data
    curation (pick the 8 mutually most-distant examples; the classic
    2-approximation to the k-center cover). Each round is ONE
    distributed pass: update every vector's running min-distance
    against the newly chosen center (a map-only column update — the
    center rides into the plan as a literal array, kmeans-style) and
    take the argmax by TakeOrdered. The driver holds only k ids +
    k x dim center floats (the scalar-certificate convention).
    sel_dist per pick is the cover radius at that round —
    monotonically non-increasing, an in-result certificate of greedy
    correctness. All distances round-then-DECIMAL, so the argmax can
    never flip on summation order. Oracle: the same 8 rounds unrolled
    as MATERIALIZED CTEs with scalar-subquery centers."""
    emb = load(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    ).cache()
    first = e.orderBy("vec_id").limit(1).collect()[0]
    chosen = [(0, int(first.vec_id), None)]
    center = list(first.e)
    excluded = {int(first.vec_id)}
    mind_df = None
    for r in range(1, _KCENTER_K):
        c_arr = F.array(*[F.lit(float(x)) for x in center])
        base = (e if mind_df is None else mind_df).filter(
            ~F.col("vec_id").isin(*excluded)
        )
        with_c = base.withColumn("c", c_arr)
        dec_sqd = F.expr(
            "aggregate(zip_with(e, c, (x, y) -> "
            "CAST(round((x - y) * (x - y), 9) AS DECIMAL(20,9))), "
            "CAST(0 AS DECIMAL(28,9)), "
            "(acc, z) -> CAST(acc + z AS DECIMAL(28,9)))"
        )
        upd = with_c.withColumn(
            "mind",
            dec_sqd if mind_df is None else F.least(F.col("mind"), dec_sqd),
        ).drop("c")
        pick = (
            upd.orderBy(F.col("mind").desc(), "vec_id").limit(1).collect()[0]
        )
        chosen.append((r, int(pick.vec_id), float(pick.mind)))
        center = list(
            e.filter(F.col("vec_id") == int(pick.vec_id)).collect()[0].e
        )
        excluded.add(int(pick.vec_id))
        mind_df = upd.select("vec_id", "e", "mind")
        # truncate the driver-loop lineage every few rounds (the
        # graph_kcore convention): at k=8 the chained plan is fine, but
        # a larger k would otherwise stack k analysis/optimization
        # passes and re-execute the whole chain per argmax.
        if r % 4 == 0:
            mind_df = mind_df.localCheckpoint(eager=True)
    e.unpersist()
    return spark.createDataFrame(
        chosen, "r INT, vec_id BIGINT, sel_dist DOUBLE"
    )


@query(
    "sample_ab_assignment",
    oracle="""
    WITH assigned AS (
      SELECT user_id,
             CASE WHEN substr(md5('ab-exp-1:' || CAST(user_id AS VARCHAR)),
                              1, 1) < '8'
                  THEN 'A' ELSE 'B' END AS variant
      FROM (SELECT DISTINCT user_id FROM events)
    ),
    counts AS (
      SELECT variant, CAST(count(*) AS BIGINT) AS n_users FROM assigned
      GROUP BY variant
    ),
    tot AS (SELECT CAST(SUM(n_users) AS DOUBLE) AS t FROM counts),
    scored AS (
      SELECT variant, n_users,
             (SELECT t FROM tot) / 2 AS expected_n,
             POW(n_users - (SELECT t FROM tot) / 2, 2)
               / ((SELECT t FROM tot) / 2) AS chi2_part
      FROM counts
    )
    SELECT variant, n_users,
           CAST(ROUND(expected_n, 2) AS DOUBLE) AS expected_n,
           CAST(ROUND(chi2_part, 6) AS DOUBLE) AS chi2_part,
           CAST(ROUND(SUM(chi2_part) OVER (), 6) AS DOUBLE) AS chi2_total,
           SUM(chi2_part) OVER () > 3.841 AS srm_flag
    FROM scored
    """,
)
def sample_ab_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic A/B experiment assignment with a sample-ratio-
    mismatch (SRM) health check: each user hashes into variant A or B
    by the first hex nibble of a salted md5 (the content-addressed
    idiom of split_train_test — stable under repartitioning, re-runs,
    and backfills), then the observed split is tested against the
    designed 50/50 with a 1-df chi-square; chi2 > 3.841 (p < .05)
    flags the broken randomization that silently invalidates an
    experiment.

    Plan: distinct users (one hash-agg), a 2-key count, and a 2-row
    window for the total — the chi-square machinery runs on the
    VARIANT grain, so the test costs nothing beyond the distinct no
    matter how many users. Salt in the hash keys the experiment, so
    concurrent experiments get independent assignments."""
    ev = load(spark, sf_dir, "events")
    assigned = (
        ev.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.when(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("ab-exp-1:"), F.col("user_id").cast("string")
                        )
                    ),
                    1,
                    1,
                )
                < "8",
                "A",
            )
            .otherwise("B")
            .alias("variant"),
        )
    )
    counts = assigned.groupBy("variant").agg(F.count("*").alias("n_users"))
    w = Window.partitionBy()
    t = F.sum("n_users").over(w).cast("double")
    exp_n = t / 2
    chi2_part = F.pow(F.col("n_users") - exp_n, 2) / exp_n
    scored = counts.select(
        "variant",
        "n_users",
        F.round(exp_n, 2).alias("expected_n"),
        chi2_part.alias("chi2_raw"),
    )
    chi2_total = F.sum("chi2_raw").over(w)
    return scored.select(
        "variant",
        "n_users",
        "expected_n",
        F.round("chi2_raw", 6).alias("chi2_part"),
        F.round(chi2_total, 6).alias("chi2_total"),
        (chi2_total > 3.841).alias("srm_flag"),
    )


@query(
    "sample_balanced_classes",
    oracle="""
    WITH counts AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang
    ),
    cap AS (SELECT MIN(n) AS c FROM counts),
    ranked AS (
      SELECT doc_id, lang,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5('balance:' || CAST(doc_id AS VARCHAR)), doc_id)
             AS BIGINT) AS rk
      FROM documents
    )
    SELECT doc_id, lang, rk FROM ranked WHERE rk <= (SELECT c FROM cap)
    """,
)
def sample_balanced_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling: every language keeps exactly
    min-class-size documents — the equal-frequency counterpart to
    sample_stratified's proportional sampling, the standard rebalance
    before training a classifier on skewed labels.

    Selection is content-addressed (salted md5 of doc_id, doc_id
    tiebreak), so membership is a pure function of the data — stable
    under repartitioning and incremental reruns. Plan: one 5-key
    count, the min cap as a broadcast 1-row aggregate (never
    collected), and one row_number window PARTITIONED by class —
    per-class sorted state, no global sort. At 100 TB the same shape
    holds because the window key is the class; if one class is itself
    huge, the rank-then-filter can swap for a per-class threshold on
    the hash value (quantile of md5 space) to avoid ranking rows that
    cannot survive the cap."""
    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count("*").alias("n"))
    cap = counts.agg(F.min("n").alias("c"))
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.concat(F.lit("balance:"), F.col("doc_id").cast("string"))),
        "doc_id",
    )
    ranked = d.select(
        "doc_id", "lang", F.row_number().over(w).cast("long").alias("rk")
    )
    return ranked.join(F.broadcast(cap)).filter(
        F.col("rk") <= F.col("c")
    ).select("doc_id", "lang", "rk")


@query(
    "sample_group_holdout",
    oracle="""
    WITH assigned AS (
      SELECT user_id,
             CASE WHEN substr(md5('holdout-v1:' || CAST(user_id AS VARCHAR)),
                              1, 1) IN ('0','1','2')
                  THEN 'test' ELSE 'train' END AS split
      FROM (SELECT DISTINCT user_id FROM events)
    ),
    ev AS (
      SELECT a.split, e.user_id, e.event_id
      FROM events e JOIN assigned a ON e.user_id = a.user_id
    ),
    leak AS (
      SELECT count(*) AS n FROM (
        SELECT user_id FROM ev GROUP BY user_id
        HAVING count(DISTINCT split) > 1)
    )
    SELECT split,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST((SELECT n FROM leak) AS BIGINT) AS n_leaked_users
    FROM ev GROUP BY split
    """,
)
def sample_group_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-level holdout split: every event of a user lands in the
    same split (test ≈ 3/16 by hash nibble), because row-level
    splitting of correlated data (split_train_test's granularity)
    leaks — a model evaluated on events of users it trained on scores
    optimistically. The split is content-addressed on the GROUP key
    (salted md5 of user_id), so membership survives repartitioning,
    backfills, and incremental appends; the certificate column proves
    zero users straddle splits BY CONSTRUCTION (the leak count is
    computed, not assumed).

    Plan: one distinct on the group key, the assignment broadcast back
    onto the event stream (users ≪ events), per-split rollups with
    map-side combine. The same shape handles any grouping unit —
    document, session, conversation — at any scale."""
    ev = load(spark, sf_dir, "events")
    assigned = (
        ev.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.when(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("holdout-v1:"),
                            F.col("user_id").cast("string"),
                        )
                    ),
                    1,
                    1,
                ).isin("0", "1", "2"),
                "test",
            )
            .otherwise("train")
            .alias("split"),
        )
    )
    j = ev.select("user_id", "event_id").join(F.broadcast(assigned), "user_id")
    leak = (
        j.groupBy("user_id")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .agg(F.count("*").alias("n_leaked_users"))
    )
    return (
        j.groupBy("split")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
        .join(F.broadcast(leak))
        .select("split", "n_users", "n_events", "n_leaked_users")
    )


@query(
    "split_temporal",
    oracle="""
    SELECT split,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           CAST(sum(event_id) AS BIGINT) AS id_checksum
    FROM (
      SELECT user_id, event_id,
             CASE WHEN rk = 1 AND n >= 3 THEN 'test'
                  WHEN rk = 2 AND n >= 3 THEN 'val'
                  ELSE 'train' END AS split
      FROM (
        SELECT user_id, event_id,
               row_number() OVER (
                 PARTITION BY user_id
                 ORDER BY ts DESC, event_id DESC) AS rk,
               count(*) OVER (PARTITION BY user_id) AS n
        FROM events
      )
    )
    GROUP BY split
    """,
)
def split_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPORAL leave-last-out split — the standard recommender /
    next-event evaluation protocol: per user, the most recent event is
    'test', the second most recent 'val', everything earlier 'train'.
    Unlike the hash splits above, the boundary is each user's own
    timeline, so evaluation simulates the only deployment that exists —
    predicting the future from the past — and a random row split that
    trains on Tuesday to predict Monday is exactly the leak this key
    prevents. Users with fewer than 3 events stay entirely in train
    (their test split would otherwise consume most of their history).

    Determinism: the ordering key is (ts DESC, event_id DESC) — the
    event_id tiebreak makes same-timestamp users split identically on
    every run and any partitioning. Leak-freedom is by construction:
    train events of a user strictly precede that user's val/test events
    in this total order.

    Plan at 100 TB: ONE shuffle on user_id; row_number and the per-user
    count share the same window partitioning, so the single user_id
    exchange+sort feeds both Window operators back-to-back (Spark
    splits the ordered and whole-partition specs into two Window nodes
    but inserts no second exchange — plan-gated), then a map-side-
    combined hash aggregation on the 3-value split key. No global
    window, no join, no driver state; per-user skew (power users) is
    bounded by per-user event counts and AQE's skew handling. Output is
    the split audit: sizes, user coverage, and an order-insensitive
    event_id checksum so the oracle pins the exact membership, not just
    the counts."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    w_rk = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    w_n = Window.partitionBy("user_id")
    tagged = ev.select(
        "user_id",
        "event_id",
        F.row_number().over(w_rk).alias("rk"),
        F.count("*").over(w_n).alias("n"),
    )
    split = (
        F.when((F.col("rk") == 1) & (F.col("n") >= 3), "test")
        .when((F.col("rk") == 2) & (F.col("n") >= 3), "val")
        .otherwise("train")
    )
    return (
        tagged.select(split.alias("split"), "user_id", "event_id")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum("event_id").cast("long").alias("id_checksum"),
        )
    )


@query(
    "llm_dsir_importance",
    oracle="""
    WITH words AS (
      SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
      FROM documents
    ), toks AS (
      SELECT doc_id, source, substring(md5(w), 1, 2) AS b FROM words
    ), counts AS (
      SELECT b,
             SUM(CASE WHEN source IN ('src0','src1','src2')
                      THEN 1 ELSE 0 END) AS ct,
             SUM(CASE WHEN source IN ('src0','src1','src2')
                      THEN 0 ELSE 1 END) AS cr
      FROM toks GROUP BY b
    ), tot AS (
      SELECT CAST(SUM(ct) AS DOUBLE) AS nt, CAST(SUM(cr) AS DOUBLE) AS nr
      FROM counts
    ), lut AS (
      SELECT b,
             CAST(ROUND(ln(((ct + 1.0) / (nt + 256.0))
                           / ((cr + 1.0) / (nr + 256.0))), 9)
                  AS DECIMAL(20,9)) AS term
      FROM counts, tot
    )
    SELECT t.doc_id, t.source,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(ROUND(CAST(SUM(l.term) AS DOUBLE), 6) AS DOUBLE) AS log_w,
           CAST(ROUND(CAST(SUM(l.term) AS DOUBLE), 6) AS DOUBLE) > 0.0
             AS keep
    FROM toks t JOIN lut l ON t.b = l.b
    GROUP BY t.doc_id, t.source
    """,
)
def llm_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weighting (Data Selection with Importance
    Resampling, Xie et al. 2023): score every raw document by how much
    more likely its hashed-unigram bag is under a TARGET-domain LM
    (sources src0-2 stand in for the curated target) than under the
    raw-corpus LM, log w(x) = Σ_tokens [ln p_target(b) − ln p_raw(b)],
    with add-one smoothing over B=256 feature buckets; keep = log_w>0
    is the resampling decision a pretraining pipeline thresholds or
    Gumbel-tops samples on.

    The hashed feature space is the whole design point at 100 TB: the
    two LMs are ONE 256-row aggregate regardless of corpus size (vs a
    vocabulary-sized model), so scoring is a map-side explode, a
    broadcast join against the 256-row log-ratio LUT, and one per-doc
    agg shuffle — no vocabulary shuffle, no driver state. Buckets come
    from md5 hex (engine-portable, same idiom as split_train_test);
    each per-token log-ratio is rounded to 9 dp and DECIMAL-summed so
    per-doc totals are aggregation-order-free across engines (the
    llm_unigram_logprob convention), making the keep bit deterministic
    rather than float-boundary-flaky."""
    d = load(spark, sf_dir, "documents")
    return dsir_importance(d, F.col("source").isin("src0", "src1", "src2"))


def dsir_importance(docs: DataFrame, is_target) -> DataFrame:
    """Library form of the DSIR scorer: ``docs`` needs (doc_id, source,
    text); ``is_target`` is any boolean Column marking the target-domain
    rows (a source list, a quality flag, a join-derived marker). Returns
    (doc_id, source, n_tokens, log_w, keep). The registered key above is
    the fixture instantiation; pipelines call this directly with their
    own target predicate."""
    toks = docs.select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("w")
    ).select("doc_id", "source", F.substring(F.md5("w"), 1, 2).alias("b"))
    counts = toks.groupBy("b").agg(
        F.sum(F.when(is_target, 1).otherwise(0)).alias("ct"),
        F.sum(F.when(is_target, 0).otherwise(1)).alias("cr"),
    )
    tot = counts.agg(
        F.sum("ct").cast("double").alias("nt"),
        F.sum("cr").cast("double").alias("nr"),
    )
    lut = counts.crossJoin(F.broadcast(tot)).select(
        "b",
        F.round(
            F.log(
                ((F.col("ct") + 1.0) / (F.col("nt") + 256.0))
                / ((F.col("cr") + 1.0) / (F.col("nr") + 256.0))
            ),
            9,
        )
        .cast("decimal(20,9)")
        .alias("term"),
    )
    log_w = F.round(F.sum("term").cast("double"), 6)
    return (
        toks.join(F.broadcast(lut), "b")
        .groupBy("doc_id", "source")
        .agg(
            F.count("*").alias("n_tokens"),
            log_w.alias("log_w"),
            (log_w > 0.0).alias("keep"),
        )
    )
