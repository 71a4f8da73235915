"""2.I — Deduplication family: exact, MinHash+LSH, SimHash, embedding-cosine.

100 TB posture: exact dedup is one hash-aggregation on a 16-byte key;
MinHash/LSH replaces the O(n²) pairwise scan with per-doc signatures
(linear) + band-bucket joins (near-linear, skew-salted via band index);
SimHash gives a per-doc 16-bit sketch joinable by Hamming bands. Only the
final *verify* step touches candidate pairs, whose count LSH controls.

All hash families are deterministic (seeded by literal band/row indexes)
— required by the oracle hash-match and by resume semantics.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flume_hive_batch_sink_spark.io import load
from flume_hive_batch_sink_spark.partitioning import shuffle_parallelism
from flume_hive_batch_sink_spark.registry import query

# MinHash/LSH geometry: 32 hash functions = 16 bands × 2 rows.
# For a pair at the J=0.8 decision boundary the miss probability is
# (1 - 0.8²)¹⁶ ≈ 7e-8, so LSH candidate recall is exact-equivalent for
# this fixture (dense similarity: ~30k true pairs at sf0.01) while still
# demonstrating the banding structure that makes 100 TB feasible.
_N_HASHES = 32
_BANDS = 16
_ROWS = 2
_JACCARD_T = 0.8

# Hot-band skew guard (band_candidates): a band bucket wider than
# _BUCKET_CAP docs would make the plain self-join quadratic ON ONE
# REDUCER (a degenerate corpus — one template repeated 10⁶× — puts all
# copies in one (band_idx, band_key) bucket, and AQE's skew-join split
# cannot divide a single join key). Buckets past the cap instead take a
# salted self-join fanned across _BUCKET_SALTS reducers.
_BUCKET_CAP = 64
_BUCKET_SALTS = 16


def _floor_fraction(t: float, max_den: int = 1000) -> tuple[int, int]:
    """Largest fraction p/q (q ≤ ``max_den``) that is ≤ the DOUBLE ``t``
    — the direction an integer size-prefilter needs to stay conservative
    w.r.t. a final ``jaccard >= t`` double comparison.

    ``Fraction(t).limit_denominator`` returns the CLOSEST bounded
    fraction, which may round UP: t = 1/3 stored as the double
    0.333…331 rounds to the fraction 1/3, which is strictly greater
    than the double, so a prefilter built from it would drop exact
    boundary pairs that the verify step accepts. For t = 0.8 the
    closest fraction 4/5 happens to sit below the double, so the round-
    13 code was safe only by luck of the constant (round-14 ADVICE).
    Falling back to floor(t·max_den)/max_den is always ≤ t and within
    1/max_den of it — selectivity loss is negligible, exactness is
    structural. The assert makes a regression here loud, not lossy.
    """
    from fractions import Fraction
    from math import floor

    exact = Fraction(t)  # exact binary expansion of the double
    frac = Fraction(t).limit_denominator(max_den)
    if frac > exact:
        # floor in EXACT rational arithmetic: floor(t * max_den) in
        # float can round back UP to the boundary (0.6 * 1000 rounds to
        # exactly 600.0 although double(0.6) < 3/5)
        frac = Fraction(floor(exact * max_den), max_den)
    assert frac <= exact, "size prefilter must lower-bound the threshold"
    return frac.numerator, frac.denominator


# Self-triggering candidate-volume guard (round-14, VERDICT r13 #1).
# The round-13 sf100rv probe showed that when band-key entropy is
# exhausted (fixed small vocabulary, growing corpus) bucket widths grow
# ∝ n and Σ w(w−1)/2 candidates grow ∝ n² — the salt guard bounds
# per-REDUCER work but not candidate OUTPUT volume, and ~6e9 pair rows
# filled the disk before any reducer was hot. The guard measures the
# would-be candidate volume from the band-key width profile (one cheap
# hash-agg over the bands relation — the same df-profile trick as
# llm_containment_dedup's df-cap) and, when it exceeds the budget,
# DROPS the hottest buckets (widest first) until the remainder fits,
# recording a recall lower bound. Dropping whole buckets is the
# LSH-correct degradation: a pair in a dropped bucket still meets in
# any other band where it collides, so recall at threshold t falls from
# 1−(1−t^r)^B to at worst 1−(1−t^r)^(B−D), D = #bands with any drop —
# and the hottest buckets are precisely where the band key has stopped
# discriminating (low-entropy keys ≈ stopword-like signatures), so the
# dropped mass is overwhelmingly false candidates.
# Budget default: 2e8 pairs — exact-verify scratch ~100-120 GB (the r13
# probe measured ~50-60 GB at 1e8 candidates), the top of one
# executor-node NVMe class; override via SPARK_GRAFT_LSH_CANDIDATE_BUDGET
# (0 disables the guard entirely).
_CANDIDATE_BUDGET_DEFAULT = 200_000_000
# bounded driver-side profile: only the top-K widest buckets are ever
# collected (the guard targets the degenerate head, not the long tail)
_GUARD_TOPK = 20_000

# Guard decision of the most recent llm_near_dedup_minhash build —
# probe scripts and SCALE.md read this; empty dict = guard not run.
LAST_MINHASH_GUARD: dict = {}

# Sampled re-catch audit (round-15, VERDICT r14 item 3): when the guard
# triggers, its theoretical recall bound 1−(1−t^r)^(B−D) goes vacuous
# once every band has a dropped bucket (both round-14 probes hit that
# regime) — so a triggered run must carry MEASURED per-run recall
# evidence, not a probe-time anecdote. Target expected sample size for
# the audit's pair sample (content-addressed, deterministic).
_RECATCH_TARGET = 2_000


def _sampled_recatch_audit(
    bands: DataFrame,
    surviving: DataFrame,
    drop_df: DataFrame,
    dropped_slots: int,
) -> dict:
    """Per-run recall evidence for a triggered candidate-volume guard.

    Draw a deterministic content-addressed doc sample (keep doc_id iff
    xxhash64(doc_id, 'recatch') ≡ 0 mod M, M sized so the expected
    number of sampled in-dropped-bucket pairs ≈ _RECATCH_TARGET), form
    the sampled pairs that co-occurred in a DROPPED bucket, and measure
    the fraction that still meet in ≥1 SURVIVING bucket — the re-catch
    rate. A dropped candidate pair is lost only if NO surviving band
    catches it, so this rate is a direct unbiased estimate of the
    guard's candidate-level recall on this corpus, computed from the
    same bands relation the guard already profiled (one semi-join + two
    bounded joins on the ~target-sized sample; runs only when
    triggered)."""
    mod = max(1, int((dropped_slots / _RECATCH_TARGET) ** 0.5))
    sel = F.pmod(F.xxhash64(F.col("doc_id"), F.lit("recatch")), F.lit(mod)) == 0
    dropped_rows = (
        bands.join(F.broadcast(drop_df), ["band_idx", "band_key"], "left_semi")
        .filter(sel)
        .select("band_idx", "band_key", "doc_id")
    )
    pa = dropped_rows.select(
        "band_idx", "band_key", F.col("doc_id").alias("doc_a")
    )
    pb = dropped_rows.select(
        "band_idx", "band_key", F.col("doc_id").alias("doc_b")
    )
    spairs = (
        pa.join(pb, ["band_idx", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
        .cache()
    )
    n_sampled = spairs.count()
    if n_sampled == 0:
        spairs.unpersist()
        return {"sampled_recatch_pairs": 0, "recatch_sample_mod": mod}
    surv_a = surviving.select(
        F.col("doc_id").alias("doc_a"), "band_idx", "band_key"
    )
    surv_b = surviving.select(
        F.col("doc_id").alias("doc_b"), "band_idx", "band_key"
    )
    n_met = (
        spairs.join(surv_a, "doc_a")
        .join(surv_b, ["doc_b", "band_idx", "band_key"], "left_semi")
        .select("doc_a", "doc_b")
        .distinct()
        .count()
    )
    spairs.unpersist()
    return {
        "sampled_recatch_pairs": n_sampled,
        "sampled_recatch_met": n_met,
        "sampled_recatch_rate": round(n_met / n_sampled, 6),
        "recatch_sample_mod": mod,
    }


def _apply_candidate_budget(
    bands: DataFrame,
    budget: int,
    guard_info: dict | None,
    n_docs: int | None = None,
) -> DataFrame:
    """Measure Σ w(w−1)/2 over band buckets; if over ``budget``, drop
    the widest buckets (deterministic order: width desc, then band_idx,
    band_key) until the remaining volume fits, via a broadcast
    anti-join on the 8-byte bucket keys. Returns the (possibly
    filtered) bands relation; fills ``guard_info`` with the decision.

    Density exemption: when ``n_docs`` is given and the candidate
    multiset is a constant fraction of ALL pairs (total ≥ ¼·n(n−1)/2),
    the corpus is globally self-similar — the sf1 driver fixture's
    31-word vocabulary is the canonical case (its TRUE Jaccard≥0.8
    graph is quadratic by construction, 7.85e9 band-pair slots at 50k
    docs) — and dropping buckets would corrupt an answer that is
    legitimately quadratic. The guard then stands down with
    ``dense_corpus: true`` recorded: capacity on such a corpus is a
    cluster-sizing question, not a recall trade. Entropy exhaustion at
    scale is the opposite shape (the r13 5M-doc/10k-vocab probe: 6e9
    candidates ≈ 5e-4 of all pairs), which is exactly when dropping
    the widest — least discriminating — buckets is the right trade.

    Cost when the corpus is healthy: one extra linear pass over the
    bands relation (map-side signatures + a partial-agg'd count) and a
    1-row collect — no change to the candidate plan. Cost when
    triggered: + one ≤ _GUARD_TOPK-row collect and a broadcast
    anti-join. Raises if even dropping the top-K widest buckets cannot
    meet the budget — at that point the banding operating point itself
    is wrong for the corpus and `llm_lsh_band_sweep` is the
    recalibration tool."""
    prof = (
        bands.groupBy("band_idx", "band_key")
        .agg(F.count("*").alias("w"))
        .filter(F.col("w") > 1)
    )
    pairs_of_w = (F.col("w") * (F.col("w") - F.lit(1)) / F.lit(2)).cast("long")
    total = prof.agg(F.sum(pairs_of_w).alias("p")).collect()[0]["p"] or 0
    info: dict = {
        "budget": int(budget),
        "total_pairs": int(total),
        "triggered": False,
        "dropped_buckets": 0,
        "dropped_pairs": 0,
        "bands_affected": 0,
        "kept_pairs": int(total),
    }
    # Density exemption, SLOT-NORMALIZED (round-15, ADVICE r14): a
    # distinct pair occupies up to _BANDS slots in `total` (once per
    # colliding band), so comparing raw slots against distinct all-pairs
    # let a corpus where only ~1/64 of pairs collide qualify as "dense"
    # and bypass the guard — exactness-preserving but defeating the
    # ENOSPC protection. total/_BANDS lower-bounds the distinct
    # colliding-pair count; exempt when that normalized density is
    # ≥ 1/8 of all pairs. Calibration: the sf1 driver fixture (31-word
    # vocab, pairs collide in essentially every band) has normalized
    # density ≈ 1 → exempt; an all-true-dup corpus at J ≈ t collides in
    # expected B·t^r ≈ 2.7 bands/pair → density ≈ 0.17 → exempt; the
    # r13 entropy-exhaustion probe (5e-4) and the 1/64-collider → guard.
    if (
        total > budget
        and n_docs is not None
        and total * 8 >= _BANDS * (n_docs * (n_docs - 1) // 2)
    ):
        info["dense_corpus"] = True
        if guard_info is not None:
            guard_info.update(info)
        return bands
    if total > budget:
        top = (
            prof.orderBy(F.col("w").desc(), "band_idx", "band_key")
            .limit(_GUARD_TOPK)
            .collect()
        )
        remaining = int(total)
        drops: list[tuple[int, int, int]] = []
        for r in top:
            if remaining <= budget:
                break
            remaining -= r["w"] * (r["w"] - 1) // 2
            drops.append((int(r["band_idx"]), int(r["band_key"]), int(r["w"])))
        if remaining > budget:
            raise RuntimeError(
                f"LSH candidate volume {total:,} exceeds budget {budget:,} "
                f"even after dropping the {len(drops):,} widest band "
                "buckets — the banding operating point does not fit this "
                "corpus's band-key entropy; recalibrate rows/band with "
                "llm_lsh_band_sweep or raise "
                "SPARK_GRAFT_LSH_CANDIDATE_BUDGET."
            )
        info.update(
            triggered=True,
            dropped_buckets=len(drops),
            dropped_pairs=int(total) - remaining,
            kept_pairs=remaining,
            bands_affected=len({d[0] for d in drops}),
            max_dropped_width=max(d[2] for d in drops),
            min_dropped_width=min(d[2] for d in drops),
            # fraction of candidate SLOTS dropped — note a true pair is
            # lost only if EVERY band where it collides was dropped, so
            # when bands_affected == B the worst-case recall bound goes
            # vacuous while measured recall stays high (SCALE.md
            # round-14 lowent10k probe: the evidence to cite)
            dropped_slot_fraction=round((int(total) - remaining) / total, 4),
        )
        drop_df = bands.sparkSession.createDataFrame(
            [(a, k) for a, k, _ in drops], "band_idx INT, band_key BIGINT"
        )
        surviving = bands.join(
            F.broadcast(drop_df), ["band_idx", "band_key"], "left_anti"
        )
        # per-run recall evidence (round-15): measured re-catch rate of
        # a deterministic pair sample from the dropped buckets — the
        # certification the vacuous worst-case bound can't provide
        info.update(
            _sampled_recatch_audit(
                bands, surviving, drop_df, int(total) - remaining
            )
        )
        bands = surviving
    if guard_info is not None:
        guard_info.update(info)
    return bands


def _surface_guard_decision(info: dict) -> None:
    """Make a lossy guard decision DURABLE (round-15, ADVICE r14): a
    triggered guard on a new corpus can return a strict subset of the
    oracle-defined answer, and until this round the only record was the
    in-process module global — invisible unless a probe script read it.
    Now every trigger (a) emits a loud UserWarning on the driver's
    stderr and (b) writes the full decision (budget, drops, measured
    sampled re-catch rate, recall bound) as one JSON file the driver /
    operator can inspect after the process exits. Artifact path:
    $SPARK_GRAFT_GUARD_ARTIFACT (set to empty to disable), default
    <repo>/artifacts/minhash_guard_last.json."""
    import json
    import warnings
    from pathlib import Path

    msg = (
        "llm_near_dedup_minhash candidate-volume guard TRIGGERED: "
        f"dropped {info.get('dropped_buckets')} buckets "
        f"({info.get('dropped_slot_fraction')} of candidate slots); "
        f"sampled re-catch rate "
        f"{info.get('sampled_recatch_rate', 'n/a (0 sampled pairs)')} "
        f"over {info.get('sampled_recatch_pairs', 0)} sampled dropped "
        "pairs — the result may be a subset of the exact answer; raise "
        "SPARK_GRAFT_LSH_CANDIDATE_BUDGET or recalibrate with "
        "llm_lsh_band_sweep to restore exactness."
    )
    warnings.warn(msg, stacklevel=3)
    path = os.environ.get(
        "SPARK_GRAFT_GUARD_ARTIFACT",
        str(Path(__file__).resolve().parents[2] / "artifacts"
            / "minhash_guard_last.json"),
    )
    if not path:
        return
    try:
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        Path(path).write_text(json.dumps(info, indent=2, default=str))
    except OSError as exc:  # never fail the query over the side record
        warnings.warn(f"could not write guard artifact {path}: {exc}")


def _tokens(docs: DataFrame) -> DataFrame:
    """Distinct token set per document (the dedup unit of comparison)."""
    return docs.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("token")
    )


def token_arrays(docs: DataFrame) -> DataFrame:
    """Per-doc distinct token ARRAY — the row shape both the signature
    and the verify tier consume, so the linear passes never explode
    tokens into rows."""
    return docs.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("toks")
    )


def minhash_bands(tok_arr: DataFrame) -> DataFrame:
    """(doc_id, band_idx, band_key) rows for LSH bucketing.

    Per-doc MinHash signature: h_i = min over tokens of xxhash64(i:token)
    — an ``array_min(transform(...))`` codegen expression; band key =
    xxhash64 of the band's signature slice (an 8-byte join key — md5
    strings quadruple the shuffle width for no information gain). The
    whole stage is PURE map-side: scan → project → posexplode, zero
    Exchange — asserted by tests/test_plans.py (the property that makes
    signatures free at 100 TB: they ride along the initial scan)."""
    # NB: the seed must be bound via closure, NOT a defaulted second
    # lambda parameter — PySpark treats ANY two-parameter lambda in
    # transform() as (element, index) and passes the array-index Column
    # into the second slot, silently clobbering the default (the seed
    # then stringifies as the Column's repr). tests/test_llm.py pins
    # the literal-seeded family against hand-computed values.
    def _minhash(i: int) -> F.Column:
        prefix = F.lit(f"{i}:")
        return F.array_min(
            F.transform(F.col("toks"), lambda t: F.xxhash64(F.concat(prefix, t)))
        )

    sig = tok_arr.select(
        "doc_id",
        F.size("toks").alias("n"),
        *[_minhash(i).alias(f"h{i}") for i in range(_N_HASHES)],
    )
    key_arr = F.array(
        *[
            F.xxhash64(
                F.lit(b),
                *[F.col(f"h{b * _ROWS + r}") for r in range(_ROWS)],
            )
            for b in range(_BANDS)
        ]
    )
    # `n` (distinct-token count, one int riding the map-side explode) is
    # what the size prefilter joins on inside band_candidates — it must
    # exist BEFORE pair generation (round-13 sf100rv finding)
    return sig.select(
        "doc_id", "n", F.posexplode(key_arr).alias("band_idx", "band_key")
    )


def band_candidates(
    bands: DataFrame,
    width_cap: int = _BUCKET_CAP,
    salts: int = _BUCKET_SALTS,
    pair_pred=None,
    candidate_budget: int | None = None,
    guard_info: dict | None = None,
    n_docs: int | None = None,
) -> DataFrame:
    """Distinct candidate (doc_a, doc_b) pairs from band-bucket
    collisions, with a hot-bucket skew guard.

    Buckets of width ≤ ``width_cap`` take the plain self-join (one
    shuffle on (band_idx, band_key); per-reducer work ≤ cap² per
    bucket). Wider buckets take a SALTED self-join: the a-side gets a
    deterministic salt in [0, salts) from xxhash64(doc_id); the b-side
    is replicated once per salt value; the join adds salt equality, so
    every ordered pair still meets EXACTLY once (at the b-replica whose
    salt equals a's) — the candidate set is bit-identical to the
    unsalted join while a size-m bucket's m² products spread across
    ``salts`` reducers at ⌈m/salts⌉·m each. Cost is b-side shuffle
    volume ×salts, paid ONLY by the (rare) hot buckets; the width split
    rides the same hash partitioning the window count already paid for.

    Tier membership is per-bucket (every row of a bucket shares its
    width), so no pair can straddle tiers and exactness needs no
    cross-tier join. Both the salt and the tier split are deterministic
    — required by oracle hash-match and resume semantics.

    ``pair_pred`` (round-13): an optional extra join predicate built
    from the two sides' aliases ``a``/``b`` — a callable returning a
    Column. The sf100rv probe showed that at degenerate band-key
    entropy the PAIR MULTISET itself is the disk bound (every slim
    (doc_a, doc_b) exchange is retained for the job's lifetime), so
    exactness-preserving pruning must happen IN the join condition,
    before a pair row ever exists — not as a post-hoc filter over a
    materialized candidate set. Any extra column the predicate needs
    must already ride ``bands``.

    ``candidate_budget`` (round-14): when set, the SELF-TRIGGERING
    volume guard (_apply_candidate_budget) profiles bucket widths first
    and drops the widest buckets until Σ w(w−1)/2 fits the budget —
    the defense against band-key entropy exhaustion, where the salt
    guard bounds per-reducer work but the pair multiset itself
    overflows scratch. ``guard_info`` (a dict, filled in place)
    receives the decision for probes/SCALE.md.
    """
    if candidate_budget is not None:
        bands = _apply_candidate_budget(
            bands, candidate_budget, guard_info, n_docs=n_docs
        )
    # Fan-out-aware partitioning (round-15, guide §2.2/§2.5): the
    # exchanges in this dataflow are byte-LIGHT but row-EXPLOSIVE — the
    # band rows are ~16·n slim tuples (a few MB at sf0.1), while the
    # pair join fans them out to Σ w² slots (83M rows at sf0.1's
    # degenerate fixture). AQE coalesces shuffle partitions by INPUT
    # bytes, so it shrank the join stage to ~2 tasks and the pair-dedup
    # stage to a handful — measured 49.2 s for the candidate stage at
    # sf0.1 with AQE on vs 10.3 s with it off (the work is identical;
    # only the parallelism differs). Explicit repartition() is treated
    # as user-specified by AQE and never coalesced, so both fan-out
    # stages keep the session's full shuffle parallelism — a
    # scale-adaptive knob (spark.sql.shuffle.partitions), not a local
    # constant. Measured after: 11.6 s with AQE on (4.2×).
    par = shuffle_parallelism(bands)
    w = F.count("*").over(Window.partitionBy("band_idx", "band_key"))
    bw = bands.repartition(par, "band_idx", "band_key").withColumn("w", w)

    def _pairs(a: DataFrame, b: DataFrame, *extra: F.Column) -> DataFrame:
        cond = (
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
        )
        if pair_pred is not None:
            cond = cond & pair_pred()
        for e in extra:
            cond = cond & e
        return (
            a.alias("a")
            .join(b.alias("b"), cond)
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
        )

    narrow = bw.filter(F.col("w") <= width_cap).drop("w")
    hot = bw.filter(F.col("w") > width_cap).drop("w")
    ha = hot.withColumn(
        "salt", F.pmod(F.xxhash64(F.col("doc_id"), F.lit("bandsalt")), F.lit(salts))
    )
    hb = hot.withColumn(
        "salt", F.explode(F.array(*[F.lit(s) for s in range(salts)]))
    )
    # Pair dedup via an explicit (AQE-uncoalescible) exchange rather
    # than .distinct(): duplicates are CROSS-band by construction (a
    # bucket holds each doc once), so the partial-agg phase distinct()
    # would run before its shuffle collapses ~nothing — the dedup work
    # is all in the post-shuffle hash agg, which must keep its
    # parallelism (same AQE byte-vs-rows blindness as above).
    return (
        _pairs(narrow, narrow)
        .unionByName(_pairs(ha, hb, F.col("a.salt") == F.col("b.salt")))
        .repartition(par, "doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )


@query(
    "llm_exact_dedup",
    oracle="""
    SELECT md5(lower(trim(text))) AS content_key,
           min(doc_id) AS keep_doc_id, count(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def llm_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup: normalize → md5 → keep lowest doc_id.
    One map + one hash-agg on a 16-byte key; at 100 TB this is the
    cheapest possible full-corpus pass."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy(
        F.md5(F.lower(F.trim("text"))).alias("content_key")
    ).agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count("*").alias("n_copies"),
    )


_MINHASH_ORACLE = f"""
    WITH tok AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents
    ), n AS (
      SELECT doc_id, count(*) AS nt FROM tok GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
      FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           ROUND(CAST(ni AS DOUBLE) / (na.nt + nb.nt - ni), 6) AS jaccard
    FROM inter
    JOIN n na ON na.doc_id = doc_a
    JOIN n nb ON nb.doc_id = doc_b
    WHERE CAST(ni AS DOUBLE) / (na.nt + nb.nt - ni) >= {_JACCARD_T}
"""


@query("llm_near_dedup_minhash", oracle=_MINHASH_ORACLE)
def llm_near_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs: tokens → MinHash signatures → LSH bands →
    candidate pairs → exact-Jaccard verify ≥ 0.8.

    The oracle computes ground-truth all-pairs Jaccard; this pipeline
    must reproduce it exactly, which it does because the verify step is
    exact and LSH recall at the threshold is ~1-7e-8 (see module
    constants). Signatures are array expressions over the per-doc token
    array (map-side, zero shuffles); band joins shuffle only
    (band_idx, band_key); verify touches candidate pairs only, via
    codegen array_intersect.
    """
    # Round-16 note: an AQE-off cloned session (partitioning.
    # fanout_session) was A/B'd here per VERDICT r15 item 1 and measured
    # NEUTRAL (8.45 s AQE-on vs 8.72 s off, interleaved medians of 5 at
    # sf0.1; scripts/probe_fanout_aqe.py). The round-15 "2.4 s with AQE
    # fully off" figure predated the explicit fan-out repartitions —
    # once those pin the hot exchanges, AQE's remaining stage barriers
    # cost nothing measurable, so the session stays untouched.
    docs = load(spark, sf_dir, "documents")
    # per-doc distinct token ARRAY — signatures and verify both work on
    # the array column, so no token row-explosion or shuffle ever happens
    # for the linear passes (the 100 TB-relevant change: signature
    # computation is fully map-side)
    tok_arr = token_arrays(docs)
    bands = minhash_bands(tok_arr)

    # Candidate pairs: bucket-mates in any band, deduplicated, with the
    # hot-bucket skew guard (band_candidates docstring — buckets wider
    # than _BUCKET_CAP take an exactness-preserving salted self-join so
    # a degenerate template corpus can't concentrate m² products on one
    # reducer). distinct compiles to partial (map-side) + final hash
    # aggregation, so per-collision duplicates collapse before the
    # shuffle where the data is dense (~83M matches → ~12M pairs at
    # sf0.1).
    #
    # SIZE PREFILTER inside the pair join (round-13: the sf100rv probe
    # twice filled the disk here — first each candidate row carried a
    # full token array through two exchanges, then the slim pair
    # multiset's own retained exchanges overflowed at 4e8 candidates).
    # The AllPairs size lemma is exactness-preserving: J ≥ t and
    # ni ≤ min(na, nb) force t ≤ na/nb ≤ 1/t, so an over-ratio pair can
    # never reach the threshold — the predicate rides the join
    # condition, so such a pair never exists as a row anywhere. The
    # ratio compares in INTEGER arithmetic (na·q ≥ nb·p for t = p/q) —
    # a double 0.8·nb misdrops the exact-boundary pair (na, nb) =
    # (4k, 5k). p/q comes from _floor_fraction, which guarantees
    # p/q ≤ the double threshold the final verify compares against —
    # the direction that keeps the prefilter conservative.
    p, q = _floor_fraction(_JACCARD_T)

    def size_pred() -> F.Column:
        return (F.col("a.n") * q >= F.col("b.n") * p) & (
            F.col("b.n") * q >= F.col("a.n") * p
        )

    # Self-triggering volume guard (round-14): profile bucket widths,
    # drop the widest buckets if Σ pairs would exceed the budget (see
    # _apply_candidate_budget — this is the in-operator promotion of
    # round-13's standalone probe_minhash_diag.py). On healthy corpora
    # (every committed fixture through sf100rv) the guard never
    # triggers and the candidate set — hence the oracle result — is
    # bit-identical; when it triggers, the decision and the recall
    # lower bound are recorded in LAST_MINHASH_GUARD.
    budget = int(
        os.environ.get(
            "SPARK_GRAFT_LSH_CANDIDATE_BUDGET", str(_CANDIDATE_BUDGET_DEFAULT)
        )
    )
    LAST_MINHASH_GUARD.clear()
    candidates = band_candidates(
        bands,
        pair_pred=size_pred,
        candidate_budget=budget if budget > 0 else None,
        guard_info=LAST_MINHASH_GUARD,
        # parquet metadata count — feeds the guard's density exemption
        n_docs=docs.count() if budget > 0 else None,
    )
    if LAST_MINHASH_GUARD.get("triggered"):
        d = LAST_MINHASH_GUARD["bands_affected"]
        LAST_MINHASH_GUARD["recall_lower_bound_at_t"] = round(
            1.0 - (1.0 - _JACCARD_T**_ROWS) ** (_BANDS - d), 8
        )
        _surface_guard_decision(LAST_MINHASH_GUARD)

    # exact verify on the surviving pairs only: attach both token arrays
    # (joins on doc_id — broadcast at test scale, co-partitioned shuffle
    # joins at 100 TB) and intersect in codegen. Replaces the exploded
    # token⋈token join whose output was |pairs|·|overlap| rows. Tokens
    # are intersected as xxhash64 values (8-byte comparisons instead of
    # strings; distinct-token sets, so |∩| is unchanged barring a 64-bit
    # collision ~1e-9 for this vocabulary).
    hashed = tok_arr.select(
        "doc_id", F.transform("toks", lambda t: F.xxhash64(t)).alias("toks")
    )
    pa = hashed.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("ta"))
    pb = hashed.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("tb"))
    verified = (
        candidates.join(pa, "doc_a")
        .join(pb, "doc_b")
        .withColumn("ni", F.size(F.array_intersect("ta", "tb")))
        .withColumn("na", F.size("ta"))
        .withColumn("nb", F.size("tb"))
    )
    jac = F.col("ni").cast("double") / (F.col("na") + F.col("nb") - F.col("ni"))
    return verified.filter(jac >= _JACCARD_T).select(
        "doc_a", "doc_b", F.round(jac, 6).alias("jaccard")
    )


_BIGRAM_T = 0.6

_JACCARD_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, t[i] || ' ' || t[i + 1] AS shingle
      FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i) ix
    ), n AS (
      SELECT doc_id, count(*) AS ns FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           ROUND(CAST(ni AS DOUBLE) / (na.ns + nb.ns - ni), 6) AS jaccard
    FROM inter
    JOIN n na ON na.doc_id = doc_a
    JOIN n nb ON nb.doc_id = doc_b
    WHERE CAST(ni AS DOUBLE) / (na.ns + nb.ns - ni) >= {_BIGRAM_T}
"""


@query("llm_jaccard_dedup", oracle=_JACCARD_ORACLE)
def llm_jaccard_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard near-dup pairs: word-bigram shingles, pairwise
    Jaccard ≥ 0.6, exact, via **prefix filtering** (AllPairs/PPJoin):
    under a global rarest-first shingle order, two sets with J ≥ t must
    share a shingle within their first |d| − ⌈t·|d|⌉ + 1 elements — so
    only those prefixes generate candidates, and frequent (boilerplate)
    shingles never join. Verification intersects hashed shingle arrays
    per candidate pair in codegen.

    Bigram shingles capture local word order that the token-set Jaccard
    of `llm_near_dedup_minhash` ignores. At 100 TB this is the standard
    exact set-similarity join: candidate volume tracks rare-shingle
    collisions, not corpus size².
    """
    # Round-16: AQE-off clone A/B'd and NEUTRAL here too (2.95 s on vs
    # 3.06 s off, interleaved medians of 5 at sf0.1) — the round-15
    # "4.6 vs 2.4 s" gap was measured before the fan-out repartitions
    # landed and no longer exists. See llm_near_dedup_minhash.
    docs = load(spark, sf_dir, "documents")
    t = F.split("text", " ")
    # bigrams via zip_with over two aligned slices of ONE split (the
    # llm_gopher_repetition idiom) — NOT transform(sequence,
    # i -> element_at(t, i)): codegen does not CSE the array argument
    # across a HOF lambda boundary, so each element_at re-evaluated the
    # split and the per-doc cost went O(words²) (round-12 finding,
    # measured 10× on the trigram sibling at sf10)
    m = F.greatest(F.size(t) - 1, F.lit(0))
    bigrams = F.array_distinct(
        F.zip_with(
            F.slice(t, 1, m),
            F.slice(t, 2, m),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    )
    sh = docs.select("doc_id", F.explode(bigrams).alias("shingle"))

    # global order: rarest shingle first (df asc, shingle asc tiebreak)
    freq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    ranked = (
        sh.join(freq, "shingle")
        .groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("df", "shingle"))
            ).alias("ranked")
        )
    )
    n = F.size("ranked")
    plen = (n - F.ceil(F.lit(_BIGRAM_T) * n) + 1).cast("int")
    docs_arr = ranked.select(
        "doc_id",
        F.transform("ranked", lambda s: F.xxhash64(s["shingle"])).alias("hs"),
        F.slice(F.transform("ranked", lambda s: F.xxhash64(s["shingle"])), 1, plen).alias(
            "prefix"
        ),
    )

    # PPJoin positional filter (also exact): a match at 0-based prefix
    # position p leaves at most |d| − p overlappable elements, and
    # J ≥ t needs overlap ≥ ⌈t/(1+t)·(|a|+|b|)⌉ — matches that cannot
    # reach the bound are dropped inside the join stage, before the
    # distinct shuffle.
    # Fan-out-aware partitioning (round-15, same pathology and fix as
    # band_candidates): the prefix rows are byte-light but the
    # prefix-collision self-join is row-explosive, so AQE's byte-based
    # coalescing under-parallelizes it; explicit repartition on the
    # join key keeps the stage wide. Measured at sf0.1: 8.4 s → 4.6 s
    # with this + the dedup repartition below (median of 3).
    par = shuffle_parallelism(docs)
    pref = docs_arr.select(
        "doc_id",
        F.size("hs").alias("n"),
        F.posexplode("prefix").alias("pos", "p"),
    ).repartition(par, "p")
    a, b = pref.alias("a"), pref.alias("b")
    alpha = F.ceil(
        F.lit(_BIGRAM_T / (1 + _BIGRAM_T)) * (F.col("a.n") + F.col("b.n"))
    )
    ubound = F.least(
        F.col("a.n") - F.col("a.pos"), F.col("b.n") - F.col("b.pos")
    )
    candidates = (
        a.join(
            b,
            (F.col("a.p") == F.col("b.p"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (ubound >= alpha),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .repartition(par, "doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )

    pa = docs_arr.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("ha"))
    pb = docs_arr.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hb"))
    verified = (
        candidates.join(pa, "doc_a")
        .join(pb, "doc_b")
        .withColumn("ni", F.size(F.array_intersect("ha", "hb")))
        .withColumn("na", F.size("ha"))
        .withColumn("nb", F.size("hb"))
    )
    jac = F.col("ni").cast("double") / (F.col("na") + F.col("nb") - F.col("ni"))
    return verified.filter(jac >= _BIGRAM_T).select(
        "doc_a", "doc_b", F.round(jac, 6).alias("jaccard")
    )


_HI_HEX = "('8','9','a','b','c','d','e','f')"

_SIMHASH_ORACLE = f"""
    WITH tok AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents
    ), bits AS (
      SELECT doc_id, k.k,
             SUM(CASE WHEN substr(md5(token), k.k + 1, 1) IN {_HI_HEX}
                      THEN 1 ELSE -1 END) AS s
      FROM tok, (SELECT unnest(range(0, 16)) AS k) k
      GROUP BY doc_id, k.k
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN s >= 0 THEN 1 << k ELSE 0 END) AS BIGINT)
             AS simhash
    FROM bits GROUP BY doc_id
"""


@query("llm_simhash_dedup", oracle=_SIMHASH_ORACLE)
def llm_simhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprint per document: 16 bits, bit k = sign of the sum
    over tokens of ±1 driven by hex digit k of md5(token).

    md5 is the cross-engine-portable hash; one explode + two hash-aggs.
    Near-dup retrieval then joins on fingerprint bands and filters by
    `bit_count(simhash XOR other) <= d` — the pair step reuses the LSH
    machinery from MinHash, so only the sketch is materialized here.
    """
    docs = load(spark, sf_dir, "documents")
    tok = _tokens(docs)
    h = F.md5("token")
    per_bit = [
        F.sum(
            F.when(F.substring(h, k + 1, 1).isin(list("89abcdef")), 1).otherwise(-1)
        ).alias(f"s{k}")
        for k in range(16)
    ]
    bits = tok.groupBy("doc_id").agg(*per_bit)
    fingerprint = None
    for k in range(16):
        term = F.when(F.col(f"s{k}") >= 0, F.lit(1 << k)).otherwise(F.lit(0))
        fingerprint = term if fingerprint is None else fingerprint + term
    return bits.select("doc_id", fingerprint.cast("long").alias("simhash"))


@query(
    "llm_embed_dup",
    oracle="""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 4) AS cos
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])) >= 0.4
    """,
)
def llm_embed_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (threshold 0.4 — the synthetic
    embeddings carry no true duplicates, max pairwise cosine ≈ 0.51, so
    the threshold exercises the pipeline on real matches).

    Exact pairwise via blocked GEMM (the verify tier — each block-pair
    task is one BLAS matmul emitting only its above-threshold entries);
    at 100 TB candidate generation goes through llm_ann_lsh buckets
    first — same verify code path.
    """
    from flume_hive_batch_sink_spark.llm.similarity import blocked_threshold_pairs

    emb = load(spark, sf_dir, "embeddings")
    pairs = blocked_threshold_pairs(emb, threshold=0.4, cache_key=sf_dir)
    return pairs.select("vec_a", "vec_b", F.round("cos_raw", 4).alias("cos"))


# Duplicated-substring span detection (the "exact substring dedup" tier
# of training-data curation, after Lee et al. 2022's finding that
# verbatim repeated spans — boilerplate, licenses, templates — degrade
# LM training even when whole documents differ).
_SPAN_K = 32


@query(
    "llm_substring_dup_spans",
    oracle=f"""
    WITH g AS (
      SELECT doc_id, p.p AS pos, substr(text, p.p, {_SPAN_K}) AS gram
      FROM documents,
           LATERAL (SELECT unnest(range(1, length(text) - {_SPAN_K - 1} + 1))
                    AS p) p
      WHERE length(text) >= {_SPAN_K}
    ),
    d AS (
      SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    m AS (SELECT g.doc_id, g.pos FROM g JOIN d USING (gram)),
    sp AS (
      SELECT doc_id, pos,
             CASE WHEN lag(pos) OVER w IS NULL
                       OR pos - lag(pos) OVER w > {_SPAN_K}
                  THEN 1 ELSE 0 END AS st
      FROM m WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    a AS (
      SELECT doc_id, COUNT(*) AS n_dup_pos, SUM(st) AS n_spans
      FROM sp GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(length(t.text) - {_SPAN_K - 1} AS BIGINT) AS n_grams,
           CAST(COALESCE(a.n_dup_pos, 0) AS BIGINT) AS n_dup_pos,
           CAST(COALESCE(a.n_spans, 0) AS BIGINT) AS n_spans,
           round(COALESCE(a.n_dup_pos, 0)
                 / (length(t.text) - {_SPAN_K - 1.0}), 9) AS dup_frac
    FROM documents t LEFT JOIN a USING (doc_id)
    WHERE length(t.text) >= {_SPAN_K}
    """,
)
def llm_substring_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-substring detection: for every doc, how many of
    its 32-char grams appear verbatim in ANOTHER doc, and how many
    merged duplicate spans that forms (runs of duplicated gram positions
    closer than K chars collapse into one span).

    100 TB shape: the gram explode projects to (doc_id, pos,
    xxhash64(gram)) BEFORE the shuffle — 8-byte keys, never the gram
    text — so the exchanged volume is ~16 bytes per character position
    regardless of K. The duplicated-key set comes from one hash
    aggregation (map-side partial on xxhash64), membership is a shuffle
    semi-join on the 8-byte key, and span merging is a per-doc window
    (hash-partitioned by doc_id — no global window). The SQL oracle
    groups the gram STRINGS; the 2^-64 xxhash64 collision probability is
    the standard fingerprint-dedup trade (same as MinHash above) and a
    paranoid deployment re-verifies candidates against gram bytes.
    """
    k = _SPAN_K
    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.length("text") >= k)
    )
    grams = docs.select(
        "doc_id",
        F.explode(F.expr(f"sequence(1, length(text) - {k - 1})")).alias("pos"),
        "text",
    ).select(
        "doc_id",
        "pos",
        F.xxhash64(F.col("text").substr(F.col("pos"), F.lit(k))).alias("ghash"),
    )
    dup_keys = (
        grams.groupBy("ghash")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("ghash")
    )
    marked = grams.join(dup_keys, "ghash", "left_semi")

    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy("pos")
    spans = marked.withColumn(
        "st",
        F.when(
            F.lag("pos").over(w).isNull()
            | (F.col("pos") - F.lag("pos").over(w) > k),
            1,
        ).otherwise(0),
    )
    agg = spans.groupBy("doc_id").agg(
        F.count("*").alias("n_dup_pos"), F.sum("st").alias("n_spans")
    )
    totals = docs.select(
        "doc_id", (F.length("text") - (k - 1)).cast("bigint").alias("n_grams")
    )
    return totals.join(agg, "doc_id", "left").select(
        "doc_id",
        "n_grams",
        F.coalesce("n_dup_pos", F.lit(0)).cast("bigint").alias("n_dup_pos"),
        F.coalesce("n_spans", F.lit(0)).cast("bigint").alias("n_spans"),
        F.round(
            F.coalesce("n_dup_pos", F.lit(0)) / F.col("n_grams").cast("double"), 9
        ).alias("dup_frac"),
    )


# Containment-join parameters: asymmetric near-dup (quotes, excerpts,
# wrapped reposts) that Jaccard misses when |A| << |B|.
_CONTAIN_T = 0.8
_CONTAIN_DF_CAP = 50


@query(
    "llm_containment_dedup",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), sh0 AS (
      SELECT DISTINCT doc_id, t[i] || ' ' || t[i + 1] AS shingle
      FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i) ix
    ), keep AS (
      SELECT shingle FROM sh0 GROUP BY shingle
      HAVING COUNT(*) <= {_CONTAIN_DF_CAP}
    ), sh AS (
      SELECT s.doc_id, s.shingle FROM sh0 s JOIN keep k USING (shingle)
    ), n AS (
      SELECT doc_id, COUNT(*) AS ns FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS ni
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
      GROUP BY 1, 2
    )
    SELECT i.doc_a, i.doc_b,
           ROUND(CAST(i.ni AS DOUBLE) / na.ns, 6) AS containment
    FROM inter i JOIN n na ON na.doc_id = i.doc_a
    WHERE CAST(i.ni AS DOUBLE) / na.ns >= {_CONTAIN_T}
    """,
)
def llm_containment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC containment near-dup: ordered pairs (a, b) where
    C(a→b) = |Sa ∩ Sb| / |Sa| ≥ 0.8 over word-bigram shingle sets —
    catches a short doc quoted/embedded inside a longer one, which
    symmetric Jaccard dilutes to ~|Sa|/|Sb| and misses.

    Two stacked scale controls, both exact:

    1. DOCUMENT-FREQUENCY CAP — shingles in more than {cap} docs
       (boilerplate, templates) are dropped from BOTH the index and the
       denominator (replayed identically by the oracle): the standard
       inverted-index stop-list bound.
    2. PROBE-SIDE PREFIX FILTER (round-12; the PPJoin technique from
       llm_jaccard_dedup, adapted to the asymmetric predicate) — under
       the global rarest-first shingle order, C(a→b) ≥ t means at most
       (1−t)·|Sa| of a's shingles miss Sb, so by pigeonhole one of a's
       first ⌊(1−t)·|Sa|⌋+1 shingles IS in Sb: only that prefix of the
       PROBE side generates candidates, against the FULL index side
       (the index side has no prefix bound — all of Sa may sit in b's
       tail, which is why plain PPJoin prefixes are unsound here and
       only the probe side is prefixed). The positional filter is the
       first-common-element bound: every common element sits at-or-
       after the first one in BOTH rarest-first arrays, so a true pair
       satisfies min(|Sa|−pa, |Sb|−pb) ≥ ⌈t·|Sa|⌉ at that match.
       Candidate volume now tracks RARE-shingle · index co-occurrence
       (prefixes are the rarest shingles by construction) instead of
       Σ df² over every capped shingle; verification intersects the
       EXACT shingle-string arrays per surviving pair in codegen —
       hashes are only the candidate-generation key, so a 64-bit
       collision can at worst admit one extra candidate that exact
       verification then rejects (it can never change the reported
       containment value, matching the oracle bit-for-bit).
    """
    docs = load(spark, sf_dir, "documents")
    t = F.split("text", " ")
    # zip_with slices, not transform+element_at — see llm_jaccard_dedup:
    # the HOF-lambda element_at form re-evaluates the split per access
    # (O(words²) per doc, the round-12 finding)
    m = F.greatest(F.size(t) - 1, F.lit(0))
    bigrams = F.array_distinct(
        F.zip_with(
            F.slice(t, 1, m),
            F.slice(t, 2, m),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    )
    sh0 = docs.select("doc_id", F.explode(bigrams).alias("shingle"))
    freq = (
        sh0.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= _CONTAIN_DF_CAP)
    )
    # per-doc shingle arrays in the global rarest-first order (df asc,
    # shingle asc) — the same order on every doc makes the positional
    # filter sound
    ranked = (
        sh0.join(freq, "shingle")
        .groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("df", "shingle"))).alias(
                "ranked"
            )
        )
    )
    n = F.size("ranked")
    plen = (n - F.ceil(F.lit(_CONTAIN_T) * n) + 1).cast("int")
    hs = F.transform("ranked", lambda s: F.xxhash64(s["shingle"]))
    ss = F.transform("ranked", lambda s: s["shingle"])
    docs_arr = ranked.select(
        "doc_id",
        hs.alias("hs"),
        ss.alias("ss"),
        F.slice(hs, 1, plen).alias("prefix"),
    )
    probe = docs_arr.select(
        F.col("doc_id").alias("doc_a"),
        F.size("hs").alias("na"),
        F.posexplode("prefix").alias("pa", "h"),
    )
    index = docs_arr.select(
        F.col("doc_id").alias("doc_b"),
        F.size("hs").alias("nb"),
        F.posexplode("hs").alias("pb", "h"),
    )
    need = F.ceil(F.lit(_CONTAIN_T) * F.col("na"))
    candidates = (
        probe.join(
            index,
            (probe.h == index.h)
            & (F.col("doc_a") != F.col("doc_b"))
            & (F.col("na") - F.col("pa") >= need)
            & (F.col("nb") - F.col("pb") >= need),
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    pa = docs_arr.select(F.col("doc_id").alias("doc_a"), F.col("ss").alias("sa"))
    pb = docs_arr.select(F.col("doc_id").alias("doc_b"), F.col("ss").alias("sb"))
    verified = (
        candidates.join(pa, "doc_a")
        .join(pb, "doc_b")
        .withColumn("ni", F.size(F.array_intersect("sa", "sb")))
    )
    cont = F.col("ni").cast("double") / F.size("sa")
    return verified.filter(cont >= _CONTAIN_T).select(
        "doc_a", "doc_b", F.round(cont, 6).alias("containment")
    )


@query(
    "llm_dedup_rep_quality",
    oracle="""
    WITH grouped AS (
      SELECT doc_id, source, n_chars,
             md5(lower(trim(text))) AS content_key
      FROM documents
    ), ranked AS (
      SELECT doc_id, source, n_chars, content_key,
             row_number() OVER (
               PARTITION BY content_key
               ORDER BY n_chars DESC, doc_id) AS rk,
             CAST(count(*) OVER (PARTITION BY content_key) AS BIGINT)
               AS group_size
      FROM grouped
    )
    SELECT content_key, doc_id AS rep_doc_id, source AS rep_source,
           n_chars AS rep_chars, group_size
    FROM ranked WHERE rk = 1
    """,
)
def llm_dedup_rep_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware representative selection — the refinement over
    llm_exact_dedup's keep-lowest-id rule: within each exact-duplicate
    group (md5 of normalized text), keep the HIGHEST-QUALITY copy
    (longest n_chars, deterministic doc_id tiebreak). In a real corpus
    duplicates differ by truncation and boilerplate stripping, so the
    kept copy materially affects training data; the quality criterion
    is pluggable (swap n_chars for llm_quality_score's composite — the
    window shape is identical). One shuffle on the content key; the
    rank and group-size windows share that partitioning."""
    d = load(spark, sf_dir, "documents")
    grouped = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.md5(F.lower(F.trim("text"))).alias("content_key"),
    )
    w_rk = Window.partitionBy("content_key").orderBy(
        F.col("n_chars").desc(), "doc_id"
    )
    w_sz = Window.partitionBy("content_key")
    ranked = grouped.select(
        "doc_id",
        "source",
        "n_chars",
        "content_key",
        F.row_number().over(w_rk).alias("rk"),
        F.count("*").over(w_sz).alias("group_size"),
    )
    return ranked.filter(F.col("rk") == 1).select(
        "content_key",
        F.col("doc_id").alias("rep_doc_id"),
        F.col("source").alias("rep_source"),
        F.col("n_chars").alias("rep_chars"),
        "group_size",
    )


_PREFIX_BLOCK_TOKENS = 8


@query(
    "llm_prefix_dup",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, text, length(text) AS len,
             md5(array_to_string(
               list_slice(string_split(text, ' '), 1,
                          {_PREFIX_BLOCK_TOKENS}), ' ')) AS blk
      FROM documents
      WHERE len(string_split(text, ' ')) >= {_PREFIX_BLOCK_TOKENS}
    )
    SELECT a.doc_id AS short_id, b.doc_id AS long_id,
           CAST(a.len AS BIGINT) AS short_len,
           CAST(b.len AS BIGINT) AS long_len
    FROM docs a JOIN docs b
      ON a.blk = b.blk
     AND a.len < b.len
     AND substr(b.text, 1, CAST(a.len AS INT)) = a.text
     AND substr(b.text, CAST(a.len AS INT) + 1, 1) = ' '
    """,
)
def llm_prefix_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-duplicate detection — the crawl-truncation artifact class
    (the same page fetched whole and cut off mid-stream) that
    whole-document hashing misses and MinHash only catches at high
    overlap: doc A is a dup of B if A is a strict token-boundary
    PREFIX of B. Candidates block on the md5 of the first 8 tokens
    (truncations agree on their opening — the blocking key every
    prefix pair must share), so verification pairs are bounded by
    block sizes, never n². The verify is one substring compare plus a
    token-boundary guard (the next char in B must be a space — 'the
    cat' is not a prefix-dup of 'the catalog'). One shuffle on the
    block key; the same shape extends to suffix dups by reversing."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    docs = (
        d.filter(F.size(toks) >= _PREFIX_BLOCK_TOKENS)
        .select(
            "doc_id",
            "text",
            F.length("text").alias("len"),
            F.md5(
                F.array_join(
                    F.slice(toks, 1, _PREFIX_BLOCK_TOKENS), " "
                )
            ).alias("blk"),
        )
    )
    a = docs.select(
        F.col("doc_id").alias("short_id"),
        F.col("text").alias("a_text"),
        F.col("len").alias("short_len"),
        "blk",
    )
    b = docs.select(
        F.col("doc_id").alias("long_id"),
        F.col("text").alias("b_text"),
        F.col("len").alias("long_len"),
        F.col("blk").alias("b_blk"),
    )
    j = a.join(
        b,
        (F.col("blk") == F.col("b_blk"))
        & (F.col("short_len") < F.col("long_len"))
        & (
            F.expr("substr(b_text, 1, CAST(short_len AS INT))")
            == F.col("a_text")
        )
        & (F.expr("substr(b_text, CAST(short_len AS INT) + 1, 1)") == " "),
    )
    return j.select(
        "short_id",
        "long_id",
        F.col("short_len").cast("long").alias("short_len"),
        F.col("long_len").cast("long").alias("long_len"),
    )


_EST_K = 16       # estimator signature length (16 portable md5 minima)
_EST_MIN_J = 0.3  # calibrate on pairs with true Jaccard >= this

_MINHASH_EST_ORACLE = f"""
    WITH tok AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents
    ), n AS (
      SELECT doc_id, count(*) AS nt FROM tok GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
      FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), true_j AS (
      SELECT doc_a, doc_b,
             CAST(ni AS DOUBLE) / (na.nt + nb.nt - ni) AS j
      FROM inter
      JOIN n na ON na.doc_id = doc_a
      JOIN n nb ON nb.doc_id = doc_b
      WHERE CAST(ni AS DOUBLE) / (na.nt + nb.nt - ni) >= {_EST_MIN_J}
    ), sig AS (
      SELECT doc_id, k,
             min(md5(CAST(k AS VARCHAR) || ':' || token)) AS h
      FROM tok, range({_EST_K}) t(k)
      GROUP BY doc_id, k
    ), est AS (
      SELECT p.doc_a, p.doc_b, p.j,
             SUM(CASE WHEN sa.h = sb.h THEN 1 ELSE 0 END)
               / CAST({_EST_K} AS DOUBLE) AS est
      FROM true_j p
      JOIN sig sa ON sa.doc_id = p.doc_a
      JOIN sig sb ON sb.doc_id = p.doc_b AND sb.k = sa.k
      GROUP BY 1, 2, 3
    )
    SELECT doc_a, doc_b, ROUND(j, 6) AS jaccard, est,
           ROUND(ABS(est - j), 6) AS abs_err
    FROM est
"""


def _minhash_estimate_frame(
    docs: DataFrame, pair_sampled: bool = False
) -> DataFrame:
    """The estimator-calibration dataflow shared by the full-corpus key
    (sf0.01 certificate tier) and the content-addressed-sampled key
    (the 100 TB path): per-doc md5 signatures (map-side codegen), exact
    all-pairs Jaccard over whatever ``docs`` holds, per-pair estimate
    vs truth. Pair count is quadratic in len(docs) BY PURPOSE — the
    caller bounds it. ``pair_sampled`` additionally scopes the truth
    join to the content-addressed 1/16 pair sample (the predicate sits
    IN the join condition, so array_intersect only runs for kept
    pairs)."""
    tok_arr = token_arrays(docs)

    # seed bound via closure — see _minhash in llm_near_dedup_minhash
    # for why a defaulted second lambda parameter silently breaks
    def _est_sig(k: int) -> F.Column:
        prefix = F.lit(f"{k}:")
        return F.array_min(
            F.transform(F.col("toks"), lambda t: F.md5(F.concat(prefix, t)))
        )

    # Round-16 (guide §2.3, narrower types): the estimate only needs
    # per-position EQUALITY of the md5-min winners, so each winner is
    # collapsed to xxhash64 of its md5 hex digest — the argmin still
    # runs on md5-string order (the oracle-pinned permutation), but the
    # pair join ships 16 longs instead of 16 x 33-char strings and the
    # zip_with compares 8-byte values. Same exactness class as the
    # accepted token-intersect transform: equal iff the md5 winners are
    # equal barring a ~1e-19/compare 64-bit collision.
    sig = tok_arr.select(
        "doc_id",
        F.array(*[F.xxhash64(_est_sig(k)) for k in range(_EST_K)]).alias("sig"),
    )

    hashed = tok_arr.select(
        "doc_id", F.transform("toks", lambda t: F.xxhash64(t)).alias("toks")
    )
    # The sampled doc relation is tiny (a few thousand rows in 1-2 scan
    # partitions), but the pair join fans it out quadratically — left
    # in scan partitioning, millions of pair evaluations land on 2
    # tasks while the rest of the cluster idles. Round-robin the
    # streamed side across the full parallelism first: the shuffle
    # moves only |docs| rows, the O(|docs|²) probe work spreads evenly.
    par = docs.sparkSession.sparkContext.defaultParallelism
    pa = hashed.repartition(par).select(
        F.col("doc_id").alias("doc_a"), F.col("toks").alias("ta")
    )
    pb = hashed.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("tb"))
    cond = F.col("doc_a") < F.col("doc_b")
    if pair_sampled:
        cond = cond & _pair_sample_pred(F.col("doc_a"), F.col("doc_b"))
    # No broadcast hint: a user hint is honored regardless of
    # autoBroadcastJoinThreshold, so at corpus scale a forced
    # broadcast of pb (a fixed FRACTION of the corpus, not a fixed
    # size) would OOM. The planner sizes pb itself — broadcast-NL at
    # certificate scale, partition-paired cartesian past the
    # threshold; the repartition keeps the probe work spread either
    # way.
    true_j = (
        pa.join(pb, cond)
        .withColumn("ni", F.size(F.array_intersect("ta", "tb")))
        .withColumn(
            "j",
            F.col("ni").cast("double")
            / (F.size("ta") + F.size("tb") - F.col("ni")),
        )
        .filter(F.col("j") >= _EST_MIN_J)
        .select("doc_a", "doc_b", "j")
    )

    sa = sig.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sa"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sb"))
    est = F.aggregate(
        F.zip_with("sa", "sb", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, m: acc + m,
    ).cast("double") / _EST_K
    return (
        true_j.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("est", est)
        .select(
            "doc_a",
            "doc_b",
            F.round("j", 6).alias("jaccard"),
            "est",
            F.round(F.abs(F.col("est") - F.col("j")), 6).alias("abs_err"),
        )
    )


@query("llm_minhash_estimate", oracle=_MINHASH_EST_ORACLE)
def llm_minhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator calibration — the measurement that justifies
    every banding threshold upstream: P[sig position matches] = J
    exactly, so the matching-position fraction of a K-hash signature
    estimates Jaccard with std sqrt(J(1-J)/K). This key computes, for
    every pair with true J >= 0.3, the 16-position estimate alongside
    exact Jaccard and the absolute error — per-pair, hash-compared, no
    certificate softening. Tuning the LSH family (llm_near_dedup_minhash's
    16 bands x 2 rows) against MEASURED estimator error instead of the
    asymptotic formula is how a production dedup pipeline picks its
    operating point.

    Portability: signatures are per-position minima of md5(k || ':' ||
    token) compared AS STRINGS — MinHash only needs a total order on
    hash values, and lexicographic order over identical md5 hex digests
    is engine-identical, so the oracle replays every signature position
    exactly (the sketch_bloom_prejoin convention, extended to string
    keys). Spark shape: signatures are array_min/transform codegen over
    the per-doc token array (map-side, zero shuffle); the estimate is a
    zip_with equality fold over the two 16-element signature arrays —
    candidate pairs never explode into (pair x K) rows. At 100 TB the
    pair set comes from the LSH candidate generator, making this a
    sampling-free audit that rides the existing dedup dataflow.
    llm_minhash_estimate_sampled is the corpus-scale sibling (same
    audit, content-addressed doc sample, sf1-green).
    """
    docs = load(spark, sf_dir, "documents")
    return _minhash_estimate_frame(docs)


# Content-addressed calibration sample: md5 prefix < '10' keeps
# 16/256 = 6.25% of documents — the same per-row, coordination-free
# idiom as split_train_test, so membership is stable under
# repartitioning and re-runs and the oracle replays it bit-exactly.
_EST_SAMPLE_SALT = "est-sample-v1:"
_EST_SAMPLE_LT = "10"

# Content-addressed PAIR sub-sample for the calibration tier's exact
# ground truth: md5 prefix < '10' keeps 16/256 = 1/16 of candidate
# pairs. Same replayability argument as the doc sample — membership is
# a pure function of the two ids, so any executor classifies any pair
# with zero coordination and the DuckDB oracle replays it bit-exactly.
# Sampling PAIRS (uniformly, content-independent) leaves the estimator
# error / banding P-R estimands unbiased while capping the quadratic
# truth cost: the doc sample bounds pairs at (p·n)², the pair sample
# cuts the expensive per-pair work (array_intersect, signature
# compare) by a further 16x — the round-9 sf1 sweep spent ~85% of its
# wall time in these two keys' truth joins.
_PAIR_SAMPLE_SALT = "pair-sample-v1:"
_PAIR_SAMPLE_LT = "10"


def _pair_sample_sql(a: str, b: str) -> str:
    """DuckDB predicate keeping the content-addressed 1/16 pair sample."""
    return (
        f"substring(md5('{_PAIR_SAMPLE_SALT}' || CAST({a} AS VARCHAR) || "
        f"':' || CAST({b} AS VARCHAR)), 1, 2) < '{_PAIR_SAMPLE_LT}'"
    )


def _pair_sample_pred(a: F.Column, b: F.Column) -> F.Column:
    """Spark twin of _pair_sample_sql — cheap enough to sit in a join
    condition, so the quadratic join evaluates md5 per pair but the
    expensive per-pair work (array_intersect, signature compare) only
    runs for the kept 1/16."""
    return (
        F.substring(
            F.md5(
                F.concat(
                    F.lit(_PAIR_SAMPLE_SALT),
                    a.cast("string"),
                    F.lit(":"),
                    b.cast("string"),
                )
            ),
            1,
            2,
        )
        < _PAIR_SAMPLE_LT
    )


def _sampled_oracle(parent_oracle: str) -> str:
    """Derive a sampled sibling's oracle by scoping the parent's ONE
    documents scan to the content-addressed sample. Import-time
    assertion on the occurrence count: a silent ``str.replace`` would
    rewrite every scan (or none) if a parent ever gained a second
    ``FROM documents`` — diverging the oracle from the engine without
    any test noticing (round-7 advice)."""
    anchor = "FROM documents"
    n = parent_oracle.count(anchor)
    if n != 1:
        raise AssertionError(
            f"sampled-oracle template expects exactly one {anchor!r} "
            f"in the parent oracle, found {n} — scope the sample "
            "predicate by hand for this parent"
        )
    return parent_oracle.replace(
        anchor,
        "FROM documents WHERE substring(md5('"
        + _EST_SAMPLE_SALT
        + "' || CAST(doc_id AS VARCHAR)), 1, 2) < '"
        + _EST_SAMPLE_LT
        + "'",
    )


# doc sample scoped inside, pair sample as an outer filter — valid
# because the parent's output grain IS the pair (doc_a, doc_b).
_MINHASH_EST_SAMPLED_ORACLE = (
    "SELECT * FROM ("
    + _sampled_oracle(_MINHASH_EST_ORACLE)
    + f") WHERE {_pair_sample_sql('doc_a', 'doc_b')}"
)


@query("llm_minhash_estimate_sampled", oracle=_MINHASH_EST_SAMPLED_ORACLE)
def llm_minhash_estimate_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """llm_minhash_estimate's 100 TB path: the same per-pair
    estimate-vs-exact-Jaccard calibration, computed over a
    CONTENT-ADDRESSED 6.25% document sample (md5(doc_id) prefix <
    0x10) instead of the full corpus. The parent key's ground truth is
    all-pairs by definition — O(n²) and deliberately scoped to the
    sf0.01 certificate tier; sampling the DOCS (not the pairs) keeps
    the truth side quadratic only in the sample (0.0625² ≈ 1/256 of
    the pairs) while still measuring the estimator on the corpus's own
    token distribution — which is exactly how a production pipeline
    calibrates banding thresholds on a petabyte corpus: certify the
    estimator on a small sample, then trust P[match] = J for the full
    run. The sample is a fixed FRACTION (6.25%), not a fixed size — it
    grows with the corpus, which is why the truth join carries no
    broadcast hint (the planner demotes past the threshold; a user
    hint would be honored unconditionally and OOM). The sample rule is the split_train_test idiom (salted
    md5 range), so any executor classifies any row with zero
    coordination, membership survives repartitioning/appends, and the
    DuckDB oracle replays the exact same sample — the certificate
    never softens to rows-only. Estimator std is sqrt(J(1-J)/16) ≈
    0.125 at J=0.5 regardless of corpus size; the sample only has to
    surface enough qualifying pairs to exhibit it, not every pair.

    The truth join is further scoped to the content-addressed 1/16
    PAIR sample (_pair_sample_pred, in the join condition): uniform
    content-independent pair sampling leaves the per-pair estimand
    untouched and caps the quadratic array_intersect work — at sf1
    the unsampled pair set is ~5M and dominated the whole calibration
    sweep's wall time (round-9 verdict #4)."""
    docs = load(spark, sf_dir, "documents").filter(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(_EST_SAMPLE_SALT), F.col("doc_id").cast("string")
                )
            ),
            1,
            2,
        )
        < _EST_SAMPLE_LT
    )
    return _minhash_estimate_frame(docs, pair_sampled=True)


# Incremental-dedup bloom parameters — same engine-portable hash family
# as sketch_bloom_prejoin (operators/sketches.py), same modulus chain.
_INC_M = 8192
_INC_P = 2_147_483_647
_INC_BATCH = ("src16", "src17", "src18", "src19")
_INC_HASHES = ((2654435761, 7), (2246822519, 131), (3266489917, 911))


@query(
    "llm_incremental_dedup",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, source,
             CAST(concat('0x', substr(md5(substr(lower(trim(text)), 1, 120)),
                                      1, 15)) AS BIGINT) AS k
      FROM documents
    ),
    corpus AS (
      SELECT DISTINCT k FROM h
      WHERE source NOT IN {_INC_BATCH!r}
    ),
    batch AS (
      SELECT doc_id, k FROM h WHERE source IN {_INC_BATCH!r}
    ),
    bits AS (
      SELECT DISTINCT b FROM (
        SELECT ((k % {_INC_P}) * 2654435761 + 7) % {_INC_P} % {_INC_M} AS b FROM corpus
        UNION ALL
        SELECT ((k % {_INC_P}) * 2246822519 + 131) % {_INC_P} % {_INC_M} FROM corpus
        UNION ALL
        SELECT ((k % {_INC_P}) * 3266489917 + 911) % {_INC_P} % {_INC_M} FROM corpus
      )
    ),
    ph AS (
      SELECT doc_id, k, ((k % {_INC_P}) * 2654435761 + 7) % {_INC_P} % {_INC_M} AS b
      FROM batch
      UNION ALL
      SELECT doc_id, k, ((k % {_INC_P}) * 2246822519 + 131) % {_INC_P} % {_INC_M}
      FROM batch
      UNION ALL
      SELECT doc_id, k, ((k % {_INC_P}) * 3266489917 + 911) % {_INC_P} % {_INC_M}
      FROM batch
    ),
    maybe AS (
      SELECT ph.doc_id, ph.k FROM ph JOIN bits USING (b)
      GROUP BY ph.doc_id, ph.k HAVING COUNT(*) = 3
    ),
    tru AS (
      SELECT m.doc_id FROM maybe m
      WHERE m.k IN (SELECT k FROM corpus)
    )
    SELECT CAST((SELECT COUNT(*) FROM batch) AS BIGINT) AS n_batch,
           CAST((SELECT COUNT(*) FROM corpus) AS BIGINT) AS n_corpus_keys,
           CAST((SELECT COUNT(*) FROM maybe) AS BIGINT) AS n_maybe,
           CAST((SELECT COUNT(*) FROM tru) AS BIGINT) AS n_true_dup,
           CAST((SELECT COUNT(*) FROM maybe)
                - (SELECT COUNT(*) FROM tru) AS BIGINT) AS n_false_pos,
           CAST(ROUND(1.0 - (SELECT COUNT(*) FROM maybe)
                            / CAST((SELECT COUNT(*) FROM batch) AS DOUBLE),
                      4) AS DOUBLE) AS prune_pct
    """,
)
def llm_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL dedup — the shape that matters at 100 TB: a new
    batch (sources src16–19) checks against the EXISTING corpus
    without re-scanning or re-joining the corpus per batch. The corpus
    compresses to an m=8192/k=3 Bloom bitmap over prefix fingerprints
    (md5 of the 120-char normalized prefix — the llm_prefix_dup tier;
    the fixture has no full-text exact dups across sources, prefix
    collisions are the realistic near-dup entry signal), the batch
    probes the broadcast bitmap, and only Bloom survivors pay the
    exact semi-join. The report certifies the economics: survivors,
    true duplicates, false positives, and the prune ratio — at scale
    the bitmap is kilobytes shipped to every executor while the
    corpus stays on disk.

    The engine-portable hash family replays every bit in the oracle
    EXACTLY (same multiply-add-mod chain as sketch_bloom_prejoin), so
    this is a zero-tolerance gate, not a certificate. Unlike the
    orderkey-domain bloom, the fingerprint keys are ~2^60, so both
    engines reduce k mod P BEFORE the multiply — the raw product
    overflows int64 identically on Spark (ANSI arithmetic) and
    DuckDB."""
    d = load(spark, sf_dir, "documents")
    key = F.conv(
        F.substring(F.md5(F.substring(F.lower(F.trim("text")), 1, 120)), 1, 15),
        16,
        10,
    ).cast("long")
    h = d.select("doc_id", "source", key.alias("k"))
    corpus = (
        h.filter(~F.col("source").isin(*_INC_BATCH)).select("k").distinct()
    )
    batch = h.filter(F.col("source").isin(*_INC_BATCH)).select("doc_id", "k")

    # All k=3 positions come from ONE projection + explode — a 3-way
    # union of sub-plans would scan (and re-aggregate) the corpus three
    # times; the array form keeps it to one pass on each side.
    def positions():
        return F.array(
            *[
                ((F.col("k") % _INC_P) * a + b) % _INC_P % _INC_M
                for a, b in _INC_HASHES
            ]
        )

    bits = corpus.select(F.explode(positions()).alias("b")).distinct()
    probes = batch.select(
        "doc_id", "k", F.explode(positions()).alias("b")
    )
    maybe = (
        probes.join(F.broadcast(bits), "b")
        .groupBy("doc_id", "k")
        .agg(F.count("*").alias("hits"))
        .filter(F.col("hits") == 3)
        .select("doc_id", "k")
    )
    tru = maybe.join(corpus, "k", "left_semi")
    n_batch = batch.agg(F.count("*").alias("n_batch"))
    n_corpus = corpus.agg(F.count("*").alias("n_corpus_keys"))
    n_maybe = maybe.agg(F.count("*").alias("n_maybe"))
    n_true = tru.agg(F.count("*").alias("n_true_dup"))
    return (
        n_batch.join(F.broadcast(n_corpus))
        .join(F.broadcast(n_maybe))
        .join(F.broadcast(n_true))
        .select(
            "n_batch",
            "n_corpus_keys",
            "n_maybe",
            "n_true_dup",
            (F.col("n_maybe") - F.col("n_true_dup")).alias("n_false_pos"),
            F.round(
                1.0 - F.col("n_maybe") / F.col("n_batch").cast("double"), 4
            ).alias("prune_pct"),
        )
    )


# Banding-certificate geometry: 16 md5-string hashes = 8 bands x 2 rows,
# measured at truth threshold J >= 0.5 where theoretical recall is
# 1-(1-J^2)^8 ~ 0.90 at the boundary — deliberately imperfect so the
# certificate MEASURES the miss rate instead of certifying a vacuous 1.0.
_PR_K = 16
_PR_BANDS = 8
_PR_ROWS = 2
_PR_T = 0.5


def _pr_sig_sql(k: int) -> str:
    return (
        f"list_min(list_transform(t, x -> md5('{k}:' || x)))"
    )


def _lsh_pr_oracle(pair_sql: str = "TRUE") -> str:
    """Banding-P/R oracle; ``pair_sql`` (a predicate over a.doc_id /
    b.doc_id) scopes BOTH the candidate join and the truth join to the
    same pair set, so precision and recall stay well-defined over the
    sampled pair population."""
    return f"""
    WITH toks AS (
      SELECT doc_id, list_distinct(string_split(text, ' ')) AS t
      FROM documents
    ),
    sig AS (
      SELECT doc_id,
             {", ".join(f"{_pr_sig_sql(k)} AS s{k}" for k in range(_PR_K))}
      FROM toks
    ),
    bands AS (
      {" UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, "
        f"md5(s{2 * b} || '|' || s{2 * b + 1}) AS band_key FROM sig"
        for b in range(_PR_BANDS)
      )}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id AND {pair_sql}
    ),
    sh AS (SELECT doc_id, unnest(t) AS token FROM toks),
    n AS (SELECT doc_id, count(*) AS nt FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
      FROM sh a JOIN sh b ON a.token = b.token AND a.doc_id < b.doc_id
       AND {pair_sql}
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT doc_a, doc_b FROM inter
      JOIN n na ON na.doc_id = doc_a JOIN n nb ON nb.doc_id = doc_b
      WHERE CAST(ni AS DOUBLE) / (na.nt + nb.nt - ni) >= {_PR_T}
    ),
    hits AS (
      SELECT c.doc_a FROM cand c
      JOIN truth t ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b
    )
    SELECT CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_candidates,
           CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_truth,
           CAST((SELECT count(*) FROM hits) AS BIGINT) AS n_hits,
           CAST(ROUND((SELECT count(*) FROM hits)
                      / CAST((SELECT count(*) FROM cand) AS DOUBLE), 6)
                AS DOUBLE) AS precision_at_t,
           CAST(ROUND((SELECT count(*) FROM hits)
                      / CAST((SELECT count(*) FROM truth) AS DOUBLE), 6)
                AS DOUBLE) AS recall_at_t
"""


_LSH_PR_ORACLE = _lsh_pr_oracle()


def _pr_tokens(docs: DataFrame) -> DataFrame:
    """Distinct token ARRAY per doc — shared by the md5 certificate
    family (P/R, bucket profile)."""
    return docs.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("t")
    )


def _pr_band_rows(toks: DataFrame) -> DataFrame:
    """(doc_id, band_idx, band_key) rows for the md5-string certificate
    banding (_PR_BANDS × _PR_ROWS over _PR_K md5 minima) — the
    DuckDB-replayable twin of minhash_bands (md5 hex digests order
    identically everywhere, so every bucket is bit-exact across
    engines). Pure map-side, same as the production family."""

    def sig(k: int) -> F.Column:
        pre = F.lit(f"{k}:")
        return F.array_min(
            F.transform(F.col("t"), lambda x: F.md5(F.concat(pre, x)))
        )

    sigs = toks.select(
        "doc_id", *[sig(k).alias(f"s{k}") for k in range(_PR_K)]
    )
    band_arr = F.array(
        *[
            F.md5(
                F.concat_ws("|", F.col(f"s{2 * b}"), F.col(f"s{2 * b + 1}"))
            )
            for b in range(_PR_BANDS)
        ]
    )
    return sigs.select(
        "doc_id", F.posexplode(band_arr).alias("band_idx", "band_key")
    )


def _lsh_band_pr_frame(docs: DataFrame, pair_sampled: bool = False) -> DataFrame:
    """The banding-P/R dataflow shared by the full-corpus certificate
    and its content-addressed-sampled scale sibling: md5 signatures →
    8×2 banding → candidate pairs by band key, exact all-pairs Jaccard
    truth over ``docs``, and the precision/recall summary. The truth
    side is quadratic in len(docs) BY PURPOSE — the caller bounds it."""
    toks = _pr_tokens(docs)
    bands = _pr_band_rows(toks)
    a, b = bands.alias("a"), bands.alias("b")
    cand_cond = (
        (F.col("a.band_idx") == F.col("b.band_idx"))
        & (F.col("a.band_key") == F.col("b.band_key"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
    )
    truth_cond = F.col("doc_a") < F.col("doc_b")
    if pair_sampled:
        # BOTH joins scope to the same content-addressed pair sample,
        # keeping precision and recall well-defined over it.
        cand_cond = cand_cond & _pair_sample_pred(
            F.col("a.doc_id"), F.col("b.doc_id")
        )
        truth_cond = truth_cond & _pair_sample_pred(
            F.col("doc_a"), F.col("doc_b")
        )
    cand = (
        a.join(b, cand_cond)
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    # spread the quadratic truth probe across the full parallelism —
    # same rationale as _minhash_estimate_frame's repartition(par)
    par = docs.sparkSession.sparkContext.defaultParallelism
    # Intersect xxhash64 token values, not strings (round-15, guide
    # §2.3 "narrower types"): the per-pair |∩| is unchanged barring a
    # 64-bit collision (~1e-9 per vocabulary) — the identical, already
    # accepted transform llm_near_dedup_minhash's verify tier uses —
    # and the truth tier is THE quadratic stage of this certificate.
    # Measured at sf0.1 (12.5M pairs): 13.1 s → 3.2 s (4.1×), pair set
    # bit-identical to the string intersect.
    hashed = toks.select(
        "doc_id", F.transform("t", lambda x: F.xxhash64(x)).alias("t")
    )
    pa = hashed.repartition(par).select(
        F.col("doc_id").alias("doc_a"), F.col("t").alias("ta")
    )
    pb = hashed.select(F.col("doc_id").alias("doc_b"), F.col("t").alias("tb"))
    # No broadcast hint (same rationale as _minhash_estimate_frame):
    # pb is a fixed fraction of the corpus, so a forced broadcast
    # grows linearly with data; the planner picks broadcast-NL at
    # certificate scale and degrades safely past the threshold.
    pairs = (
        pa.join(pb, truth_cond)
        .withColumn("ni", F.size(F.array_intersect("ta", "tb")))
        .withColumn("na", F.size("ta"))
        .withColumn("nb", F.size("tb"))
    )
    jac = F.col("ni").cast("double") / (
        F.col("na") + F.col("nb") - F.col("ni")
    )
    truth = pairs.filter(jac >= _PR_T).select("doc_a", "doc_b")
    # Single-pass summary (round-15, guide §1.2 "don't compute things
    # twice"): the old hits-join + three separate count aggregates
    # recomputed the cand subtree twice and the quadratic truth subtree
    # twice (Spark materializes nothing between actions in one plan
    # tree). Tagged union → per-pair max-flags → one global sum runs
    # each subtree exactly once and replaces the pair join with one
    # shuffle of (pair, flag) rows. Both inputs are distinct pair sets,
    # so max() per pair reproduces the join semantics exactly.
    # Measured at sf0.1: full certificate 21.0 s → 10.8 s (1.9×,
    # median of 3; combined with the hashed intersect above the key
    # went 37–66 s → ~11 s sweep-to-sweep).
    tagged = cand.select(
        "doc_a", "doc_b", F.lit(1).alias("c"), F.lit(0).alias("t")
    ).unionByName(
        truth.select(
            "doc_a", "doc_b", F.lit(0).alias("c"), F.lit(1).alias("t")
        )
    )
    flags = tagged.groupBy("doc_a", "doc_b").agg(
        F.max("c").alias("c"), F.max("t").alias("t")
    )
    return flags.agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_candidates"),
        F.coalesce(F.sum("t"), F.lit(0)).cast("long").alias("n_truth"),
        F.coalesce(F.sum(F.col("c") * F.col("t")), F.lit(0))
        .cast("long")
        .alias("n_hits"),
    ).select(
        "n_candidates",
        "n_truth",
        "n_hits",
        F.round(
            F.col("n_hits") / F.col("n_candidates").cast("double"), 6
        ).alias("precision_at_t"),
        F.round(F.col("n_hits") / F.col("n_truth").cast("double"), 6).alias(
            "recall_at_t"
        ),
    )


@query("llm_lsh_band_pr", oracle=_LSH_PR_ORACLE)
def llm_lsh_band_pr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding precision/recall certificate — the OTHER half of
    parameter tuning next to llm_minhash_estimate's estimator
    calibration: run an 8-band × 2-row banding over 16 MinHash
    positions and measure, against exact all-pairs Jaccard ground
    truth at J ≥ 0.5, how many true pairs the buckets surface (recall)
    and how much of the candidate set is junk the verify tier must
    discard (precision). The geometry is chosen so boundary recall is
    ~0.90 — the certificate records a REAL operating point, not a
    vacuous 1.0 (llm_near_dedup_minhash's production geometry is
    16×2 at J ≥ 0.8 where the miss rate is ~7e-8).

    Portability: signature positions are md5-string minima (MinHash
    needs only a total order; identical hex digests order identically
    everywhere), band keys are md5 over the concatenated band slice,
    so DuckDB replays every bucket bit-exactly — the banding itself is
    differential-tested, which the production xxhash64 path (not
    SQL-expressible) structurally cannot be. Plan: signatures and band
    keys are in-row array expressions (map-side), candidates shuffle
    only (band_idx, band_key), truth runs the exact token join —
    affordable precisely because this is the sf0.01 certificate tier.
    llm_lsh_band_pr_sampled is the corpus-scale sibling (same audit,
    content-addressed doc sample, sf1-green)."""
    docs = load(spark, sf_dir, "documents")
    return _lsh_band_pr_frame(docs)


_LSH_PR_SAMPLED_ORACLE = _sampled_oracle(
    _lsh_pr_oracle(_pair_sample_sql("a.doc_id", "b.doc_id"))
)


@query("llm_lsh_band_pr_sampled", oracle=_LSH_PR_SAMPLED_ORACLE)
def llm_lsh_band_pr_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """llm_lsh_band_pr's 100 TB path — the same banding
    precision/recall audit over the SAME content-addressed 6.25%
    document sample as llm_minhash_estimate_sampled (one sample serves
    the whole calibration tier, so the two certificates describe the
    same sub-corpus). Ground truth stays exact all-pairs, but
    quadratic only in the sample; banding P/R measured on a uniform
    doc sample estimates the full-corpus operating point because both
    candidate membership and truth membership are per-pair properties
    — sampling docs uniformly samples pairs uniformly (each pair
    survives with p², independent of its Jaccard). On top of the doc
    sample, BOTH the candidate join and the truth join are scoped to
    the content-addressed 1/16 PAIR sample (_pair_sample_pred) — P/R
    over a uniform, content-independent pair subset estimates the same
    operating point (candidacy and truth are per-pair properties) while
    cutting the quadratic array_intersect work 16x (round-9 verdict #4:
    this key and its minhash sibling were ~85% of the sf1 sweep).
    The oracle replays the sample, signatures, banding, and truth
    bit-exactly — the certificate never softens at scale."""
    docs = load(spark, sf_dir, "documents").filter(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(_EST_SAMPLE_SALT), F.col("doc_id").cast("string")
                )
            ),
            1,
            2,
        )
        < _EST_SAMPLE_LT
    )
    return _lsh_band_pr_frame(docs, pair_sampled=True)


_BUCKET_PROFILE_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, list_distinct(string_split(text, ' ')) AS t
      FROM documents
    ),
    sig AS (
      SELECT doc_id,
             {", ".join(f"{_pr_sig_sql(k)} AS s{k}" for k in range(_PR_K))}
      FROM toks
    ),
    bands AS (
      {" UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, "
        f"md5(s{2 * b} || '|' || s{2 * b + 1}) AS band_key FROM sig"
        for b in range(_PR_BANDS)
      )}
    ),
    prof AS (
      SELECT band_idx, band_key, count(*) AS w
      FROM bands GROUP BY 1, 2 HAVING count(*) > 1
    )
    SELECT band_idx,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(max(w) AS BIGINT) AS max_width,
           CAST(sum(w * (w - 1) // 2) AS BIGINT) AS n_pairs
    FROM prof GROUP BY band_idx
"""


@query("llm_lsh_bucket_profile", oracle=_BUCKET_PROFILE_ORACLE)
def llm_lsh_bucket_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band-bucket width profile — the measurement primitive of the
    round-14 self-triggering candidate-volume guard
    (_apply_candidate_budget), exposed as its own oracle-attested key:
    per band, the number of colliding buckets (w > 1), the widest
    bucket, and the exact candidate volume Σ w(w−1)/2 that the band
    would contribute to the LSH pair join. Runs over the md5-string
    certificate family (_pr_band_rows) so DuckDB replays every bucket
    bit-exactly; the production guard runs the identical profile over
    the xxhash64 family.

    100 TB shape: one map-side banding pass + a two-level hash-agg on
    8-byte-ish keys — the same cost class as a groupBy count; this is
    why the guard can afford to run unconditionally before every
    pair-generation stage."""
    toks = _pr_tokens(load(spark, sf_dir, "documents"))
    prof = (
        _pr_band_rows(toks)
        .groupBy("band_idx", "band_key")
        .agg(F.count("*").alias("w"))
        .filter(F.col("w") > 1)
    )
    return prof.groupBy("band_idx").agg(
        F.count("*").cast("long").alias("n_buckets"),
        F.max("w").cast("long").alias("max_width"),
        F.sum((F.col("w") * (F.col("w") - 1) / 2).cast("long"))
        .cast("long")
        .alias("n_pairs"),
    )


# Banding operating-point sweep: every (bands, rows) factorization of
# the 16-hash signature. One tuple list drives BOTH engines.
_SWEEP_SPLITS = ((16, 1), (8, 2), (4, 4), (2, 8), (1, 16))


def _sweep_coll_sql(b: int, r: int) -> str:
    """DuckDB collision predicate for a (b, r) split: some band has all
    r signature positions equal."""
    return " OR ".join(
        "("
        + " AND ".join(f"a.s{i * r + j} = b.s{i * r + j}" for j in range(r))
        + ")"
        for i in range(b)
    )


def _sweep_oracle() -> str:
    sig_cols = ", ".join(
        f"{_pr_sig_sql(k)} AS s{k}" for k in range(_PR_K)
    )
    flag_cols = ", ".join(
        f"({_sweep_coll_sql(b, r)}) AS c_{b}_{r}" for b, r in _SWEEP_SPLITS
    )
    agg_cols = ", ".join(
        f"SUM(CASE WHEN c_{b}_{r} THEN 1 ELSE 0 END) AS cand_{b}_{r}, "
        f"SUM(CASE WHEN c_{b}_{r} AND is_truth THEN 1 ELSE 0 END) AS hit_{b}_{r}"
        for b, r in _SWEEP_SPLITS
    )
    rows = " UNION ALL ".join(
        f"""SELECT {b} AS n_bands, {r} AS rows_per_band,
            CAST(cand_{b}_{r} AS BIGINT) AS n_candidates,
            CAST(n_truth AS BIGINT) AS n_truth,
            CAST(hit_{b}_{r} AS BIGINT) AS n_hits,
            CASE WHEN cand_{b}_{r} = 0 THEN NULL
                 ELSE CAST(ROUND(hit_{b}_{r} / CAST(cand_{b}_{r} AS DOUBLE), 6)
                      AS DOUBLE) END AS precision_at_t,
            CASE WHEN n_truth = 0 THEN NULL
                 ELSE CAST(ROUND(hit_{b}_{r} / CAST(n_truth AS DOUBLE), 6)
                      AS DOUBLE) END AS recall_at_t
            FROM agg"""
        for b, r in _SWEEP_SPLITS
    )
    return f"""
    WITH docs AS (
      SELECT doc_id, text FROM documents
      WHERE substring(md5('{_EST_SAMPLE_SALT}' || CAST(doc_id AS VARCHAR)),
                      1, 2) < '{_EST_SAMPLE_LT}'
    ),
    toks AS (
      SELECT doc_id, list_distinct(string_split(text, ' ')) AS t FROM docs
    ),
    sig AS (SELECT doc_id, t, {sig_cols} FROM toks),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_intersect(a.t, b.t)) AS ni,
             len(a.t) AS na, len(b.t) AS nb,
             {flag_cols}
      FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    ),
    flagged AS (
      SELECT *, CAST(ni AS DOUBLE) / (na + nb - ni) >= {_PR_T} AS is_truth
      FROM pairs
    ),
    agg AS (
      SELECT {agg_cols},
             SUM(CASE WHEN is_truth THEN 1 ELSE 0 END) AS n_truth
      FROM flagged
    )
    {rows}
    """


@query("llm_lsh_band_sweep", oracle=_sweep_oracle())
def llm_lsh_band_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banding operating-point sweep — the tuning DECISION the two
    calibration certificates (llm_lsh_band_pr*, llm_minhash_estimate*)
    feed: evaluate every (bands × rows) factorization of the 16-hash
    MinHash signature — (16,1), (8,2), (4,4), (2,8), (1,16) — against
    exact-Jaccard ground truth (J ≥ 0.5) on the shared 6.25%
    content-addressed calibration sample, reporting measured
    candidate volume / precision / recall per split. More rows per
    band = sharper S-curve = fewer false candidates but missed
    borderline dups; the sweep turns that theory into the corpus's OWN
    measured trade-off, which is how a production run picks (b, r)
    before committing a petabyte pass.

    Collisions are computed from the ACTUAL signatures on the sampled
    all-pairs relation (∃ band with all r positions equal — exact
    replay of what each banding would do, not the 1−(1−s^r)^b
    approximation), so the whole sweep is ONE pass: one quadratic-in-
    sample pair join carrying 16 signature columns, one aggregate
    producing all ten counters, five constant rows off that 1-row
    aggregate. Integer counts make precision/recall bit-portable; both
    are rounded from exact integers, NULL-guarded on empty candidate
    sets."""
    docs = load(spark, sf_dir, "documents").filter(
        F.substring(
            F.md5(F.concat(F.lit(_EST_SAMPLE_SALT), F.col("doc_id").cast("string"))),
            1,
            2,
        )
        < _EST_SAMPLE_LT
    )
    toks = docs.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("t")
    )

    def sig(k: int) -> F.Column:
        pre = F.lit(f"{k}:")
        return F.array_min(
            F.transform(F.col("t"), lambda x: F.md5(F.concat(pre, x)))
        )

    sigs = toks.select(
        "doc_id", "t", *[sig(k).alias(f"s{k}") for k in range(_PR_K)]
    )
    a = sigs.select(
        F.col("doc_id").alias("doc_a"),
        F.col("t").alias("ta"),
        *[F.col(f"s{k}").alias(f"a{k}") for k in range(_PR_K)],
    )
    b = sigs.select(
        F.col("doc_id").alias("doc_b"),
        F.col("t").alias("tb"),
        *[F.col(f"s{k}").alias(f"b{k}") for k in range(_PR_K)],
    )

    def coll(nb: int, r: int) -> F.Column:
        band_eq = []
        for i in range(nb):
            eq = None
            for j in range(r):
                term = F.col(f"a{i * r + j}") == F.col(f"b{i * r + j}")
                eq = term if eq is None else (eq & term)
            band_eq.append(eq)
        out = band_eq[0]
        for e in band_eq[1:]:
            out = out | e
        return out

    ni = F.size(F.array_intersect("ta", "tb"))
    pairs = a.join(b, F.col("doc_a") < F.col("doc_b")).select(
        (
            ni.cast("double")
            / (F.size("ta") + F.size("tb") - ni)
            >= _PR_T
        ).alias("is_truth"),
        *[coll(nb, r).alias(f"c_{nb}_{r}") for nb, r in _SWEEP_SPLITS],
    )
    agg = pairs.agg(
        F.sum(F.when(F.col("is_truth"), 1).otherwise(0)).alias("n_truth"),
        *[
            c
            for nb, r in _SWEEP_SPLITS
            for c in (
                F.sum(F.when(F.col(f"c_{nb}_{r}"), 1).otherwise(0)).alias(
                    f"cand_{nb}_{r}"
                ),
                F.sum(
                    F.when(F.col(f"c_{nb}_{r}") & F.col("is_truth"), 1).otherwise(0)
                ).alias(f"hit_{nb}_{r}"),
            )
        ],
    )
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(nb).alias("n_bands"),
                    F.lit(r).alias("rows_per_band"),
                    F.col(f"cand_{nb}_{r}").alias("n_candidates"),
                    F.col("n_truth").alias("n_truth"),
                    F.col(f"hit_{nb}_{r}").alias("n_hits"),
                )
                for nb, r in _SWEEP_SPLITS
            ]
        )
    ).alias("s")
    return agg.select(rows).select(
        F.col("s.n_bands").alias("n_bands"),
        F.col("s.rows_per_band").alias("rows_per_band"),
        F.col("s.n_candidates").alias("n_candidates"),
        F.col("s.n_truth").alias("n_truth"),
        F.col("s.n_hits").alias("n_hits"),
        F.when(
            F.col("s.n_candidates") == 0, F.lit(None).cast("double")
        )
        .otherwise(
            F.round(
                F.col("s.n_hits") / F.col("s.n_candidates").cast("double"), 6
            )
        )
        .alias("precision_at_t"),
        F.when(F.col("s.n_truth") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(F.col("s.n_hits") / F.col("s.n_truth").cast("double"), 6)
        )
        .alias("recall_at_t"),
    )
