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
so round N's plan doesn't replan rounds 1..N-1. For planet-scale graphs
swap the propagation body for the large-star/small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond") — the
round structure and this operator's contract stay identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_hive_batch_sink_spark.io import load
from flume_hive_batch_sink_spark.llm.dedup import llm_near_dedup_minhash
from flume_hive_batch_sink_spark.registry import query

_MAX_ROUNDS = 25

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
    edges = pairs.unionByName(
        pairs.select(
            F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
        )
    ).selectExpr("doc_a AS src", "doc_b AS dst")
    # materialize the edge list once — every round reuses it
    edges = edges.localCheckpoint()

    labels = docs.select(
        F.col("doc_id"), F.col("doc_id").alias("label")
    ).localCheckpoint()

    # Labels are monotonically non-increasing, so Σlabel strictly
    # decreases until the fixpoint: one scalar aggregate per round is a
    # complete convergence test (no label-vs-label join needed).
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for _ in range(_MAX_ROUNDS):
        propagated = (
            edges.join(labels, edges.src == labels.doc_id)
            .select(F.col("dst").alias("doc_id"), "label")
        )
        labels = (
            labels.unionByName(propagated)
            .groupBy("doc_id")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(
            f"label propagation did not converge in {_MAX_ROUNDS} rounds"
        )

    return labels.select("doc_id", F.col("label").alias("cluster_rep"))
