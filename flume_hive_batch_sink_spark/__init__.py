"""flume_hive_batch_sink_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of ``sogou/flume-hive-batch-sink`` (a Flume NG
sink that batch-loads streaming events into time-partitioned Hive tables;
see SURVEY.md §0.1 — /root/reference was empty, so reference behavior is
reconstructed from the public Flume 1.x sink API) as an idiomatic Spark
engine:

- ingest dataflow (parse → project → time-bucket → serialize → batch →
  roll → commit → register) in ``operators.ingest`` and ``streaming.sink``
- the full DataFrame/SQL query surface over loaded tables in ``operators``
  and ``functions``
- LLM-data-pipeline extensions (dedup, similarity, text analysis,
  multimodal) in ``llm``

Every public operator registers itself in ``registry`` with a DuckDB oracle
SQL string so the driver's differential test can hash-match it.
"""

__version__ = "0.1.0"
