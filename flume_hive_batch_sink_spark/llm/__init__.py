"""LLM-data-pipeline operators (2.I)."""

from flume_hive_batch_sink_spark.llm import (  # noqa: F401
    clusters,
    curation,
    dedup,
    multimodal,
    sampling,
    similarity,
    text,
)
