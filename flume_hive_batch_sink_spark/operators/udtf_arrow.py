"""2.H addendum — the real Spark 4 ``@udtf`` surface (r10 verdict #3).

``udtf_explode_like`` (operators/udfs.py) demonstrates the table-
function SEMANTICS with the codegen'd builtin ``explode(split(...))``
— the production form. SURVEY §2.H additionally names the ``@udtf``
decorator as the custom-table-function path, and until this module the
API itself was never exercised. ``udtf_python_arrow`` runs a genuine
Python UDTF class through a SQL ``LATERAL`` join with
``useArrow=True``, so the plan carries an ``ArrowEvalPythonUDTF`` node
(Arrow-batched rows both ways — the 10-100× win over pickled
row-at-a-time transfer, same as pandas UDFs vs plain ``@udf``).

REGISTRY POSITION: this module is imported at the registry TAIL (after
llm.mixing) and listed in ``registry._TAIL_MODULES`` — the driver
sampling rotation depends on append-only key order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf

from flume_hive_batch_sink_spark.io import load
from flume_hive_batch_sink_spark.registry import query


@udtf(returnType="doc_id bigint, pos int, token string, tok_len int", useArrow=True)
class _TokenizeUDTF:
    """One document row → one row per token with its 1-based position
    and length. ``eval`` yields per input row; Arrow batches the
    exchange in both directions."""

    def eval(self, doc_id, text):  # no type hints: returnType is the contract
        if text is None:
            return
        for i, tok in enumerate(text.split(" "), start=1):
            yield (doc_id, i, tok, len(tok))


@query(
    "udtf_python_arrow",
    oracle="""
    SELECT doc_id, pos, token, CAST(length(token) AS INTEGER) AS tok_len
    FROM (
      SELECT doc_id,
             CAST(unnest(generate_series(1, len(string_split(text, ' '))))
                  AS INTEGER) AS pos,
             unnest(string_split(text, ' ')) AS token
      FROM documents
    )
    """,
)
def udtf_python_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python UDTF over a LATERAL join: per-document
    (pos, token, tok_len) rows from a real ``@udtf`` class — the Spark 4
    custom-table-function API named by SURVEY §2.H, not the builtin
    explode twin (that form lives in udtf_explode_like and remains the
    production path: a Python UDTF is a per-row Python round trip even
    Arrow-batched, so it belongs only where the row expansion genuinely
    cannot be expressed as builtin generators).

    Scale shape: the UDTF is embarrassingly parallel — no shuffle, no
    state, output partitioning inherits the scan — so the plan is
    scan → ArrowEvalPythonUDTF and nothing else; the only scale cost is
    the Python worker lane itself. The plan gate in tests/test_plans.py
    pins the ArrowEvalPythonUDTF node (Arrow, not pickle) and the
    absence of any Exchange."""
    d = load(spark, sf_dir, "documents")
    spark.udtf.register("tokenize_udtf", _TokenizeUDTF)
    d.select("doc_id", "text").createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT t.doc_id, t.pos, t.token, t.tok_len "
        "FROM _udtf_docs, LATERAL tokenize_udtf(doc_id, text) t"
    )
