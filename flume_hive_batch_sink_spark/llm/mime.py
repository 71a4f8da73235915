"""Round-12 extension key: MIME sniffing over opaque binary payloads.

A crawl's media payloads arrive as bytes with unreliable (or absent)
declared content types; the first step of every multimodal ingestion
pipeline is magic-byte sniffing — classify each blob by its leading
signature before routing it to a decoder (llm/multimodal.py). This key
exercises the BINARY-column plumbing end-to-end: construct a real
binary payload per document (deterministic magic prefix + md5 filler,
so the oracle can rebuild the identical bytes hex-side), then classify
with binary substring/compare expressions.

Registered registry-LAST (registry._TAIL_MODULES): new rounds append so
the driver-sampling rotation prefix of earlier rounds stays stable.

100 TB posture: pure per-row codegen — no shuffle, no Python; the
sniff reads at most the first 4 bytes of each payload, so with real
files behind a binaryFile/blob source the classifier prunes to a
prefix read, never a full decode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_hive_batch_sink_spark.io import load
from flume_hive_batch_sink_spark.registry import query

# (magic-bytes hex, mime) — JPEG/JFIF, PNG, BMP, RIFF containers, EBML
# (webm/mkv). The fixture's synthetic payload cycles through all five
# by doc_id so every branch is populated.
_MAGICS = (
    ("FFD8FFE0", "image/jpeg"),
    ("89504E47", "image/png"),
    ("424D", "image/bmp"),
    ("52494646", "application/x-riff"),
    ("1A45DFA3", "video/webm"),
)

_MIME_ORACLE = """
    WITH p AS (
      SELECT doc_id,
             CASE CAST(doc_id % 5 AS INT)
               WHEN 0 THEN 'FFD8FFE0' WHEN 1 THEN '89504E47'
               WHEN 2 THEN '424D' WHEN 3 THEN '52494646'
               ELSE '1A45DFA3' END || upper(md5(text)) AS hx
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN hx LIKE 'FFD8FF%' THEN 'image/jpeg'
                WHEN hx LIKE '89504E47%' THEN 'image/png'
                WHEN hx LIKE '424D%' THEN 'image/bmp'
                WHEN hx LIKE '52494646%' THEN 'application/x-riff'
                WHEN hx LIKE '1A45DFA3%' THEN 'video/webm'
                ELSE 'application/octet-stream' END AS mime_type,
           CAST(length(hx) / 2 AS BIGINT) AS n_bytes
    FROM p
"""


@query("multimodal_mime_sniff", oracle=_MIME_ORACLE)
def multimodal_mime_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Magic-byte MIME classification of a binary payload column.

    The payload is constructed as REAL BINARY (unhex magic ‖ unhex
    md5(text) — 20 or 18 bytes) and the classifier compares binary
    prefixes via substring-on-binary against unhex'd signature
    literals: the exact expressions a production pipeline runs on a
    blob column read from a binaryFile/object-store source. The oracle
    rebuilds the identical payload hex-side and applies the same
    signature table, so classification (not construction) is what both
    engines attest. JPEG matches on 3 signature bytes (FF D8 FF — the
    fourth varies by JFIF/EXIF flavor); the rest on their full 2–4-byte
    magics."""
    docs = load(spark, sf_dir, "documents")
    magic_hex = F.element_at(
        F.array(*[F.lit(h) for h, _ in _MAGICS]),
        (F.col("doc_id") % 5 + 1).cast("int"),
    )
    payload = F.concat(F.unhex(magic_hex), F.unhex(F.upper(F.md5("text"))))
    mime = (
        F.when(
            F.substring(payload, 1, 3) == F.unhex(F.lit("FFD8FF")),
            F.lit("image/jpeg"),
        )
        .when(
            F.substring(payload, 1, 4) == F.unhex(F.lit("89504E47")),
            F.lit("image/png"),
        )
        .when(
            F.substring(payload, 1, 2) == F.unhex(F.lit("424D")),
            F.lit("image/bmp"),
        )
        .when(
            F.substring(payload, 1, 4) == F.unhex(F.lit("52494646")),
            F.lit("application/x-riff"),
        )
        .when(
            F.substring(payload, 1, 4) == F.unhex(F.lit("1A45DFA3")),
            F.lit("video/webm"),
        )
        .otherwise(F.lit("application/octet-stream"))
    )
    return docs.select(
        "doc_id",
        mime.alias("mime_type"),
        F.length(payload).cast("long").alias("n_bytes"),
    )
