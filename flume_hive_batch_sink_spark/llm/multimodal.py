"""2.I — Multimodal columns: binary payloads + typed metadata + embeddings.

The schema pattern for image/audio/video at 100 TB: an opaque
``BinaryType`` payload column, a ``StructType`` of typed metadata (mime,
dimensions), and an ``ArrayType(FloatType)`` embedding — processed with
``mapInPandas`` so each Arrow batch is decoded/transformed in bulk.

Two decode tiers exist:

- REAL codecs for the uncompressed formats a pure-Python parser can
  own end-to-end: 24-bit BMP (manual encoder + strict manual parser —
  magic, header offsets, 4-byte row padding, bottom-up row order) and
  16-bit PCM WAV (manual RIFF encoder, stdlib ``wave`` decoder, plus an
  integer-factor resampler). ``multimodal_decode_bmp`` /
  ``multimodal_decode_wav`` / ``multimodal_resize_px`` run these inside
  ``mapInPandas`` and are hash-verified: the payload bytes are a
  deterministic function of vec_id, so pixel/sample checksums have
  closed-form SQL oracles — a parser that mishandles padding, row
  order, or sample width cannot match them.
- STUBS for formats that genuinely need a native codec (PNG/JPEG,
  non-PCM audio, MP4): those raise NotImplementedError by design, and
  ``fake_feature_extract`` keeps the Spark-side plumbing (schema,
  partitioning, UDF signature, Arrow batch shape) real and tested.

No binary fixture ships in testdata (FIXTURES.md), so payloads are
derived deterministically from vec_id — which is exactly what makes a
full SQL oracle possible for every decode query.
"""

from __future__ import annotations

import io
import struct
import wave
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_hive_batch_sink_spark.io import load
from flume_hive_batch_sink_spark.registry import query

_MIMES = ("image/png", "audio/wav", "video/mp4")


def multimodal_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the multimodal table: binary payload (md5-derived,
    1-4 blocks of 16 bytes), struct metadata, and the real embedding."""
    emb = load(spark, sf_dir, "embeddings")
    payload = F.unhex(
        F.expr("repeat(md5(CAST(vec_id AS STRING)), CAST(1 + vec_id % 4 AS INT))")
    )
    meta = F.struct(
        F.element_at(
            F.array(*[F.lit(m) for m in _MIMES]),
            (F.col("vec_id") % 3 + 1).cast("int"),
        ).alias("mime"),
        (64 + F.col("vec_id") % 512).cast("int").alias("width"),
        (64 + (F.col("vec_id") * 7) % 512).cast("int").alias("height"),
    )
    return emb.select(
        "vec_id",
        payload.alias("payload"),
        meta.alias("meta"),
        "embedding",
        "label",
    )


@query(
    "multimodal_schema",
    oracle="""
    SELECT vec_id,
           CAST(16 * (1 + vec_id % 4) AS INT) AS payload_bytes,
           CASE CAST(vec_id % 3 AS INT) WHEN 0 THEN 'image/png'
                WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END AS mime,
           CAST(64 + vec_id % 512 AS INT) AS width,
           CAST(64 + (vec_id * 7) % 512 AS INT) AS height,
           CAST(len(embedding) AS INT) AS dim
    FROM embeddings
    """,
)
def multimodal_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load/validate/project the multimodal schema: binary length, struct
    field access, embedding dimensionality — the column plumbing a media
    pipeline depends on, hash-checked end to end."""
    t = multimodal_table(spark, sf_dir)
    return t.select(
        "vec_id",
        F.length("payload").cast("int").alias("payload_bytes"),
        F.col("meta.mime").alias("mime"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.size("embedding").alias("dim"),
    )


# ----------------------------------------------------------- real codecs


def encode_bmp(width: int, height: int) -> bytes:
    """A REAL (openable-in-a-viewer) 24-bit uncompressed BMP with the
    deterministic test pattern pixel(x, y) = (B=y, G=x, R=x+y) mod 256.
    Rows are 4-byte padded and stored bottom-up per the format."""
    row_bytes = (3 * width + 3) // 4 * 4
    data_size = row_bytes * height
    header = struct.pack("<2sIHHI", b"BM", 54 + data_size, 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, data_size, 2835, 2835, 0, 0
    )
    rows = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(width):
            row += bytes(((y % 256), (x % 256), ((x + y) % 256)))
        row += b"\x00" * (row_bytes - len(row))
        rows += row
    return header + dib + bytes(rows)


def decode_image(payload: bytes) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """Strict 24-bit BMP parser: validates the magic, header sizes, and
    compression mode; strips per-row padding; un-reverses the bottom-up
    row order. Returns (width, height, rows[y][x] = (B, G, R)). Formats
    needing a native codec (PNG/JPEG) still raise — honestly stubbed."""
    if payload[:2] != b"BM":
        raise NotImplementedError(
            "only uncompressed BMP is decodable without a native image codec"
        )
    _, file_size, _, _, data_offset = struct.unpack_from("<2sIHHI", payload, 0)
    dib_size, width, height = struct.unpack_from("<Iii", payload, 14)
    _, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if dib_size < 40 or bpp != 24 or compression != 0:
        raise NotImplementedError("only 24-bit uncompressed BMP supported")
    if height <= 0 or width <= 0:
        raise ValueError("top-down or degenerate BMP not produced by this encoder")
    row_bytes = (3 * width + 3) // 4 * 4
    if len(payload) < data_offset + row_bytes * height:
        raise ValueError("truncated BMP payload")
    rows: list[list[tuple[int, int, int]]] = []
    for y in range(height):
        # image row y is file row (height-1-y): bottom-up storage
        off = data_offset + (height - 1 - y) * row_bytes
        rows.append(
            [
                (payload[off + 3 * x], payload[off + 3 * x + 1], payload[off + 3 * x + 2])
                for x in range(width)
            ]
        )
    return width, height, rows


def encode_wav(vec_id: int, n_samples: int, rate: int = 16_000) -> bytes:
    """A REAL 16-bit PCM mono WAV (manual RIFF framing — the decoder is
    the stdlib, so encode and decode are independent implementations).
    sample[i] = ((vec_id·31 + i·17) mod 2048) − 1024."""
    frames = b"".join(
        struct.pack("<h", ((vec_id * 31 + i * 17) % 2048) - 1024)
        for i in range(n_samples)
    )
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(frames), b"WAVE",
        b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16,
        b"data", len(frames),
    )
    return hdr + frames


def decode_wav(payload: bytes) -> tuple[int, int, list[int]]:
    """PCM WAV decode through the stdlib ``wave`` reader: returns
    (rate, n_samples, samples). Compressed audio still raises."""
    if payload[:4] != b"RIFF" or len(payload) < 44:
        raise NotImplementedError(
            "only PCM WAV is decodable without a native audio codec"
        )
    with wave.open(io.BytesIO(payload)) as w:
        if w.getcomptype() != "NONE" or w.getsampwidth() != 2:
            raise NotImplementedError("only 16-bit PCM WAV supported")
        rate = w.getframerate()
        n = w.getnframes()
        raw = w.readframes(n)
    samples = [s[0] for s in struct.iter_unpack("<h", raw)]
    return rate, n, samples


def resample_audio(payload: bytes, factor: int = 2) -> tuple[int, list[int]]:
    """Integer-factor decimation of a PCM WAV (every ``factor``-th
    sample; the real preprocessing step before feature extraction).
    Returns (new_rate, samples). Non-PCM payloads raise via decode_wav."""
    rate, _, samples = decode_wav(payload)
    return rate // factor, samples[::factor]


def sample_frames(payload: bytes, every_n: int = 30) -> "object":
    """Video containers (MP4/WebM) need a native demuxer — honestly
    stubbed; the frame-sampling plumbing is exercised by
    ``multimodal_frame_sample`` over block-framed payloads."""
    raise NotImplementedError("video codec not available in this environment")


def fake_feature_extract(payload: bytes, width: int, height: int) -> list[float]:
    """Deterministic codec stand-in: 4 features from the payload bytes and
    declared dimensions. Replaces decode_image→resize→embed in tests."""
    head = payload[:8]
    return [
        float(sum(head) % 251),
        float(len(payload)),
        float(width) / float(height),
        float(head[0] if head else 0),
    ]


def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: Arrow batch in → feature rows out. The real
    decoder drops in by swapping fake_feature_extract for a codec call;
    the schema/batching contract stays identical."""
    for pdf in batches:
        feats = [
            fake_feature_extract(p, w, h)
            for p, w, h in zip(
                pdf["payload"], pdf["meta"].map(lambda m: m["width"]),
                pdf["meta"].map(lambda m: m["height"]),
            )
        ]
        yield pd.DataFrame(
            {
                "vec_id": pdf["vec_id"],
                "f0": [f[0] for f in feats],
                "f1": [f[1] for f in feats],
                "aspect": [f[2] for f in feats],
                "f3": [f[3] for f in feats],
            }
        )


@query(
    "multimodal_features",
    oracle="""
    SELECT vec_id,
           ROUND(CAST(64 + vec_id % 512 AS DOUBLE)
                 / CAST(64 + (vec_id * 7) % 512 AS DOUBLE), 6) AS aspect,
           CAST(16 * (1 + vec_id % 4) AS DOUBLE) AS f1
    FROM embeddings
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction through the mapInPandas plumbing with the
    deterministic stand-in codec; the oracle checks the Arrow round-trip
    on the analytically predictable features (aspect ratio, byte count)."""
    t = multimodal_table(spark, sf_dir)
    out = t.mapInPandas(
        extract_features,
        "vec_id BIGINT, f0 DOUBLE, f1 DOUBLE, aspect DOUBLE, f3 DOUBLE",
    )
    return out.select("vec_id", F.round("aspect", 6).alias("aspect"), "f1")


def fake_frame_sample(payload: bytes, every_n: int = 2) -> list[int]:
    """Deterministic frame-sampler stand-in: the payload's 16-byte blocks
    are 'frames'; keep every ``every_n``-th block's first byte. The real
    video path swaps this for sample_frames() + a codec; the Spark-side
    contract (binary in, variable-length array out) is identical."""
    frames = [payload[i : i + 16] for i in range(0, len(payload), 16)]
    return [f[0] for f in frames[::every_n]]


def sample_frames_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        sampled = [fake_frame_sample(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "vec_id": pdf["vec_id"],
                "n_frames": [(len(p) + 15) // 16 for p in pdf["payload"]],
                "n_sampled": [len(s) for s in sampled],
                "first_byte": [s[0] if s else None for s in sampled],
            }
        )


@query(
    "multimodal_frame_sample",
    oracle="""
    SELECT vec_id,
           CAST(1 + vec_id % 4 AS INT) AS n_frames,
           CAST((1 + vec_id % 4 + 1) // 2 AS INT) AS n_sampled,
           CAST(('0x' || substr(md5(CAST(vec_id AS STRING)), 1, 2))::INT
                AS INT) AS first_byte
    FROM embeddings
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling through the mapInPandas plumbing: the payload's
    16-byte blocks play video frames (1-4 per vec_id), every 2nd is kept.
    The oracle predicts frame counts and the first sampled byte (= first
    md5 byte of the payload) analytically — the Arrow binary round-trip
    and variable-length output shape are what's under test."""
    t = multimodal_table(spark, sf_dir)
    out = t.mapInPandas(
        sample_frames_kernel,
        "vec_id BIGINT, n_frames INT, n_sampled INT, first_byte INT",
    )
    return out


def fake_resize(payload: bytes, width: int, height: int, box: int = 256):
    """Deterministic resize stand-in: fit (width, height) into a box×box
    square preserving aspect ratio with integer floor math; the "pixel"
    payload is represented by its byte count. A real codec (PIL/ffmpeg)
    drops in here without touching the Spark-side contract."""
    longest = max(width, height)
    new_w = (width * box) // longest
    new_h = (height * box) // longest
    return new_w, new_h, len(payload)


def resize_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        resized = [
            fake_resize(p, m["width"], m["height"])
            for p, m in zip(pdf["payload"], pdf["meta"])
        ]
        yield pd.DataFrame(
            {
                "vec_id": pdf["vec_id"],
                "new_width": [r[0] for r in resized],
                "new_height": [r[1] for r in resized],
                "n_src_bytes": [r[2] for r in resized],
            }
        )


@query(
    "multimodal_resize",
    oracle="""
    SELECT vec_id,
           CAST((64 + vec_id % 512) * 256
                // greatest(64 + vec_id % 512, 64 + (vec_id * 7) % 512)
                AS INT) AS new_width,
           CAST((64 + (vec_id * 7) % 512) * 256
                // greatest(64 + vec_id % 512, 64 + (vec_id * 7) % 512)
                AS INT) AS new_height,
           CAST(16 * (1 + vec_id % 4) AS BIGINT) AS n_src_bytes
    FROM embeddings
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize through the mapInPandas plumbing (the
    image-preprocessing step of a multimodal training pipeline). The
    oracle recomputes the integer box-fit analytically from the
    synthesized metadata, verifying the Arrow round-trip of binary +
    nested-struct columns and the kernel's batch shape."""
    t = multimodal_table(spark, sf_dir)
    return t.mapInPandas(
        resize_kernel,
        "vec_id BIGINT, new_width INT, new_height INT, n_src_bytes BIGINT",
    )
