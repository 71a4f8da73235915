"""Transport seam (streaming/source.py): the stream_* keys consume one
canonical unbounded events contract; file replay and format("kafka")
are config choices behind it. No broker ships in-sandbox, so the Kafka
coverage is (a) the decode path run batch-side on exact Kafka wire
rows and (b) the connector probe; the file transports are exercised by
every streaming key and by the routing test here."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flume_hive_batch_sink_spark.io import load
from flume_hive_batch_sink_spark.streaming import harness, source

SF = "/root/testdata/sf0.001"


def _as_kafka_wire(ev):
    """Encode fixture events exactly as they'd arrive from the Kafka
    relation: JSON payload in a binary value column, wire metadata
    alongside."""
    payload = F.to_json(
        F.struct("event_id", "ts", "user_id", "event_type", "value", "props"),
        {"timestampFormat": source.KAFKA_TS_FORMAT},
    )
    return ev.select(
        F.col("event_id").cast("string").cast("binary").alias("key"),
        payload.cast("binary").alias("value"),
        F.lit("events").alias("topic"),
        F.pmod("event_id", F.lit(8)).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
        F.col("ts").alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )


def test_kafka_decode_roundtrips_exactly(spark):
    ev = load(spark, SF, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    decoded = source.decode_kafka_events(_as_kafka_wire(ev))
    assert decoded.schema == ev.schema
    orig = sorted(map(tuple, ev.collect()))
    back = sorted(map(tuple, decoded.collect()))
    assert back == orig


def test_kafka_decode_drops_poison_records(spark):
    ev = load(spark, SF, "events").limit(10)
    wire = _as_kafka_wire(ev)
    poison = spark.createDataFrame(
        [(None, bytearray(b"{not json"), "events", 0, 10**9, None, 0)],
        source.KAFKA_WIRE_SCHEMA,
    )
    decoded = source.decode_kafka_events(wire.unionByName(poison))
    # at-least-once transports must not kill the query on one bad
    # payload: the poison row decodes to NULL event_id and is dropped
    assert decoded.count() == 10


def test_kafka_transport_wiring_reaches_connector(spark):
    """The kafka transport builds real format("kafka") wiring. Without
    the connector jar (this sandbox) the plan fails with the
    data-source-missing error — proving the seam dispatches to the real
    source, not a stub; with the jar deployed the same config works
    unchanged."""
    cfg = source.SourceConfig(
        transport="kafka", bootstrap_servers="broker:9092", topic="events"
    )
    if source.kafka_available(spark):
        df = source.open_events_stream(spark, cfg)
        assert df.isStreaming
        assert [f.name for f in df.schema.fields] == [
            "event_id", "ts", "user_id", "event_type", "value", "props",
        ]
    else:
        with pytest.raises(Exception, match="(?i)kafka"):
            source.open_events_stream(spark, cfg)


def test_rate_transport_matches_canonical_schema(spark):
    df = source.open_events_stream(
        spark, source.SourceConfig(transport="rate", rows_per_second=10)
    )
    assert df.isStreaming
    assert [f.name for f in df.schema.fields] == [
        "event_id", "ts", "user_id", "event_type", "value", "props",
    ]


def test_unknown_transport_rejected(spark):
    with pytest.raises(ValueError, match="unknown transport"):
        source.open_events_stream(
            spark, source.SourceConfig(transport="carrier-pigeon")
        )


def test_stream_keys_route_through_seam(spark, monkeypatch):
    """harness.events_stream / replay_chunks — what every stream_* key
    calls — must dispatch through open_events_stream, so a transport
    swap reaches all keys with zero key changes."""
    calls = []
    real = source.open_events_stream

    def spy(sp, cfg):
        calls.append(cfg.transport)
        return real(sp, cfg)

    monkeypatch.setattr(source, "open_events_stream", spy)
    s = harness.events_stream(spark, SF)
    assert s.isStreaming
    c = harness.replay_chunks(spark, SF, n_chunks=2)
    assert c.isStreaming
    assert calls == ["file", "file-chunks"]


def test_avro_probe_gates_roundtrip(spark):
    """Avro support is connector-gated: where spark-avro is present the
    roundtrip must work; where absent (this sandbox — PySpark ships only
    Avro core jars) it must raise the deployment instruction instead of
    an opaque failure, and the registry must not carry the key."""
    from flume_hive_batch_sink_spark.registry import QUERIES
    from flume_hive_batch_sink_spark.sources import formats

    if formats.avro_available(spark):
        out = formats.scan_avro_roundtrip(spark, SF)
        assert out.count() == load(spark, SF, "events").count()
        assert "scan_avro_roundtrip" in QUERIES
    else:
        with pytest.raises(NotImplementedError, match="spark-avro"):
            formats.scan_avro_roundtrip(spark, SF)
        assert "scan_avro_roundtrip" not in QUERIES
