"""Kafka source/sink option mapping — reference StreamContextOption parity
(/root/reference/src/context.ts:54-62) as pure functions, testable without
a broker. The sink row encoding is exercised on a real DataFrame."""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from kstreamjs_spark.sources.kafka import (
    kafka_reader_options,
    kafka_writer_options,
    prepare_sink,
)


def test_reader_options_from_beginning():
    opts = kafka_reader_options(["b1:9092", "b2:9092"], "t", from_beginning=True)
    assert opts["kafka.bootstrap.servers"] == "b1:9092,b2:9092"
    assert opts["subscribe"] == "t"
    assert opts["startingOffsets"] == "earliest"


def test_reader_options_latest_default():
    assert kafka_reader_options("b:9092", "t")["startingOffsets"] == "latest"


def test_reader_options_timestamp_seek():
    """The reference window operator seeks every partition to a timestamp
    (src/context.ts:195-207). Spark's global `startingTimestamp` covers
    all partitions; `startingOffsetsByTimestamp` has no all-partitions
    wildcard ('-1' is rejected against a live broker), so it must not be
    used here."""
    opts = kafka_reader_options("b:9092", "t", starting_timestamp_ms=12345)
    assert "startingOffsets" not in opts
    assert "startingOffsetsByTimestamp" not in opts
    assert opts["startingTimestamp"] == "12345"
    assert opts["startingOffsetsByTimestampStrategy"] == "latest"


def test_reader_options_group_and_backpressure():
    opts = kafka_reader_options(
        "b:9092", "t", group_id="g1", max_offsets_per_trigger=1000
    )
    assert opts["groupIdPrefix"] == "g1"
    assert opts["maxOffsetsPerTrigger"] == "1000"


def test_writer_options_gzip():
    """The reference gzips every produced payload (src/context.ts:122-123)."""
    opts = kafka_writer_options("b:9092", "out")
    assert opts["topic"] == "out"
    assert opts["kafka.compression.type"] == "gzip"


def test_prepare_sink_serializes_whole_row(spark):
    """The sink payload is the JSON row plus a per-row `topic` column —
    the Kafka sink routes on that column, so the destination survives any
    option-plumbing path (reference writeTo topic, src/stream.ts:240-247)."""
    df = spark.createDataFrame([(1, "x")], "a long, b string")
    out = prepare_sink(df, "out-topic").collect()
    assert out[0].asDict().keys() == {"value", "topic"}
    assert out[0]["topic"] == "out-topic"
    assert json.loads(out[0]["value"]) == {"a": 1, "b": "x"}


def _envelope_df(spark, payload: str):
    """A batch frame shaped like the Kafka source relation."""
    return spark.createDataFrame(
        [("k1", "t", 0, 7, None, payload)],
        "key string, topic string, partition int, offset long, "
        "timestamp timestamp, value string",
    )


def test_decode_value_promotes_payload_ts_named_ts(spark):
    """A payload field named exactly `ts`, promoted via ts_from_payload,
    replaces the broker timestamp cleanly — no duplicate `ts` column."""
    from kstreamjs_spark.sources.kafka import decode_value

    df = _envelope_df(spark, '{"ts": "2024-01-02 03:04:05", "v": 9}')
    out = decode_value(df, "ts timestamp, v long", ts_from_payload="ts")
    assert out.columns.count("ts") == 1
    row = out.collect()[0]
    assert row["v"] == 9 and str(row["ts"]).startswith("2024-01-02")


def test_decode_value_rejects_envelope_collision(spark):
    """A payload field shadowing an envelope column would make value.*
    emit a duplicate name and every downstream reference ambiguous —
    rejected at decode time with the offending names."""
    import pytest

    from kstreamjs_spark.sources.kafka import decode_value

    df = _envelope_df(spark, '{"topic": "boom", "v": 1}')
    with pytest.raises(ValueError, match="collide.*topic"):
        decode_value(df, "topic string, v long")
    # a payload `ts` WITHOUT the promotion flag is also a collision
    with pytest.raises(ValueError, match="collide.*ts"):
        decode_value(df, "ts timestamp, v long")


def test_decode_value_ts_field_must_exist(spark):
    import pytest

    from kstreamjs_spark.sources.kafka import decode_value

    df = _envelope_df(spark, '{"v": 1}')
    with pytest.raises(ValueError, match="not a payload field"):
        decode_value(df, "v long", ts_from_payload="event_time")


def test_decode_value_other_named_ts_field(spark):
    from kstreamjs_spark.sources.kafka import decode_value

    df = _envelope_df(spark, '{"event_time": "2024-06-01 00:00:00", "v": 2}')
    out = decode_value(df, "event_time timestamp, v long",
                       ts_from_payload="event_time")
    row = out.collect()[0]
    assert str(row["ts"]) == str(row["event_time"])


def test_decode_value_envelope_order_stable(spark):
    """The envelope column ORDER (key, topic, partition, offset, ts, then
    payload fields) is identical whether ts comes from the broker, from a
    payload field named `ts`, or from a differently-named payload field —
    positional consumers never see shifted columns."""
    from kstreamjs_spark.sources.kafka import decode_value

    env = ["key", "topic", "partition", "offset", "ts"]
    plain = decode_value(
        _envelope_df(spark, '{"a": 1, "v": 2}'), "a long, v long")
    promoted = decode_value(
        _envelope_df(spark, '{"a": 1, "ts": "2024-01-02 03:04:05", "v": 2}'),
        "a long, ts timestamp, v long", ts_from_payload="ts")
    renamed = decode_value(
        _envelope_df(spark, '{"a": 1, "event_time": "2024-01-02 03:04:05", "v": 2}'),
        "a long, event_time timestamp, v long", ts_from_payload="event_time")
    assert plain.columns[:5] == env
    assert promoted.columns[:5] == env
    assert renamed.columns[:5] == env
    # payload fields follow, in schema order, minus the promoted one
    assert promoted.columns[5:] == ["a", "v"]
    assert str(promoted.collect()[0]["ts"]).startswith("2024-01-02")
