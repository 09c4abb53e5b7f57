"""Kafka source/sink with reference-option parity.

Reference `StreamContextOption` (/root/reference/src/context.ts:54-62):
  brokers, inputTopic, groupId, fromBeginning?, clientId?, commitInterval?
map to Kafka source options as follows:

  brokers        -> kafka.bootstrap.servers
  inputTopic     -> subscribe
  groupId        -> groupIdPrefix (Structured Streaming manages its own
                    group ids; offsets live in the checkpoint WAL, not the
                    broker — see `commit` parity note in stream.py)
  fromBeginning  -> startingOffsets earliest|latest
                    (reference: src/context.ts:58,92,100-103)
  seek-to-timestamp (reference window `from` seek,
                    src/context.ts:195-207) -> startingOffsetsByTimestamp
  commitInterval -> obsolete: checkpointing replaces interval commits
                    (reference: src/context.ts:111-113)

Payloads: the reference JSON-parses the message value
(src/context.ts:143) and JSON+GZIPs on produce (src/context.ts:122-123).
Here: value -> from_json(cast(string), schema) with a declared per-topic
schema (the raw string is kept when schema=None — the dynamic-JSON escape
hatch), and the sink writes to_json(struct(*)) with
kafka.compression.type=gzip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_reader_options(
    brokers: str | list[str],
    topic: str,
    group_id: str | None = None,
    from_beginning: bool = False,
    starting_timestamp_ms: int | None = None,
    max_offsets_per_trigger: int | None = None,
) -> dict[str, str]:
    """Pure option mapping (unit-testable without a broker)."""
    opts = {
        "kafka.bootstrap.servers": (
            brokers if isinstance(brokers, str) else ",".join(brokers)
        ),
        "subscribe": topic,
    }
    if starting_timestamp_ms is not None:
        # reference seek-to-timestamp (src/context.ts:195-207): the
        # reference seeks EVERY partition to the timestamp. Spark's global
        # `startingTimestamp` option does exactly that; per-partition
        # `startingOffsetsByTimestamp` has no all-partitions wildcard
        # ("-1" is rejected by the connector against a live broker).
        opts["startingTimestamp"] = str(starting_timestamp_ms)
        opts["startingOffsetsByTimestampStrategy"] = "latest"
    else:
        opts["startingOffsets"] = "earliest" if from_beginning else "latest"
    if group_id:
        opts["groupIdPrefix"] = group_id
    if max_offsets_per_trigger is not None:
        # backpressure: the reference bounds its channel at 1000 messages
        # (src/context.ts:75); rate-limiting per micro-batch is the
        # Spark-native equivalent.
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def kafka_writer_options(brokers: str | list[str], topic: str) -> dict[str, str]:
    return {
        "kafka.bootstrap.servers": (
            brokers if isinstance(brokers, str) else ",".join(brokers)
        ),
        "topic": topic,
        # reference gzips every payload (src/context.ts:122-123)
        "kafka.compression.type": "gzip",
    }


def decode_value(df: DataFrame, schema=None, ts_from_payload: str | None = None) -> DataFrame:
    """Kafka envelope -> typed columns.

    Keeps the source metadata the reference exposes as MessageMetadata
    (topic/partition/offset/timestamp/key, src/context.ts:15-26) alongside
    the decoded payload. schema=None keeps the raw JSON string (dynamic
    payloads, use get_json_object downstream)."""
    base = df.select(
        F.col("key").cast("string").alias("key"),
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
        F.col("timestamp").alias("ts"),
        F.col("value").cast("string").alias("raw_value"),
    )
    if schema is None:
        if ts_from_payload:
            raise ValueError(
                "ts_from_payload requires a payload schema — without one "
                "the payload is an undecoded JSON string"
            )
        return base
    decoded = base.withColumn("value", F.from_json("raw_value", schema))
    payload_fields = list(decoded.schema["value"].dataType.fieldNames())
    if ts_from_payload and ts_from_payload not in payload_fields:
        raise ValueError(
            f"ts_from_payload={ts_from_payload!r} is not a payload field "
            f"(payload has: {payload_fields})"
        )
    # A payload field named like an envelope column would make `value.*`
    # emit a duplicate name and every downstream reference ambiguous.
    # Reject loudly here — EXCEPT a payload `ts` that the caller asked to
    # promote via ts_from_payload="ts": there the envelope ts is dropped
    # before expansion and the payload field takes its place cleanly.
    env = ["key", "topic", "partition", "offset", "ts"]
    clash = [c for c in payload_fields if c in (*env, "raw_value")]
    if "ts" in clash and ts_from_payload == "ts":
        clash.remove("ts")
    if clash:
        raise ValueError(
            f"payload schema fields collide with Kafka envelope columns: "
            f"{clash}; rename them (envelope: key/topic/partition/offset/ts)"
        )
    if ts_from_payload == "ts":
        # Promote the payload ts INTO the envelope slot so the column
        # order is identical whether ts comes from the broker or the
        # payload — positional consumers of the envelope never shift.
        rest = [f for f in payload_fields if f != "ts"]
        return decoded.select(
            "key", "topic", "partition", "offset",
            F.col("value.ts").alias("ts"),
            *[F.col(f"value.{f}").alias(f) for f in rest],
        )
    out = decoded.select(*env, "value.*")
    if ts_from_payload:
        # withColumn on an existing name replaces in place — envelope
        # position preserved here too.
        out = out.withColumn("ts", F.col(ts_from_payload))
    return out


def read_stream(
    spark: SparkSession,
    brokers: str | list[str],
    topic: str,
    schema=None,
    from_beginning: bool = False,
    starting_timestamp_ms: int | None = None,
    ts_from_payload: str | None = None,
    **extra: str,
) -> DataFrame:
    """Build the Kafka streaming source. Raises a clear error if the
    spark-sql-kafka connector is not on the classpath.

    ``ts_from_payload``: name of a payload field to use as the event
    time ``ts`` instead of the broker ingest timestamp — required for
    correct event-time windows over replayed/late data (the broker
    timestamp is arrival time, not event time)."""
    opts = kafka_reader_options(
        brokers,
        topic,
        from_beginning=from_beginning,
        starting_timestamp_ms=starting_timestamp_ms,
    )
    opts.update(extra)
    reader = spark.readStream.format("kafka")
    for k, v in opts.items():
        reader = reader.option(k, v)
    try:
        raw = reader.load()
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        # Only rewrite the genuinely-missing-connector failure; any other
        # load() error (bad option value, malformed timestamp, ...) must
        # surface as itself or operators debug the wrong thing.
        if "Failed to find data source" in msg or "ClassNotFound" in msg:
            raise RuntimeError(
                "Kafka source unavailable — add the spark-sql-kafka "
                "connector (--packages "
                "org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>)"
            ) from e
        raise
    return decode_value(raw, schema, ts_from_payload=ts_from_payload)


def prepare_sink(df: DataFrame, topic: str) -> DataFrame:
    """Encode rows for the Kafka sink: JSON-serialize the whole row into
    `value` (reference send, src/context.ts:119-129; no key, like the
    reference). The target topic rides as a per-row `topic` column — the
    Kafka sink routes on it, so the destination can never be silently
    dropped by an option-plumbing gap."""
    return df.select(
        F.to_json(F.struct(*df.columns)).alias("value"),
        F.lit(topic).alias("topic"),
    )
