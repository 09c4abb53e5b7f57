"""File-replay streaming: run the driver-generated parquet tables through
real Structured Streaming micro-batches.

The reference can only consume Kafka (/root/reference/src/context.ts:96-109);
here any parquet table replays as a stream, which is how the streaming
queries (SURVEY.md §2B Q29-Q32) are oracle-checked: the streaming result
must equal the batch/DuckDB answer over the same rows.

Trigger.AvailableNow processes the full backlog in rate-limited micro-
batches and terminates — deterministic end state, real micro-batch
execution path (state store, watermarks, incremental planning).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession

from ..session import configure_runtime
from ..tables import fix_event_time


def stream_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """A streaming DataFrame replaying ``{sf_dir}/{name}.parquet``.

    File sources need an explicit schema; we take it from a batch read of
    the same path (footer-only, no data scan).
    """
    configure_runtime(spark)
    path = f"{sf_dir}/{name}.parquet"
    schema = spark.read.parquet(path).schema
    # The file stream source wants a directory; select the single table file
    # out of sf_dir with a glob filter.
    reader = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", f"{name}.parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return fix_event_time(reader.parquet(sf_dir))


def run_to_memory(
    sdf: DataFrame, name: str, output_mode: str = "append",
    timeout_s: int = 600,
) -> DataFrame:
    """Execute a streaming DataFrame to completion (AvailableNow) into a
    memory sink; returns the sink table as a batch DataFrame.

    Memory sink is a test/driver harness device — production sinks are the
    kafka/parquet writers in sources/. Complete mode is used for open-ended
    aggregations (the stream ends, so append-mode watermark semantics would
    hold back the final windows). ``timeout_s`` bounds the wait: a wedged
    micro-batch otherwise hangs the caller (and any correctness harness
    above it) forever — on expiry the query is stopped and the failure is
    a clear TimeoutError, not a silent stall."""
    spark = sdf.sparkSession
    qname = f"{name}_{uuid.uuid4().hex[:8]}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(qname)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"streaming query {qname!r} did not finish within {timeout_s}s"
        )
    return spark.table(qname)


def run_foreach_batch(
    sdf: DataFrame, fn, name: str, timeout_s: int = 600,
) -> None:
    """Execute a streaming DataFrame to completion (AvailableNow)
    through a ``foreachBatch`` sink — the production shape for sinks
    the streaming writer cannot express natively (partitioned lakehouse
    writes, MERGE upserts, multi-table fan-out). Same timeout contract
    as :func:`run_to_memory`."""
    qname = f"{name}_{uuid.uuid4().hex[:8]}"
    q = (
        sdf.writeStream.foreachBatch(fn)
        .queryName(qname)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"streaming query {qname!r} did not finish within {timeout_s}s"
        )
