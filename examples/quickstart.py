"""Quickstart: the reference workflow, re-expressed on this engine.

The reference builds a Kafka pipeline by chaining createStream -> map ->
filter -> window -> writeTo -> start (reference src/stream.ts:18-271).
Here the same program runs over any source (parquet replay below; Kafka
with Stream.from_kafka on a cluster with the connector), the operators
lower to Catalyst-optimized DataFrame plans, and everything past this
surface (joins, SQL, dedup, similarity, corpus curation — see
`python -m kstreamjs_spark list`) composes with it.

Run:  python examples/quickstart.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import pyspark.sql.functions as F  # noqa: E402

from kstreamjs_spark.session import get_spark  # noqa: E402
from kstreamjs_spark.stream import Stream  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> int:
    spark = get_spark("quickstart", cpus=4, shuffle_partitions=4)

    # Batch flavor (same fluent chain works on a streaming replay via
    # Stream.replay — identical results, oracle-checked in tests).
    out = (
        Stream.from_parquet(spark, f"{sf_dir}/events.parquet")
        .map("user_id", "event_type", "value", "ts")          # projection
        .filter(F.col("event_type") == "purchase")            # predicate
        .window(3_600_000, aggs={                             # tumbling agg
            "revenue": F.round(F.sum("value"), 4),
            "n": F.count(F.lit(1)),
        })
    )
    out.df.orderBy("window_start").show(5, truncate=False)

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(*sys.argv[1:]))
