"""File dataset I/O: sharded corpus export and schema-pinned text readers.

The reference's only sink is a Kafka topic (reference src/context.ts:119-129)
and its only payload encoding is JSON (src/context.ts:122-123,143); a
training-data engine also needs file datasets as first-class sources and
sinks. Two concerns dominate at 100 TB:

1. **Layout for pruning.** `partitionBy(col)` writes a Hive directory tree
   (`lang=en/…`) so downstream readers prune at the *file listing* level —
   a per-language consumer of a 100 TB corpus lists and reads only its
   slice. Partition columns must be low-cardinality (lang, source, date);
   high-cardinality partitioning creates the small-file problem instead of
   solving it.

2. **File sizing.** One output file per task × partition value: too few
   shards → multi-GB files no reader can split (JSONL/CSV are unsplittable
   when compressed); too many → millions of tiny files that throttle the
   namenode/object store on listing. `write_sharded` pins files-per-
   partition-value explicitly by repartitioning on (partition cols,
   hash-shard), and `maxRecordsPerFile` caps the tail. Shard count is the
   knob a 1000-executor export tunes to land in the 128 MB–1 GB sweet spot.

Readers take an explicit schema: at scale, inference is a full extra pass
over the data (and non-deterministic across samples) — never infer.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_sharded(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    shards: int = 8,
    fmt: str = "parquet",
    key: str | None = None,
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
    compression: str | None = None,
    **options: str,
) -> None:
    """Write ``df`` as at most ``shards`` files per partition-directory.

    The shard assignment hashes ``key`` (or the whole row when None) so the
    repartition spreads rows evenly; co-locating by (partition cols, shard)
    means each task writes into one directory — no per-task fan-out into
    every partition value, which is what makes naive
    `repartition(n).write.partitionBy(c)` emit n×|values| files. "At most":
    distinct (partition values × shard) combos hash into shuffle
    partitions, and colliding combos share an output task, merging their
    files — the bound that matters (no small-file explosion) still holds.
    """
    pcols = list(partition_by or [])
    shard = F.pmod(F.hash(key) if key else F.hash(*df.columns), F.lit(shards))
    out = df.repartition(*([F.col(c) for c in pcols] + [shard]))
    writer = out.write.mode(mode).format(fmt)
    if pcols:
        writer = writer.partitionBy(*pcols)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if compression:
        writer = writer.option("compression", compression)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)


def write_jsonl(df: DataFrame, path: str, shards: int = 8,
                partition_by: list[str] | None = None,
                compression: str | None = "gzip") -> None:
    """JSON-lines corpus export (the reference's wire encoding,
    src/context.ts:122-123, as a file dataset): `write_sharded` with
    fmt=json. Gzip matches the reference's CompressionTypes.GZIP; note
    gzip JSONL is unsplittable — shard count alone controls read
    parallelism, so size shards to ~128-512 MB compressed. Timestamps
    serialize with the facade-wide microsecond format — Spark's default
    keeps only milliseconds, which would silently truncate event times
    on a JSONL round-trip."""
    from ..stream import _JSON_TS_FORMAT

    write_sharded(df, path, partition_by=partition_by, shards=shards,
                  fmt="json", compression=compression,
                  timestampFormat=_JSON_TS_FORMAT)


def read_jsonl(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    """Schema-pinned JSONL reader (no inference pass; corrupt lines land in
    `_corrupt_record` if declared in the schema rather than failing the
    job — the PERMISSIVE default). Reads the microsecond timestampFormat
    write_jsonl emits."""
    from ..stream import _JSON_TS_FORMAT

    return (
        spark.read.schema(schema)
        .option("timestampFormat", _JSON_TS_FORMAT)
        .json(path)
    )


def read_csv(spark: SparkSession, path: str, schema: StructType | str,
             header: bool = True, **options) -> DataFrame:
    """Schema-pinned CSV reader. Explicit schema keeps the read one pass
    and the types stable; multiline/quote/escape options pass through."""
    return spark.read.schema(schema).options(header=header, **options).csv(path)
