"""Shared multimodal plumbing: blob ingestion fixtures, the generic
meta-decode mapInPandas driver, the deterministic stub, and the
decode-size ceiling every real kernel honors. See the package
__init__ for the full multimodal story."""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

BLOB_META_SCHEMA = (
    "doc_id long, byte_len long, width long, height long, channels long"
)


from kstreamjs_spark.plans import widen_partitions  # noqa: F401  (re-export: synth helpers + queries import it from here)


def with_blob(df: DataFrame, text_col: str = "text", blob_col: str = "blob") -> DataFrame:
    """Materialize an opaque binary column (here: utf-8 bytes of the text
    column — the test corpus has no real media; a real pipeline reads
    `binaryFile` format or parquet BYTE_ARRAY)."""
    return df.withColumn(blob_col, F.encode(F.col(text_col), "utf-8"))


def write_blob_fixture(
    df: DataFrame, path: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """TEST-ONLY fixture writer: exports each row's utf-8 text bytes as
    ``<doc_id>.bin`` so the `binaryFile` reader path can be exercised
    without real media. Collects to the driver — bounded because test
    corpora are small; a real deployment already has its media on shared
    storage and never runs this. Idempotent and race-safe: writes into a
    temp dir, marks _SUCCESS, renames into place; a loser of the rename
    race discards its copy. A pre-existing dir WITHOUT the marker (an
    interrupted external copy) is removed and rebuilt rather than
    returned broken forever."""
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    if os.path.isdir(path):
        shutil.rmtree(path, ignore_errors=True)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = tempfile.mkdtemp(dir=os.path.dirname(path) or ".")
    for r in df.select(id_col, text_col).collect():
        with open(os.path.join(tmp, f"{r[id_col]}.bin"), "wb") as f:
            f.write(r[text_col].encode("utf-8"))
    open(os.path.join(tmp, "_SUCCESS"), "w").close()
    try:
        os.rename(tmp, path)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return path


def read_blob_files(
    spark: SparkSession, path: str, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """REAL multimodal ingestion: `spark.read.format("binaryFile")` over a
    directory of media files -> (doc_id parsed from the file name, blob).
    This is the reader a multimodal user starts from; at scale binaryFile
    assigns whole files to tasks and `spark.sql.files.maxPartitionBytes`
    bounds how many blob bytes land in one partition."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(path)
    )
    return raw.select(
        F.regexp_extract(F.col("path"), r"(\d+)\.bin$", 1)
        .cast("long")
        .alias(id_col),
        F.col("content").alias(blob_col),
    )


def _decode_stub(blob: bytes) -> tuple[int, int, int, int]:
    """Fallback decode kernel for non-image payloads. Deterministic fake:
    derives image-like metadata from byte length. A real deployment swaps
    this for PIL/ffmpeg dispatch on the remaining formats (the container
    has no codec libraries); uncompressed BMP is decoded for real by
    `decode_bmp` below.
    """
    n = len(blob)
    return n, n % 640, n % 480, 3



_MAX_DECODE_BYTES = 1 << 26


def _decode_meta_blobs(
    df: DataFrame,
    decode_fn,
    meta_cols: list[str],
    schema: str,
    id_col: str,
    blob_col: str,
) -> DataFrame:
    """Shared mapInPandas shape of the typed-metadata decoders: one row
    per blob, ``decode_fn``'s tuple minus its leading byte_len, NULLs for
    payloads the kernel rejects (explicit unknown, never fake numbers)."""
    n = len(meta_cols)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc, b in zip(pdf[id_col], pdf[blob_col]):
                meta = decode_fn(b)
                rows.append((doc, *meta[1:]) if meta else (doc,) + (None,) * n)
            yield pd.DataFrame(rows, columns=[id_col, *meta_cols])

    return df.select(id_col, blob_col).mapInPandas(batches, schema)


