"""Format-dispatching blob operators: magic-byte pixel/meta dispatch
across every real kernel (BMP/PNG/JPEG/GIF images, WAV/FLAC audio,
MP4 video), the total/strict pHash pipeline, and the stub-backed
resize / frame-sample plumbing whose Spark-side contract (schema,
Arrow batching, 1:1 / 1:N shape) is real and tested."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .animation import _GIF_MAGICS, decode_gif, decode_gif_pixels
from .core import BLOB_META_SCHEMA, _decode_stub
from .image import (
    _PNG_SIG,
    _pixels_to_luma,
    decode_bmp,
    decode_bmp_pixels,
    decode_png,
    decode_png_pixels,
    phash64,
)
from .jpeg import decode_jpeg, decode_jpeg_pixels

def decode_image_pixels(blob: bytes):
    """Multi-format pixel decode: dispatch on magic bytes to the real
    BMP / PNG / JPEG (baseline + progressive) / GIF pixel kernels,
    normalizing to a numpy uint8 array of shape (height, width,
    channels) in raster order. Returns None for payloads outside every
    kernel's envelope — the magic-byte dispatch means a malformed BMP
    is reported as a bad BMP (None), never mis-tried as a PNG."""
    if blob[:2] == b"BM":
        return decode_bmp_pixels(blob)
    if blob[:8] == _PNG_SIG:
        return decode_png_pixels(blob)
    if blob[:2] == b"\xff\xd8":
        return decode_jpeg_pixels(blob)
    if blob[:6] in _GIF_MAGICS:
        return decode_gif_pixels(blob)
    return None



def phash_blobs(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob",
    strict: bool = True,
) -> DataFrame:
    """Per-image perceptual hash over a binary column: decode pixels
    with the real kernels (BMP, PNG, baseline/progressive JPEG —
    magic-byte dispatch via `decode_image_pixels`), collapse channels to luma,
    pHash. Arrow-batched mapInPandas; blobs never leave the executors
    and the output is one BIGINT per row — the perfect shuffle key for
    Hamming-bucketed image near-dup (`dedup.hamming_neardup_pairs`).

    Undecodable payloads: with ``strict=True`` (default) raise rather
    than silently hashing garbage — right when garbage means a broken
    upstream (the fixture pipelines). With ``strict=False`` the
    operator is TOTAL — the robust-ingest shape for a real crawled
    corpus: bad rows yield a NULL hash plus a ``reason`` column
    (quarantine, not kill), clean rows are byte-identical to strict
    mode, and the plan shape is unchanged (still one mapInPandas
    projection)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hashes: list = []
            reasons: list = []
            for b in pdf[blob_col]:
                px = decode_image_pixels(bytes(b))
                if px is None:
                    if strict:
                        raise ValueError(
                            "phash_blobs: payload is not a well-formed "
                            "BMP / PNG / JPEG / GIF image"
                        )
                    hashes.append(None)
                    reasons.append("undecodable: not a well-formed "
                                   "BMP / PNG / JPEG / GIF image")
                    continue
                hashes.append(phash64(_pixels_to_luma(px)))
                reasons.append(None)
            out = {
                id_col: pdf[id_col].values,
                # explicit Int64: an empty or all-bad batch would
                # otherwise infer object/float and fail Arrow conversion
                "phash": pd.Series(hashes, dtype="Int64"),
            }
            if not strict:
                out["reason"] = pd.Series(reasons, dtype="object")
            yield pd.DataFrame(out)

    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, phash long"
    if not strict:
        schema += ", reason string"
    return df.select(id_col, blob_col).mapInPandas(batches, schema)



def sniff_image(blob: bytes) -> tuple[int, int, int, int] | None:
    """Multi-format image sniff: try each real image kernel in turn (each
    bails on its magic bytes in O(1) for foreign payloads) and normalize
    to (byte_len, width, height, channels). None for payloads that are
    not a well-formed BMP, PNG, baseline JPEG, or GIF — audio/video have
    their own format-true typed decoders (`decode_audio_blobs`,
    `decode_video_blobs`), not a lossy squeeze into the image schema."""
    meta = decode_bmp(blob)
    if meta:
        return meta
    png = decode_png(blob)
    if png:
        return png[0], png[1], png[2], png[3]
    jpg = decode_jpeg(blob)
    if jpg:
        return jpg[0], jpg[1], jpg[2], jpg[3]
    gif = decode_gif(blob)
    if gif:
        return gif
    return None


def decode_blobs(df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob") -> DataFrame:
    """Decode binary payloads to typed metadata via mapInPandas (Arrow
    batches; one Python roundtrip per batch, not per row). The image
    formats with real kernels — uncompressed BMP, 8-bit PNG, baseline
    JPEG — dispatch through `sniff_image` and return TRUE dimensions;
    anything else takes the deterministic stub fallback (strict magic +
    checksum validation in every kernel guarantees text bytes can never
    alias into a real path, so corpora without media keep the stub
    contract the q40 oracle states)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [
                sniff_image(b) or _decode_stub(b) for b in pdf[blob_col]
            ]
            out = pd.DataFrame(
                decoded, columns=["byte_len", "width", "height", "channels"]
            )
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out

    return df.select(id_col, blob_col).mapInPandas(batches, BLOB_META_SCHEMA)


RESIZE_SCHEMA = "doc_id long, out_w long, out_h long, out_bytes binary"


def resize_blobs(
    df: DataFrame,
    out_w: int,
    out_h: int,
    id_col: str = "doc_id",
    blob_col: str = "blob",
) -> DataFrame:
    """'Resize' binary image payloads via mapInPandas. STUB kernel: emits a
    deterministic byte slice/pad of length out_w*out_h (a real pipeline
    calls PIL `Image.resize` here; the Spark-side contract — binary in,
    binary out, 1:1 rows, Arrow-batched — is identical)."""
    size = out_w * out_h

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = [
                bytes(b[:size]).ljust(size, b"\0") for b in pdf[blob_col]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "out_w": out_w,
                    "out_h": out_h,
                    "out_bytes": resized,
                }
            )

    return df.select(id_col, blob_col).mapInPandas(batches, RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx long, frame_off long, frame_bytes long"


def sample_frames(
    df: DataFrame,
    n_frames: int = 4,
    id_col: str = "doc_id",
    blob_col: str = "blob",
) -> DataFrame:
    """Sample n 'frames' from each binary video payload — a 1:N generator
    via mapInPandas (the multimodal analogue of explode). STUB kernel:
    frames are evenly-spaced byte windows; a real pipeline seeks keyframes
    with ffmpeg. Output rows: (doc_id, frame_idx, byte offset, window
    size) — at scale this is the decode-bound stage, so partition on the
    input (blobs), never on the exploded output."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, offs, sizes = [], [], [], []
            for doc, b in zip(pdf[id_col], pdf[blob_col]):
                n = len(b)
                step = max(n // n_frames, 1)
                for i in range(min(n_frames, n)):
                    ids.append(doc)
                    idxs.append(i)
                    offs.append(i * step)
                    sizes.append(min(step, n - i * step))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_off": offs,
                 "frame_bytes": sizes}
            )

    return df.select(id_col, blob_col).mapInPandas(batches, FRAME_SCHEMA)


