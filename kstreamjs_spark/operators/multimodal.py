"""Multimodal-column plumbing: image/audio/video payloads travel as opaque
``binary`` columns with typed metadata; decode / feature-extract run as
Arrow-batched Pandas functions over ``mapInPandas``.

Three formats decode FOR REAL with dependency-free pure-Python kernels:
uncompressed BMP (header arithmetic, `decode_bmp`), PCM WAV (RIFF chunk
walk, `decode_wav`), and 8-bit PNG (chunk walk + CRC + stdlib-zlib
inflate + all-five-filter reconstruction with a pixel checksum,
`decode_png`). Formats needing codec libraries the container lacks
(JPEG, MP4) are STUBBED (clearly marked below) with a deterministic fake
that derives "metadata" from the raw bytes. Everything Spark-side —
schema, batch iteration, partitioning behavior, UDF signatures — is real
and tested; swapping the stub for PIL/ffmpeg is a one-function change.

Scale notes: binary payloads dominate row size, so these pipelines set
``spark.sql.files.maxPartitionBytes`` lower (or store blobs in separate
row groups) to keep Arrow batches memory-bounded; mapInPandas streams
batches, never materializing a partition at once.
"""

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


def encode_bmp(width: int, height: int, pixel: bytes = b"\x7f") -> bytes:
    """Pure-Python uncompressed 24-bit BMP writer (fixture generator for
    the real decode path — no image libraries in this container). Rows
    are bottom-up, padded to 4-byte boundaries; every pixel is the single
    ``pixel`` byte repeated across B,G,R (content is irrelevant to the
    header-decode test, determinism is not)."""
    row = (pixel * 3) * width
    pad = (-len(row)) % 4
    body = (row + b"\x00" * pad) * height
    off = 14 + 40
    size = off + len(body)
    header = (
        b"BM"
        + size.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + off.to_bytes(4, "little")
    )
    dib = (
        (40).to_bytes(4, "little")
        + width.to_bytes(4, "little", signed=True)
        + height.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")   # planes
        + (24).to_bytes(2, "little")  # bpp
        + (0).to_bytes(4, "little")   # BI_RGB, uncompressed
        + len(body).to_bytes(4, "little")
        + b"\x00" * 16                # resolutions + palette counts
    )
    return header + dib + body


def decode_bmp(blob: bytes) -> tuple[int, int, int, int] | None:
    """REAL decode kernel: parse an uncompressed BITMAPINFOHEADER BMP
    (24/32bpp, BI_RGB) without any image library — pure header
    arithmetic, which is all the metadata stage needs. Returns
    (byte_len, width, height, channels), or None when the payload is not
    a well-formed uncompressed BMP (wrong magic, truncated, compressed,
    palette formats) so the caller can fall back. Validation is strict —
    magic, header size, compression, bit depth, the file-size field, and
    the row-padded body length must ALL agree — so arbitrary text bytes
    can never alias into the real path (4 ASCII bytes read as the
    file-size field are >500 MB, which cannot equal a real blob's
    length)."""
    if len(blob) < 54 or blob[:2] != b"BM":
        return None
    file_size = int.from_bytes(blob[2:6], "little")
    off = int.from_bytes(blob[10:14], "little")
    dib_size = int.from_bytes(blob[14:18], "little")
    if file_size != len(blob) or dib_size < 40 or off < 14 + dib_size:
        return None
    width = int.from_bytes(blob[18:22], "little", signed=True)
    height = int.from_bytes(blob[22:26], "little", signed=True)
    bpp = int.from_bytes(blob[28:30], "little")
    compression = int.from_bytes(blob[30:34], "little")
    if compression != 0 or bpp not in (24, 32) or width <= 0 or height == 0:
        return None
    nrows = abs(height)  # negative height = top-down row order
    stride = (width * (bpp // 8) + 3) & ~3
    if off + stride * nrows > len(blob):
        return None
    return len(blob), width, nrows, bpp // 8


def encode_wav(
    n_samples: int, sample_rate: int = 16000, n_channels: int = 1,
    bits: int = 16,
) -> bytes:
    """Pure-Python PCM WAV writer (fixture generator for the real audio
    decode path). Samples are a deterministic sawtooth — content is
    irrelevant to header decode, determinism is not."""
    bytes_per_sample = bits // 8
    frame = n_channels * bytes_per_sample
    body = bytes(
        (i * 7) % 256 for i in range(n_samples * frame)
    )
    byte_rate = sample_rate * frame
    fmt = (
        b"fmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")            # PCM
        + n_channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + frame.to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    data = b"data" + len(body).to_bytes(4, "little") + body
    if len(body) % 2:
        # RIFF chunks are word-aligned: odd-length data (bits=8, odd
        # n_samples*channels) carries a pad byte that counts toward the
        # RIFF size but NOT the chunk size.
        data += b"\x00"
    riff_len = 4 + len(fmt) + len(data)
    return b"RIFF" + riff_len.to_bytes(4, "little") + b"WAVE" + fmt + data


def decode_wav(blob: bytes) -> tuple[int, int, int, int] | None:
    """REAL audio decode kernel: parse a PCM RIFF/WAVE header — pure
    chunk-walk arithmetic, no codec library. Returns (byte_len,
    n_channels, sample_rate, n_samples), or None when the payload is not
    well-formed PCM WAV (wrong magic, truncated, compressed, chunk-size
    lies) so the caller can fall back. Validation is strict — RIFF size,
    PCM format tag, block-align consistency, and the data chunk bounded
    by the blob — so arbitrary bytes cannot alias into the real path."""
    if len(blob) < 44 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        return None
    if int.from_bytes(blob[4:8], "little") != len(blob) - 8:
        return None
    pos, fmt, data_len = 12, None, None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        size = int.from_bytes(blob[pos + 4 : pos + 8], "little")
        if pos + 8 + size > len(blob):
            return None
        if cid == b"fmt " and size >= 16:
            fmt = blob[pos + 8 : pos + 24]
        elif cid == b"data":
            data_len = size
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data_len is None:
        return None
    audio_format = int.from_bytes(fmt[0:2], "little")
    n_channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    block_align = int.from_bytes(fmt[12:14], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if (
        audio_format != 1  # PCM only
        or n_channels == 0
        or sample_rate == 0
        or block_align != n_channels * (bits // 8)
        or block_align == 0
        or data_len % block_align != 0
    ):
        return None
    return len(blob), n_channels, sample_rate, data_len // block_align


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (gray, RGB, gray+alpha, RGBA)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6) — picks the neighbor closest
    to the linear estimate a+b-c, ties broken left, above, upper-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        len(data).to_bytes(4, "big") + ctype + data
        + (zlib.crc32(ctype + data) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def encode_png(
    width: int, height: int, pixels: bytes, n_channels: int = 1
) -> bytes:
    """Pure-Python 8-bit PNG writer (fixture generator for the real
    decode path — stdlib zlib only, no image library). ``pixels`` is the
    raw sample stream, ``width*height*n_channels`` bytes, row-major.
    Each scanline is filtered with type ``y % 5`` so a round-trip
    exercises ALL five PNG filter reconstructions (None/Sub/Up/Average/
    Paeth), not just the trivial one."""
    import zlib

    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[n_channels]
    bpp = n_channels  # bytes per pixel at bit depth 8
    stride = width * bpp
    if len(pixels) != stride * height:
        raise ValueError(
            f"pixels must be {stride * height} bytes, got {len(pixels)}"
        )
    prev = bytes(stride)
    raw = bytearray()
    for y in range(height):
        row = pixels[y * stride:(y + 1) * stride]
        ft = y % 5
        raw.append(ft)
        for x in range(stride):
            a = row[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if ft == 0:
                raw.append(row[x])
            elif ft == 1:
                raw.append((row[x] - a) & 0xFF)
            elif ft == 2:
                raw.append((row[x] - b) & 0xFF)
            elif ft == 3:
                raw.append((row[x] - (a + b) // 2) & 0xFF)
            else:
                raw.append((row[x] - _paeth(a, b, c)) & 0xFF)
        prev = row
    ihdr = (
        width.to_bytes(4, "big") + height.to_bytes(4, "big")
        + bytes([8, color_type, 0, 0, 0])  # depth 8, deflate, adaptive, no interlace
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(blob: bytes) -> tuple[int, int, int, int, int, int] | None:
    """REAL image decode kernel: full PNG read — chunk walk with CRC
    verification, IHDR parse, IDAT inflate (stdlib zlib), and the
    per-scanline filter-byte walk reconstructing actual pixel bytes —
    no image library. Returns (byte_len, width, height, n_channels,
    bit_depth, pixel_sum) where pixel_sum is the sum of every
    reconstructed sample byte (a content checksum only a correct
    inflate+unfilter can produce), or None for anything that is not a
    well-formed 8-bit non-interlaced PNG (bad magic, bad CRC, truncated
    or lying chunk lengths, unknown filter types, decompressed size
    mismatch) so the caller can fall back. Interlaced (Adam7) and 16-bit
    images are honestly rejected rather than half-decoded."""
    import zlib

    if len(blob) < len(_PNG_SIG) + 12 or blob[:8] != _PNG_SIG:
        return None
    pos, ihdr, idat, seen_end = 8, None, bytearray(), False
    while pos + 12 <= len(blob):
        size = int.from_bytes(blob[pos:pos + 4], "big")
        ctype = blob[pos + 4:pos + 8]
        end = pos + 8 + size
        if end + 4 > len(blob):
            return None
        data = blob[pos + 8:end]
        crc = int.from_bytes(blob[end:end + 4], "big")
        if (zlib.crc32(ctype + data) & 0xFFFFFFFF) != crc:
            return None
        if ctype == b"IHDR":
            if ihdr is not None or size != 13:
                return None  # duplicate or malformed header
            ihdr = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            seen_end = end + 4 == len(blob)
            break
        pos = end + 4
    if ihdr is None or not idat or not seen_end:
        return None
    width = int.from_bytes(ihdr[0:4], "big")
    height = int.from_bytes(ihdr[4:8], "big")
    depth, color_type, comp, filt, interlace = ihdr[8:13]
    nch = _PNG_CHANNELS.get(color_type)
    if (
        width == 0 or height == 0 or depth != 8 or nch is None
        or comp != 0 or filt != 0 or interlace != 0
    ):
        return None
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    stride = width * nch
    if len(raw) != height * (stride + 1):
        return None
    prev = bytes(stride)
    total = 0
    for y in range(height):
        off = y * (stride + 1)
        ft = raw[off]
        if ft > 4:
            return None
        line = raw[off + 1:off + 1 + stride]
        cur = bytearray(stride)
        for x in range(stride):
            a = cur[x - nch] if x >= nch else 0
            b = prev[x]
            c = prev[x - nch] if x >= nch else 0
            if ft == 0:
                v = line[x]
            elif ft == 1:
                v = (line[x] + a) & 0xFF
            elif ft == 2:
                v = (line[x] + b) & 0xFF
            elif ft == 3:
                v = (line[x] + (a + b) // 2) & 0xFF
            else:
                v = (line[x] + _paeth(a, b, c)) & 0xFF
            cur[x] = v
            total += v
        prev = bytes(cur)
    return len(blob), width, height, nch, depth, total


PNG_META_SCHEMA = (
    "doc_id long, width long, height long, n_channels long, "
    "bit_depth long, pixel_sum long"
)


def decode_png_blobs(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """Decode PNG payloads to typed metadata + pixel checksum via
    mapInPandas — the compressed-image twin of `decode_audio_blobs`.
    Non-PNG payloads yield NULL metadata (explicit unknown, never fake
    numbers). byte_len is intentionally NOT part of the output: the
    deflate stream length is not arithmetic-derivable, so it cannot be
    oracle-checked the way the WAV header could."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc, b in zip(pdf[id_col], pdf[blob_col]):
                meta = decode_png(b)
                rows.append(
                    (doc, *meta[1:]) if meta else (doc, None, None, None, None, None)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "n_channels", "bit_depth",
                    "pixel_sum",
                ],
            )

    return df.select(id_col, blob_col).mapInPandas(batches, PNG_META_SCHEMA)


AUDIO_META_SCHEMA = (
    "doc_id long, byte_len long, n_channels long, sample_rate long, "
    "n_samples long"
)


def decode_audio_blobs(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """Decode audio payloads to typed metadata via mapInPandas — the
    audio twin of `decode_blobs`. PCM WAV decodes for real
    (`decode_wav`); anything else yields NULL metadata (explicit
    unknown, never fake numbers — audio has no meaningful length-derived
    stub)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc, b in zip(pdf[id_col], pdf[blob_col]):
                meta = decode_wav(b)
                rows.append(
                    (doc, *meta[1:], len(b))
                    if meta
                    else (doc, None, None, None, len(b))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_channels", "sample_rate", "n_samples",
                    "byte_len",
                ],
            )[["doc_id", "byte_len", "n_channels", "sample_rate", "n_samples"]]

    return df.select(id_col, blob_col).mapInPandas(batches, AUDIO_META_SCHEMA)


def decode_blobs(df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob") -> DataFrame:
    """Decode binary payloads to typed metadata via mapInPandas (Arrow
    batches; one Python roundtrip per batch, not per row). Uncompressed
    BMPs decode for real (`decode_bmp` — header arithmetic, no codec
    library); anything else takes the deterministic stub fallback."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [
                decode_bmp(b) or _decode_stub(b) for b in pdf[blob_col]
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
