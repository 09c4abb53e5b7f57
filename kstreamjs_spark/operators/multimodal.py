"""Multimodal-column plumbing: image/audio/video payloads travel as opaque
``binary`` columns with typed metadata; decode / feature-extract run as
Arrow-batched Pandas functions over ``mapInPandas``.

Five formats decode FOR REAL with dependency-free pure-Python kernels:
uncompressed BMP (header arithmetic, `decode_bmp`), PCM WAV (RIFF chunk
walk, `decode_wav`), 8-bit PNG (chunk walk + CRC + stdlib-zlib inflate +
all-five-filter reconstruction with a pixel checksum, `decode_png`),
JPEG — baseline AND progressive (SOF2 multi-scan: spectral selection,
successive approximation, EOB-run coding), grayscale, 4:4:4 color, and
the chroma-subsampled 4:2:0/4:2:2 layouts real corpora are full of
(marker walk + DHT-driven huffman entropy decode + dequantize +
numpy-batched 2-D IDCT + chroma upsample, `decode_jpeg`), and ISO-BMFF
MP4 (box walk over moov/trak/stbl sample tables for metadata AND real
per-frame offset/size/timestamp rows, `decode_mp4` /
`mp4_sample_table`). Video frame PIXEL decode is real for the
Motion-JPEG family (`decode_mjpeg_frame`: sample-table seek + the full
JPEG pixel kernel on the sliced sample — intra-frame video needs no
codec library).
Remaining honest limit, clearly marked below: frame-pixel decode of
INTER-frame codecs (H.264/VP9/AV1) needs codec libraries the container
lacks, so `_decode_stub` and `resize_blobs` keep deterministic fakes. Everything Spark-side — schema,
batch iteration, partitioning behavior, UDF signatures — is real and
tested; swapping a stub for PIL/ffmpeg is a one-function change.

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


def encode_bmp_pixels(width: int, height: int, gray: bytes) -> bytes:
    """Pure-Python 24-bit BMP writer with CALLER-SUPPLIED pixel content:
    ``gray`` is ``width*height`` luma bytes in raster (top-down) order,
    replicated across B,G,R. Rows are stored bottom-up per the BMP spec
    and padded to 4-byte boundaries — `decode_bmp_pixels` reverses both,
    so the pair is an exact roundtrip (the content-carrying sibling of
    `encode_bmp`, whose single repeated byte is enough for the
    header-decode tests but not for perceptual hashing)."""
    import numpy as np

    if len(gray) != width * height:
        raise ValueError(
            f"encode_bmp_pixels: need {width * height} luma bytes, "
            f"got {len(gray)}"
        )
    pad = (-(width * 3)) % 4
    # vectorized row build: luma tripled to B,G,R, rows flipped to
    # bottom-up storage order, stride-padded — one numpy pass instead of
    # a per-pixel Python loop (the fixture synthesis in the stress sweep
    # was spending more time here than in the DCT it feeds)
    px = np.frombuffer(gray, dtype=np.uint8).reshape(height, width)
    rows = np.zeros((height, width * 3 + pad), dtype=np.uint8)
    rows[:, : width * 3] = np.repeat(px[::-1], 3, axis=1)
    body = rows.tobytes()
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
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(body).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return header + dib + body


def decode_bmp_pixels(blob: bytes):
    """REAL pixel-decode kernel: the strict `decode_bmp` header
    validation plus full pixel reconstruction — stride un-padding,
    bottom-up (or negative-height top-down) row order, BGR channel
    unpack. Returns a numpy uint8 array of shape (height, width,
    channels) in raster order, or None on any malformation (same
    contract as the metadata kernel: arbitrary bytes can never alias
    in)."""
    import numpy as np

    meta = decode_bmp(blob)
    if meta is None:
        return None
    _, width, nrows, nchan = meta
    off = int.from_bytes(blob[10:14], "little")
    height = int.from_bytes(blob[22:26], "little", signed=True)
    stride = (width * nchan + 3) & ~3
    body = np.frombuffer(blob, dtype=np.uint8, count=stride * nrows, offset=off)
    rows = body.reshape(nrows, stride)[:, : width * nchan]
    px = rows.reshape(nrows, width, nchan)
    if height > 0:  # bottom-up storage -> flip back to raster order
        px = px[::-1]
    # stored order is B,G,R(,A) -> return R,G,B(,A)
    if nchan >= 3:
        px = px[:, :, [2, 1, 0] + list(range(3, nchan))]
    return np.ascontiguousarray(px)


# --------------------------------------------------- perceptual hash (pHash)
_PHASH_N = 32  # resize target; DCT size


_DCT_CACHE: dict[int, object] = {}


def _dct_matrix(n: int):
    """Orthonormal DCT-II matrix (the classic pHash transform); cached —
    phash64 runs per row inside Arrow batches."""
    import numpy as np

    if n not in _DCT_CACHE:
        k = np.arange(n)[:, None].astype(np.float64)
        m = np.arange(n)[None, :].astype(np.float64)
        c = np.cos(np.pi * (m + 0.5) * k / n) * np.sqrt(2.0 / n)
        c[0, :] *= 1.0 / np.sqrt(2.0)
        _DCT_CACHE[n] = c
    return _DCT_CACHE[n]


def phash64(gray) -> int:
    """64-bit-class perceptual hash of a 2-D grayscale array: sample down
    to 32x32, 2-D orthonormal DCT-II, keep the top-left 8x8
    low-frequency block, drop the DC term, threshold the remaining 63
    coefficients at their median -> 63 packed bits (bit i = coefficient
    i+1 above median; bit 63 stays 0 so the hash is a non-negative
    BIGINT).

    Dropping DC and thresholding at the median make the hash EXACTLY
    invariant to global brightness shifts and positive contrast scaling
    (DC absorbs the shift; scaling moves every AC coefficient and the
    median together), which is what makes it a perceptual near-dup key
    rather than a byte hash."""
    import numpy as np

    a = np.asarray(gray, dtype=np.float64)
    h, w = a.shape
    n = _PHASH_N
    # deterministic nearest-index sampling (exactly-32x32 inputs pass
    # through unchanged; smaller inputs are nearest-index upsampled by
    # repeating indices — deterministic either way)
    ys = (np.arange(n) * h) // n
    xs = (np.arange(n) * w) // n
    small = a[np.ix_(ys, xs)]
    c = _dct_matrix(n)
    block = (c @ small @ c.T)[:8, :8].ravel()
    ac = block[1:]
    med = float(np.median(ac))
    bits = ac > med
    # vectorized pack: sum of distinct powers of two, max 2^63 - 1
    return int(
        (bits.astype(np.uint64) << np.arange(63, dtype=np.uint64)).sum()
    )


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


def _pixels_to_luma(px):
    """Collapse a (h, w, channels) pixel array to a float64 luma plane:
    equal-weight mean of the COLOR channels only — alpha planes (BMP
    32-bpp, PNG gray+alpha/RGBA) must not count as a color channel, or
    identical content with different alpha would hash apart. 1- and
    2-channel layouts are grayscale(-alpha): luma IS channel 0."""
    import numpy as np

    if px.shape[2] >= 3:
        return px[:, :, :3].astype(np.float64).mean(axis=2)
    return px[:, :, 0].astype(np.float64)


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


def encode_wav_samples(
    samples, sample_rate: int = 16000, n_channels: int = 1
) -> bytes:
    """16-bit PCM WAV writer with CALLER-SUPPLIED samples (int16 array
    or anything numpy can cast; interleaved frames when n_channels > 1)
    — the content-carrying sibling of `encode_wav`, needed by audio
    fingerprinting the way `encode_bmp_pixels` is by pHash."""
    import numpy as np

    arr = np.asarray(samples, dtype=np.int16)
    if arr.size % n_channels:
        raise ValueError(
            f"encode_wav_samples: {arr.size} samples do not divide into "
            f"{n_channels} channels"
        )
    body = arr.astype("<i2").tobytes()
    frame = n_channels * 2
    byte_rate = sample_rate * frame
    fmt = (
        b"fmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + n_channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + frame.to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    data = b"data" + len(body).to_bytes(4, "little") + body
    riff_len = 4 + len(fmt) + len(data)
    return b"RIFF" + riff_len.to_bytes(4, "little") + b"WAVE" + fmt + data


def decode_wav_samples(blob: bytes):
    """REAL sample-decode kernel: the strict `decode_wav` validation plus
    PCM sample extraction. Returns (sample_rate, int16 array of shape
    (n_samples, n_channels)), or None on malformation / non-16-bit
    payloads. Little-endian per the RIFF spec."""
    import numpy as np

    meta = decode_wav(blob)
    if meta is None:
        return None
    _, n_channels, sample_rate, n_samples = meta
    # walk ALL chunks before extracting: a data chunk is allowed to
    # precede fmt in RIFF, and the 16-bit gate must hold regardless of
    # chunk order (decode_wav proved the walk is in-bounds)
    pos, bits, data_off = 12, None, None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        size = int.from_bytes(blob[pos + 4 : pos + 8], "little")
        if cid == b"fmt " and size >= 16:
            bits = int.from_bytes(blob[pos + 22 : pos + 24], "little")
        elif cid == b"data":
            data_off = pos + 8
        pos += 8 + size + (size & 1)
    if bits != 16 or data_off is None:
        return None  # sample extraction is 16-bit-only
    arr = np.frombuffer(
        blob, dtype="<i2", count=n_samples * n_channels, offset=data_off
    )
    return sample_rate, arr.reshape(n_samples, n_channels)


# ------------------------------------------- audio fingerprint (energy AFP)
_AFP_FRAMES = 64


def afp64(samples) -> int:
    """64-bit-class audio fingerprint over a 1-D PCM sample array: split
    into 64 equal frames, per-frame energy (sum of squares — EXACT in
    float64 for int16 input), bit i = energy[i+1] > energy[i] -> 63
    packed bits (the energy-difference scheme of the classic
    Haitsma-Kalker fingerprint family, public knowledge, reduced to its
    time-axis term).

    Comparing ADJACENT energies makes the hash exactly invariant to
    positive gain (every energy scales by gain^2, and integer-valued
    energies under 2^53 compare exactly) — the audio analogue of
    pHash's brightness/contrast invariance."""
    import numpy as np

    a = np.asarray(samples, dtype=np.float64).ravel()
    n = _AFP_FRAMES
    if len(a) < n:
        raise ValueError(f"afp64: need >= {n} samples, got {len(a)}")
    cut = (len(a) // n) * n  # drop the ragged tail for equal frames
    e = (a[:cut] ** 2).reshape(n, cut // n).sum(axis=1)
    bits = e[1:] > e[:-1]
    return int(
        (bits.astype(np.uint64) << np.arange(63, dtype=np.uint64)).sum()
    )


def afp_blobs(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob",
    strict: bool = True,
) -> DataFrame:
    """Per-clip audio fingerprint over a binary column: decode PCM
    samples with the real kernels — magic-byte codec dispatch, WAV or
    FLAC (round 12), channels collapsed by summation (gain-safe) —
    then the energy-difference AFP. Arrow-batched mapInPandas; blobs
    never leave the executors, output one BIGINT per row for
    `dedup.hamming_neardup_pairs`. Lossless codecs reproduce identical
    samples, so the SAME clip fingerprints identically whether crawled
    as WAV or FLAC — q160b's cross-codec contract.

    Undecodable payloads: ``strict=True`` raises (fixture pipelines,
    garbage = broken upstream); ``strict=False`` is the robust-ingest
    total shape — NULL fingerprint + ``reason`` column for bad rows
    (including well-formed-but-too-short clips, which `afp64` cannot
    frame), clean rows identical, plan unchanged."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hashes: list = []
            reasons: list = []
            for b in pdf[blob_col]:
                dec = decode_audio_samples(bytes(b))
                if dec is None or dec[1].shape[0] < _AFP_FRAMES:
                    if dec is not None:
                        reason = (f"too short: < {_AFP_FRAMES} samples, "
                                  "cannot frame")
                    else:
                        reason = ("undecodable: not well-formed 16-bit "
                                  "PCM WAV or FLAC")
                    if strict:
                        raise ValueError(f"afp_blobs: {reason}")
                    hashes.append(None)
                    reasons.append(reason)
                    continue
                _, arr = dec
                mono = arr.astype(np.float64).sum(axis=1)
                hashes.append(afp64(mono))
                reasons.append(None)
            out = {
                id_col: pdf[id_col].values,
                "afp": pd.Series(hashes, dtype="Int64"),
            }
            if not strict:
                out["reason"] = pd.Series(reasons, dtype="object")
            yield pd.DataFrame(out)

    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, afp long"
    if not strict:
        schema += ", reason string"
    return df.select(id_col, blob_col).mapInPandas(batches, schema)


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


# Decode envelope shared by the image kernels: a decoder running inside a
# mapInPandas task must never let a CRAFTED HEADER choose the allocation
# size (a 100-byte blob can declare 65535x65535 pixels — the resulting
# MemoryError is not a ValueError and would kill the task instead of
# falling back to NULL). 64 MiB of raw samples covers any honest fixture
# or thumbnail pipeline by orders of magnitude.
_MAX_DECODE_BYTES = 1 << 26

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


def _png_parse(blob: bytes) -> tuple[int, int, int, bytes] | None:
    """Shared PNG front half: chunk walk with CRC verification, IHDR
    parse/validation, bounded IDAT inflate. Returns (width, height,
    n_channels, raw_filtered_bytes) for a well-formed 8-bit
    non-interlaced PNG, else None. The filter walk lives in the two
    back halves (`decode_png` checksum / `decode_png_pixels` array) so
    the validation contract can never fork between them."""
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
    stride = width * nch
    expected = height * (stride + 1)
    if expected > _MAX_DECODE_BYTES:
        return None  # declared dims beyond the decode envelope
    d = zlib.decompressobj()
    try:
        # bounded inflate: a deflate bomb whose IHDR lies about the size
        # stops at expected+1 bytes (-> length mismatch -> None) instead
        # of ballooning to the stream's real size before the check
        raw = d.decompress(bytes(idat), expected + 1)
    except zlib.error:
        return None
    if (
        len(raw) != expected
        or not d.eof or d.unused_data or d.unconsumed_tail
    ):
        return None
    return width, height, nch, raw


def _png_unfilter(raw: bytes, width: int, height: int, nch: int) -> bytearray | None:
    """PNG scanline filter reconstruction (RFC 2083 §6): walks the
    per-row filter byte and rebuilds actual sample bytes. Returns the
    raster-order sample stream (height*width*nch bytes) or None on an
    unknown filter type."""
    stride = width * nch
    prev = bytes(stride)
    out = bytearray(height * stride)
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
        out[y * stride:(y + 1) * stride] = cur
        prev = bytes(cur)
    return out


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
    parsed = _png_parse(blob)
    if parsed is None:
        return None
    width, height, nch, raw = parsed
    samples = _png_unfilter(raw, width, height, nch)
    if samples is None:
        return None
    return len(blob), width, height, nch, 8, sum(samples)


def decode_png_pixels(blob: bytes):
    """REAL pixel-decode kernel: the strict `_png_parse` validation plus
    full filter reconstruction, returning the actual pixel ARRAY — a
    numpy uint8 array of shape (height, width, n_channels) in raster
    order (channel semantics per `_PNG_CHANNELS`: 1=gray, 2=gray+alpha,
    3=RGB, 4=RGBA), or None on any malformation (same contract as the
    checksum kernel `decode_png`). This is the PNG leg of the
    perceptual-hash ingest path (`phash_blobs`): PNG is lossless, so a
    PNG rendering pHashes identically to the same pixels in BMP."""
    import numpy as np

    parsed = _png_parse(blob)
    if parsed is None:
        return None
    width, height, nch, raw = parsed
    samples = _png_unfilter(raw, width, height, nch)
    if samples is None:
        return None
    return (
        np.frombuffer(bytes(samples), dtype=np.uint8)
        .reshape(height, width, nch)
    )


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
    return _decode_meta_blobs(
        df, decode_png,
        ["width", "height", "n_channels", "bit_depth", "pixel_sum"],
        PNG_META_SCHEMA, id_col, blob_col,
    )


# ------------------------------------------------------------- GIF (LZW)
# Round 11: the fourth REAL pixel codec. GIF is pure-stdlib feasible
# (LZW is integer bit-twiddling; no codec library needed), genuinely
# common in crawled corpora, and — being palette-indexed and lossless —
# pHashes identically to the same pixels in BMP/PNG, extending the
# cross-codec dedup chain (q158d). First frame only: frame 0 composed
# onto the logical screen over the background color, the still-image
# semantics of an animated GIF's poster frame.

_GIF_MAGICS = (b"GIF87a", b"GIF89a")


def _gif_lzw_encode(data: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW (LSB-first bit packing, variable 3..12-bit
    codes, clear/EOI codes, clear emitted on table overflow at 4096).
    Width-bump convention: both sides track a CODE COUNTER (``track``,
    giflib's RunningCode) advanced per stream code, bumping the width
    when the counter passes 2^w — NOT a table-entry count. The
    distinction matters exactly at the stream tail: the final data code
    and EOI carry no table assignment, so an entry-count convention
    desyncs by one bit when the last assignment lands on a bump
    boundary (found by the hypothesis roundtrip fuzz at ~256-pixel
    high-entropy payloads). The exact mirror of `_gif_lzw_decode`."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1  # next code value to assign == the code counter
    width = min_code_size + 1
    emit(clear, width)
    w = b""
    for byte in data:
        wc = w + bytes([byte])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        # giflib's EGifCompressOutput order: bump check AFTER emitting,
        # BEFORE this emission's assignment (counter still pre-increment)
        if next_code >= (1 << width) and width < 12:
            width += 1
        if next_code < 4096:
            table[wc] = next_code
            next_code += 1
        else:
            # table full: reset (decoder mirrors on seeing the clear)
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        w = bytes([byte])
    if w:
        emit(table[w], width)
        if next_code >= (1 << width) and width < 12:
            width += 1
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_lzw_decode(
    data: bytes, min_code_size: int, max_pixels: int
) -> bytearray | None:
    """Strict GIF LZW decode: None on any malformation — an
    out-of-range code, a stream yielding more than ``max_pixels``
    indices (the allocation-bomb guard: output is bounded BEFORE it is
    built), or a stream ending without EOI after data ran out. Width
    bumps follow the code-counter convention (see `_gif_lzw_encode`):
    ``track`` advances per code READ, so final-code/EOI reads stay in
    lockstep with an encoder whose tail emissions assign nothing."""
    if not 2 <= min_code_size <= 8:
        return None
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    track = eoi + 1  # giflib RunningCode: codes read since last clear
    prev: bytes | None = None
    acc = nbits = pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                return None  # ran out of bits before EOI
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            track = eoi + 1
            prev = None
            continue
        if code == eoi:
            return out
        # post-read counter advance + bump (giflib DGifDecompressInput):
        # ++ then bump when the counter PASSES 2^w — equivalent in
        # stream position to the encoder's pre-assignment >= check
        track += 1
        if track > (1 << width) and width < 12:
            width += 1
        if code < len(table):
            entry = table[code]
            if code >= clear and not entry:
                return None  # the two reserved slots never decode
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            return None
        if len(out) + len(entry) > max_pixels:
            return None
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
        prev = entry



_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def encode_gif_pixels(
    width: int, height: int, gray: bytes, interlace: bool = False
) -> bytes:
    """Pure-Python GIF89a writer with CALLER-SUPPLIED pixel content
    (the GIF sibling of `encode_bmp_pixels` / `encode_png`): ``gray``
    is ``width*height`` luma bytes in raster order, written against a
    256-entry grayscale identity palette (index == luma) and REAL LZW
    compression; ``interlace=True`` stores rows in the four-pass Adam
    order so the decoder's de-interlace path is exercisable."""
    if len(gray) != width * height:
        raise ValueError(
            f"encode_gif_pixels: need {width * height} luma bytes, "
            f"got {len(gray)}"
        )
    px = gray
    if interlace:
        rows = [gray[y * width:(y + 1) * width] for y in range(height)]
        px = b"".join(
            rows[y]
            for start, step in _GIF_INTERLACE_PASSES
            for y in range(start, height, step)
        )
    out = bytearray(b"GIF89a")
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out += bytes((0xF7, 0, 0))  # GCT present, 256 entries; bg 0; no aspect
    out += bytes(v for i in range(256) for v in (i, i, i))
    out += b"\x2c" + bytes(4)  # image descriptor at (0, 0)
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out.append(0x40 if interlace else 0)
    out.append(8)  # LZW minimum code size (256-color palette)
    lzw = _gif_lzw_encode(px, 8)
    for i in range(0, len(lzw), 255):
        block = lzw[i:i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def _gif_parse(blob: bytes, max_frames: int | None = None):
    """Shared strict GIF parser: header + logical screen descriptor +
    global color table, then the block walk collecting frame records —
    image descriptors with their local color tables, concatenated LZW
    sub-block data, and the preceding graphic-control state (delay,
    disposal method, transparency index). Returns
    (width, height, bg, gct, frames) or None on any malformation.

    ``max_frames`` bounds the walk: parsing stops once that many frames
    are collected WITHOUT requiring the trailer (the single-frame
    consumers — pHash ingest — validate through the frames they use,
    the same laziness decode_mp4's box walk applies past moov); with
    ``max_frames=None`` the walk is strict to the 0x3B trailer."""
    import numpy as np

    if len(blob) < 13 or blob[:6] not in _GIF_MAGICS:
        return None
    width = int.from_bytes(blob[6:8], "little")
    height = int.from_bytes(blob[8:10], "little")
    packed, bg = blob[10], blob[11]
    if width == 0 or height == 0 or width * height * 3 > _MAX_DECODE_BYTES:
        return None
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        if pos + 3 * n > len(blob):
            return None
        gct = np.frombuffer(blob, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    frames: list[dict] = []
    delay_cs = 0
    disposal = 0
    transp = None
    while True:
        if pos >= len(blob):
            return None
        block = blob[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:  # extension: label + sub-blocks until 0
            if pos >= len(blob):
                return None
            label = blob[pos]
            pos += 1
            first = True
            while True:
                if pos >= len(blob):
                    return None
                n = blob[pos]
                pos += 1
                if n == 0:
                    break
                if pos + n > len(blob):
                    # truncated sub-block: reject, never index past the
                    # buffer (the GCE reads below index up to pos+3)
                    return None
                if label == 0xF9 and first and n >= 4:
                    # graphic control: packed(disposal/transp flag),
                    # delay (LE centiseconds), transparent index
                    gp = blob[pos]
                    disposal = (gp >> 2) & 7
                    delay_cs = int.from_bytes(blob[pos + 1:pos + 3], "little")
                    transp = blob[pos + 3] if gp & 1 else None
                first = False
                pos += n
            continue
        if block != 0x2C:
            return None
        if pos + 9 > len(blob):
            return None
        left = int.from_bytes(blob[pos:pos + 2], "little")
        top = int.from_bytes(blob[pos + 2:pos + 4], "little")
        iw = int.from_bytes(blob[pos + 4:pos + 6], "little")
        ih = int.from_bytes(blob[pos + 6:pos + 8], "little")
        ipacked = blob[pos + 8]
        pos += 9
        if iw == 0 or ih == 0 or left + iw > width or top + ih > height:
            return None
        lct = None
        if ipacked & 0x80:
            n = 2 << (ipacked & 7)
            if pos + 3 * n > len(blob):
                return None
            lct = np.frombuffer(blob, np.uint8, 3 * n, pos).reshape(n, 3)
            pos += 3 * n
        if pos >= len(blob):
            return None
        min_code = blob[pos]
        pos += 1
        data = bytearray()
        while True:
            if pos >= len(blob):
                return None
            n = blob[pos]
            pos += 1
            if n == 0:
                break
            if pos + n > len(blob):
                return None
            data += blob[pos:pos + n]
            pos += n
        frames.append({
            "left": left, "top": top, "iw": iw, "ih": ih,
            "interlace": bool(ipacked & 0x40), "lct": lct,
            "min_code": min_code, "data": bytes(data),
            "delay_cs": delay_cs, "disposal": disposal, "transp": transp,
        })
        delay_cs, disposal, transp = 0, 0, None
        if max_frames is not None and len(frames) >= max_frames:
            break
    if not frames:
        return None
    return width, height, bg, gct, frames


def _gif_frame_indices(fr: dict):
    """LZW-decode one parsed frame record to its (ih, iw) palette-index
    array (de-interlaced), or None."""
    import numpy as np

    idx = _gif_lzw_decode(fr["data"], fr["min_code"], fr["iw"] * fr["ih"])
    if idx is None or len(idx) != fr["iw"] * fr["ih"]:
        return None
    frame = np.frombuffer(bytes(idx), np.uint8).reshape(fr["ih"], fr["iw"])
    if fr["interlace"]:
        rows = np.empty_like(frame)
        src_row = 0
        for start, step in _GIF_INTERLACE_PASSES:
            n = len(range(start, fr["ih"], step))
            rows[start::step] = frame[src_row:src_row + n]
            src_row += n
        frame = rows
    return frame


def _gif_bg_rgb(bg: int, gct):
    """Background fill color as an RGB triple: the bg index into the
    global table when valid, else black (a GIF without a global table
    has no defined background color)."""
    if gct is not None and bg < len(gct):
        return gct[bg]
    import numpy as np

    return np.zeros(3, dtype=np.uint8)


def decode_gif_frame(blob: bytes, frame_idx: int):
    """REAL animated-GIF frame PIXEL decode: parse frames 0..frame_idx,
    LZW-decode each, and compose them IN SEQUENCE onto the logical
    screen — paint-over for disposal none/do-not-dispose (0/1),
    region-restore-to-background for disposal 2, honoring per-frame
    transparency — returning the (height, width, 3) uint8 array the
    animation shows at that frame, or None (malformed stream, index out
    of range, or disposal 3 restore-to-previous, which is honestly
    rejected rather than approximated). Unlike MP4's chunk tables GIF
    has NO random access — every frame is a delta over the previous
    canvas — so selective decode is inherently O(frame_idx); the cost
    claim for middle-frame sampling is linear in video length, stated
    as such (`gif_anim_phash_blobs`)."""
    import numpy as np

    if frame_idx < 0:
        return None
    parsed = _gif_parse(blob, max_frames=frame_idx + 1)
    if parsed is None:
        return None
    width, height, bg, gct, frames = parsed
    if len(frames) <= frame_idx:
        return None
    bg_rgb = _gif_bg_rgb(bg, gct)
    canvas = np.empty((height, width, 3), dtype=np.uint8)
    canvas[:] = bg_rgb
    for f, fr in enumerate(frames[:frame_idx + 1]):
        pal = fr["lct"] if fr["lct"] is not None else gct
        if pal is None:
            return None
        frame = _gif_frame_indices(fr)
        if frame is None or int(frame.max()) >= len(pal):
            return None
        region = canvas[fr["top"]:fr["top"] + fr["ih"],
                        fr["left"]:fr["left"] + fr["iw"]]
        rgb = pal[frame]
        if fr["transp"] is not None:
            mask = frame != fr["transp"]
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        if f < frame_idx:
            if fr["disposal"] == 2:
                region[:] = bg_rgb
            elif fr["disposal"] == 3:
                return None  # restore-to-previous: reject, don't guess
    return np.ascontiguousarray(canvas)


def decode_gif_pixels(blob: bytes):
    """REAL pixel-decode kernel: strict GIF parse — header + logical
    screen descriptor, global/local color tables, extension-block walk,
    first image descriptor, full LZW decompression, four-pass
    de-interlace — composing frame 0 onto the logical screen over the
    background color and returning a numpy uint8 array of shape
    (height, width, 3) via palette lookup, or None on any malformation
    (bad magic, missing palette, frame outside the screen, bad LZW
    stream, wrong index count, out-of-palette index) so arbitrary bytes
    can never alias in — the same totality contract as the BMP/PNG/JPEG
    kernels. The still-image entry point of the shared parser
    (`_gif_parse`); the animation surface is `decode_gif_frame` /
    `gif_frame_table`."""
    return decode_gif_frame(blob, 0)


def gif_frame_table(blob: bytes):
    """Container-level frame metadata without pixel decode (the GIF
    analog of `mp4_sample_table`): per-frame
    (frame_idx, left, top, width, height, delay_cs, lzw_byte_len)
    tuples from a STRICT full-file parse, or None. The LZW payloads are
    walked (sub-block structure validated) but not decompressed — the
    cheap first pass a video pipeline runs before deciding which frames
    to decode."""
    parsed = _gif_parse(blob)
    if parsed is None:
        return None
    _, _, _, _, frames = parsed
    return [
        (i, fr["left"], fr["top"], fr["iw"], fr["ih"], fr["delay_cs"],
         len(fr["data"]))
        for i, fr in enumerate(frames)
    ]


def encode_gif_anim(
    width: int,
    height: int,
    frames: list[bytes],
    delay_cs: int = 10,
) -> bytes:
    """Animated-GIF writer (the fixture generator for the real
    animation decode path): every frame is a full-screen grayscale
    plane (``width*height`` luma bytes) against the shared 256-entry
    identity palette, preceded by a graphic-control extension carrying
    ``delay_cs`` and disposal do-not-dispose, plus the NETSCAPE2.0
    loop-forever application extension real encoders emit. Real LZW per
    frame."""
    if not frames:
        raise ValueError("encode_gif_anim: need at least one frame")
    for f in frames:
        if len(f) != width * height:
            raise ValueError(
                f"encode_gif_anim: every frame needs {width * height} "
                f"luma bytes, got {len(f)}"
            )
    out = bytearray(b"GIF89a")
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out += bytes((0xF7, 0, 0))
    out += bytes(v for i in range(256) for v in (i, i, i))
    # NETSCAPE2.0 loop extension (loop count 0 = forever)
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for gray in frames:
        out += b"\x21\xf9\x04"          # graphic control, 4 data bytes
        out.append(0x04)                  # disposal 1 (do not dispose)
        out += delay_cs.to_bytes(2, "little")
        out += b"\x00\x00"                # no transparency; terminator
        out += b"\x2c" + bytes(4)
        out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
        out.append(0)
        out.append(8)
        lzw = _gif_lzw_encode(gray, 8)
        for i in range(0, len(lzw), 255):
            block = lzw[i:i + 255]
            out.append(len(block))
            out += block
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def gif_anim_phash_blobs(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """Per-animation perceptual hash over a binary column of GIFs: walk
    the frame table, decode the MIDDLE frame (sequential composition —
    GIF frames are deltas, so unlike MJPEG's chunk-table seek the cost
    is O(n_frames/2) LZW decodes per animation; stated, not hidden),
    collapse to luma, pHash. One Arrow-batched mapInPandas projection —
    (id, n_frames, vhash) is the shuffle key for Hamming-bucketed
    animation near-dup, q174's chain for the GIF container."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, counts, hashes = [], [], []
            for d, b in zip(pdf[id_col], pdf[blob_col]):
                blob = bytes(b)
                table = gif_frame_table(blob)
                if table is None:
                    raise ValueError(
                        "gif_anim_phash_blobs: not a valid GIF"
                    )
                px = decode_gif_frame(blob, len(table) // 2)
                if px is None:
                    raise ValueError(
                        "gif_anim_phash_blobs: undecodable middle frame"
                    )
                ids.append(d)
                counts.append(len(table))
                hashes.append(phash64(_pixels_to_luma(px)))
            yield pd.DataFrame(
                {id_col: ids, "n_frames": counts, "vhash": hashes}
            )

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, blob_col).mapInPandas(
        batches, f"{id_col} {id_type}, n_frames long, vhash long"
    )



# ------------------------------------------------------------ APNG
# Round 11, second animation container: APNG rides the PNG chunk
# stream (acTL/fcTL/fdAT, RFC-pending W3C spec, public) — pure-stdlib
# feasible like GIF, and the still decoders already do the right thing
# (an APNG's IDAT is its default image, so `decode_png_pixels` on an
# APNG blob returns the poster frame). This section adds the ANIMATION
# surface: strict frame parse, per-frame region decode, composition
# with all three dispose ops and both blend ops.


def _apng_parse(blob: bytes):
    """Strict APNG parse: full CRC-verified chunk walk collecting IHDR,
    acTL, and the fcTL/fdAT/IDAT frame structure. Returns
    (width, height, nch, frames) where each frame is a dict
    {x, y, w, h, delay_num, delay_den, dispose, blend, raw} with
    ``raw`` the frame's inflated+validated filtered bytes, or None on
    any malformation: bad CRC, missing/duplicated acTL, non-consecutive
    sequence numbers, frame region outside the canvas, fcTL count !=
    acTL num_frames, undeclared trailing bytes, oversized or lying
    deflate streams (the `_png_parse` bomb bound per frame). A plain
    PNG (no acTL) returns None — it is a still image, not an
    animation."""
    import zlib

    if len(blob) < len(_PNG_SIG) + 12 or blob[:8] != _PNG_SIG:
        return None
    pos, ihdr, actl, seen_end = 8, None, None, False
    # frame assembly state
    fcts: list[dict] = []          # fcTL records in stream order
    datas: list[bytearray] = []    # compressed bytes per fcTL
    idat = bytearray()
    idat_after_fctl = False        # first fcTL appeared before IDAT
    next_seq = 0
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
                return None
            ihdr = data
        elif ctype == b"acTL":
            if actl is not None or size != 8 or idat:
                return None  # one acTL, before the first IDAT
            actl = (
                int.from_bytes(data[0:4], "big"),
                int.from_bytes(data[4:8], "big"),
            )
        elif ctype == b"fcTL":
            if size != 26 or int.from_bytes(data[0:4], "big") != next_seq:
                return None
            next_seq += 1
            fcts.append({
                "w": int.from_bytes(data[4:8], "big"),
                "h": int.from_bytes(data[8:12], "big"),
                "x": int.from_bytes(data[12:16], "big"),
                "y": int.from_bytes(data[16:20], "big"),
                "delay_num": int.from_bytes(data[20:22], "big"),
                "delay_den": int.from_bytes(data[22:24], "big"),
                "dispose": data[24],
                "blend": data[25],
            })
            datas.append(bytearray())
            if not idat:
                idat_after_fctl = True
        elif ctype == b"IDAT":
            if len(fcts) >= 2:
                # spec requires IDAT chunks to be consecutive and belong
                # to frame 0: IDAT after a second fcTL (or after fdAT,
                # which needs that second fcTL) is malformed, not
                # silently unattributed bytes
                return None
            idat += data
            if idat_after_fctl and len(fcts) == 1:
                datas[0] += data  # IDAT is frame 0's data
        elif ctype == b"fdAT":
            if size < 4 or not fcts or len(fcts) < 2:
                return None  # fdAT before the second fcTL is malformed
            if int.from_bytes(data[0:4], "big") != next_seq:
                return None
            next_seq += 1
            datas[-1] += data[4:]
        elif ctype == b"IEND":
            seen_end = end + 4 == len(blob)
            break
        pos = end + 4
    if ihdr is None or actl is None or not idat or not seen_end:
        return None
    if not idat_after_fctl:
        return None  # default image outside the animation: unsupported
    if actl[0] != len(fcts) or not fcts:
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
    if width * height * max(nch, 3) > _MAX_DECODE_BYTES:
        return None
    frames = []
    for fc, cdata in zip(fcts, datas):
        w, h = fc["w"], fc["h"]
        if (
            w == 0 or h == 0
            or fc["x"] + w > width or fc["y"] + h > height
        ):
            return None
        expected = h * (w * nch + 1)
        if expected > _MAX_DECODE_BYTES:
            return None
        d = zlib.decompressobj()
        try:
            raw = d.decompress(bytes(cdata), expected + 1)
        except zlib.error:
            return None
        if (
            len(raw) != expected
            or not d.eof or d.unused_data or d.unconsumed_tail
        ):
            return None
        frames.append({**fc, "raw": raw})
    return width, height, nch, frames


def apng_frame_table(blob: bytes):
    """Per-frame APNG metadata (the `gif_frame_table` /
    `mp4_sample_table` analog): (frame_idx, x, y, w, h, delay_num,
    delay_den, dispose_op, blend_op) from the strict full parse, or
    None. The frame deflate streams are validated (inflated against
    their declared geometry) but no filter walk / composition runs."""
    parsed = _apng_parse(blob)
    if parsed is None:
        return None
    _, _, _, frames = parsed
    return [
        (i, f["x"], f["y"], f["w"], f["h"], f["delay_num"],
         f["delay_den"], f["dispose"], f["blend"])
        for i, f in enumerate(frames)
    ]


def decode_apng_frame(blob: bytes, frame_idx: int):
    """REAL APNG frame PIXEL decode: compose frames 0..frame_idx onto
    the canvas per the W3C APNG spec — regions unfilter through the
    shared PNG filter walk, dispose ops none(0) / background(1,
    region to fully-transparent) / previous(2, region restored to its
    pre-render content; on frame 0 treated as background, per spec),
    blend ops source(0, overwrite) and over(1, Porter-Duff — computed
    in float64 and rounded half-up, a fixed deterministic convention;
    channels without alpha make over == source). Returns the
    (height, width, nch) uint8 canvas at that frame, or None. Like
    GIF, APNG frames are deltas — selective decode is inherently
    O(frame_idx), stated where the cost claim matters
    (`apng_phash_blobs`)."""
    import numpy as np

    if frame_idx < 0:
        return None
    parsed = _apng_parse(blob)
    if parsed is None:
        return None
    width, height, nch, frames = parsed
    if frame_idx >= len(frames):
        return None
    canvas = np.zeros((height, width, nch), dtype=np.uint8)
    for i, fr in enumerate(frames[:frame_idx + 1]):
        samples = _png_unfilter(fr["raw"], fr["w"], fr["h"], nch)
        if samples is None:
            return None
        patch = (
            np.frombuffer(bytes(samples), dtype=np.uint8)
            .reshape(fr["h"], fr["w"], nch)
        )
        y0, y1 = fr["y"], fr["y"] + fr["h"]
        x0, x1 = fr["x"], fr["x"] + fr["w"]
        region = canvas[y0:y1, x0:x1]
        saved = region.copy() if fr["dispose"] == 2 else None
        has_alpha = nch in (2, 4)
        if fr["blend"] == 1 and has_alpha:
            fg = patch.astype(np.float64)
            bg = region.astype(np.float64)
            af = fg[:, :, -1:] / 255.0
            ab = bg[:, :, -1:] / 255.0
            ao = af + ab * (1.0 - af)
            safe = np.where(ao == 0.0, 1.0, ao)
            color = (
                fg[:, :, :-1] * af + bg[:, :, :-1] * ab * (1.0 - af)
            ) / safe
            out = np.concatenate([color, ao * 255.0], axis=2)
            region[:] = np.floor(out + 0.5).astype(np.uint8)
        elif fr["blend"] in (0, 1):
            region[:] = patch
        else:
            return None  # unknown blend op
        if i < frame_idx:
            if fr["dispose"] == 1 or (fr["dispose"] == 2 and i == 0):
                region[:] = 0
            elif fr["dispose"] == 2:
                region[:] = saved
            elif fr["dispose"] != 0:
                return None  # unknown dispose op
    return np.ascontiguousarray(canvas)


def encode_apng(
    width: int,
    height: int,
    frames: list[bytes],
    n_channels: int = 1,
    delay_num: int = 4,
    delay_den: int = 100,
) -> bytes:
    """APNG writer (fixture generator for the animation decode path):
    full-screen frames against the shared IHDR geometry, blend source,
    dispose none; frame 0 rides IDAT (fcTL first, per spec), later
    frames ride sequence-numbered fdAT chunks; every frame's scanlines
    rotate through all five PNG filters (the `encode_png` idiom)."""
    import zlib

    if not frames:
        raise ValueError("encode_apng: need at least one frame")
    for f in frames:
        if len(f) != width * height * n_channels:
            raise ValueError(
                f"encode_apng: every frame needs "
                f"{width * height * n_channels} bytes, got {len(f)}"
            )
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[n_channels]
    ihdr = (
        width.to_bytes(4, "big") + height.to_bytes(4, "big")
        + bytes((8, color_type, 0, 0, 0))
    )
    out = bytearray(_PNG_SIG)
    out += _png_chunk(b"IHDR", ihdr)
    out += _png_chunk(
        b"acTL", len(frames).to_bytes(4, "big") + (0).to_bytes(4, "big")
    )
    seq = 0
    stride = width * n_channels

    def filtered(pixels: bytes) -> bytes:
        rows = bytearray()
        prev = bytes(stride)
        for y in range(height):
            row = pixels[y * stride:(y + 1) * stride]
            ft = y % 5
            rows.append(ft)
            if ft == 0:
                rows += row
            elif ft == 1:
                rows += bytes(
                    (row[i] - (row[i - n_channels] if i >= n_channels else 0))
                    & 0xFF
                    for i in range(stride)
                )
            elif ft == 2:
                rows += bytes((row[i] - prev[i]) & 0xFF for i in range(stride))
            elif ft == 3:
                rows += bytes(
                    (row[i] - (
                        ((row[i - n_channels] if i >= n_channels else 0)
                         + prev[i]) >> 1
                    )) & 0xFF
                    for i in range(stride)
                )
            else:
                rows += bytes(
                    (row[i] - _paeth(
                        row[i - n_channels] if i >= n_channels else 0,
                        prev[i],
                        prev[i - n_channels] if i >= n_channels else 0,
                    )) & 0xFF
                    for i in range(stride)
                )
            prev = row
        return zlib.compress(bytes(rows), 6)

    for fi, gray in enumerate(frames):
        fctl = (
            seq.to_bytes(4, "big")
            + width.to_bytes(4, "big") + height.to_bytes(4, "big")
            + (0).to_bytes(4, "big") + (0).to_bytes(4, "big")
            + delay_num.to_bytes(2, "big") + delay_den.to_bytes(2, "big")
            + bytes((0, 0))  # dispose none, blend source
        )
        out += _png_chunk(b"fcTL", fctl)
        seq += 1
        comp = filtered(gray)
        if fi == 0:
            out += _png_chunk(b"IDAT", comp)
        else:
            out += _png_chunk(b"fdAT", seq.to_bytes(4, "big") + comp)
            seq += 1
    out += _png_chunk(b"IEND", b"")
    return bytes(out)


def apng_phash_blobs(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """Per-animation perceptual hash over a binary column of APNGs:
    middle-frame decode (sequential composition, O(n_frames/2) per
    animation — stated, the GIF note applies), luma, pHash. One
    Arrow-batched mapInPandas projection; (id, n_frames, vhash) is the
    shuffle key for Hamming-bucketed animation near-dup."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, counts, hashes = [], [], []
            for d, b in zip(pdf[id_col], pdf[blob_col]):
                blob = bytes(b)
                table = apng_frame_table(blob)
                if table is None:
                    raise ValueError("apng_phash_blobs: not a valid APNG")
                px = decode_apng_frame(blob, len(table) // 2)
                if px is None:
                    raise ValueError(
                        "apng_phash_blobs: undecodable middle frame"
                    )
                ids.append(d)
                counts.append(len(table))
                hashes.append(phash64(_pixels_to_luma(px)))
            yield pd.DataFrame(
                {id_col: ids, "n_frames": counts, "vhash": hashes}
            )

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, blob_col).mapInPandas(
        batches, f"{id_col} {id_type}, n_frames long, vhash long"
    )


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


def decode_gif(blob: bytes) -> tuple[int, int, int, int] | None:
    """GIF metadata kernel: (byte_len, width, height, 3) for a
    well-formed GIF, None otherwise. Runs the FULL pixel decode
    (`decode_gif_pixels`) rather than a header peek — the same
    strictness contract as `decode_png` (which inflates the whole IDAT
    stream): dimensions are only reported for payloads the pixel path
    actually accepts, so text bytes can never alias in."""
    px = decode_gif_pixels(blob)
    if px is None:
        return None
    return len(blob), px.shape[1], px.shape[0], 3


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


# ------------------------------------------------------- ISO-BMFF (MP4)
def _mp4_box(btype: bytes, payload: bytes) -> bytes:
    return (8 + len(payload)).to_bytes(4, "big") + btype + payload


def _mp4_full(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _mp4_box(btype, bytes([version]) + flags.to_bytes(3, "big") + payload)


_MP4_MATRIX = b"".join(
    v.to_bytes(4, "big")
    for v in (0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
)


def encode_mp4(
    n_frames: int,
    frame_delta: int = 40,
    timescale: int = 1000,
    width: int = 640,
    height: int = 480,
    frames: list[bytes] | None = None,
    codec: bytes = b"mp4v",
) -> bytes:
    """Pure-Python minimal ISO-BMFF (MP4) writer — fixture generator for
    the real video-metadata decode path (no media library). One video
    track, uniform frame timing (stts), one chunk (stsc/stco), and an
    mdat whose payload is exactly the declared sample bytes laid out
    back-to-back. Duration = n_frames * frame_delta ticks.

    Default shape (``frames=None``): per-frame sizes 16+(i%7) (stsz)
    with a deterministic byte pattern — the metadata fixtures
    (q40e/q40g) depend on these exact bytes. With ``frames`` given,
    each list element becomes a REAL sample payload (sizes from the
    payloads, ``n_frames`` must match) and ``codec`` sets the stsd
    sample-entry fourcc — pass JPEG blobs with ``codec=b"jpeg"`` for a
    genuine Motion-JPEG track (the intra-frame video family whose
    frame pixel decode needs no codec library)."""
    if n_frames <= 0 or frame_delta <= 0 or timescale <= 0:
        raise ValueError("n_frames, frame_delta, timescale must be positive")
    if frames is not None and len(frames) != n_frames:
        raise ValueError("frames length must equal n_frames")
    if len(codec) != 4:
        raise ValueError("codec must be a 4-byte fourcc")
    duration = n_frames * frame_delta
    if frames is not None:
        sizes = [len(f) for f in frames]
    else:
        sizes = [16 + (i % 7) for i in range(n_frames)]

    mvhd = _mp4_full(
        b"mvhd", 0, 0,
        (0).to_bytes(4, "big") * 2                     # creation/modification
        + timescale.to_bytes(4, "big")
        + duration.to_bytes(4, "big")
        + (0x00010000).to_bytes(4, "big")              # rate 1.0
        + (0x0100).to_bytes(2, "big")                  # volume 1.0
        + bytes(10)                                    # reserved
        + _MP4_MATRIX
        + bytes(24)                                    # pre_defined
        + (2).to_bytes(4, "big"),                      # next_track_ID
    )
    tkhd = _mp4_full(
        b"tkhd", 0, 7,                  # enabled | in_movie | in_preview
        (0).to_bytes(4, "big") * 2
        + (1).to_bytes(4, "big")                       # track_ID
        + bytes(4)                                     # reserved
        + duration.to_bytes(4, "big")
        + bytes(8)                                     # reserved
        + bytes(4)                                     # layer + alternate_group
        + bytes(4)                                     # volume + reserved
        + _MP4_MATRIX
        + (width << 16).to_bytes(4, "big")             # 16.16 fixed-point
        + (height << 16).to_bytes(4, "big"),
    )
    mdhd = _mp4_full(
        b"mdhd", 0, 0,
        (0).to_bytes(4, "big") * 2
        + timescale.to_bytes(4, "big")
        + duration.to_bytes(4, "big")
        + (0x55C4).to_bytes(2, "big")                  # language 'und'
        + bytes(2),
    )
    hdlr = _mp4_full(b"hdlr", 0, 0, bytes(4) + b"vide" + bytes(12) + b"video\x00")
    stsd = _mp4_full(
        b"stsd", 0, 0,
        (1).to_bytes(4, "big")
        + _mp4_box(
            codec,
            bytes(6) + (1).to_bytes(2, "big")   # reserved + data_ref_index
            + bytes(16)                         # pre_defined / reserved
            + width.to_bytes(2, "big")
            + height.to_bytes(2, "big")
            + (0x00480000).to_bytes(4, "big") * 2  # 72 dpi h/v
            + bytes(4)                          # reserved
            + (1).to_bytes(2, "big")            # frame_count
            + bytes(32)                         # compressorname
            + (24).to_bytes(2, "big")           # depth
            + (0xFFFF).to_bytes(2, "big"),      # pre_defined -1
        ),
    )
    stts = _mp4_full(
        b"stts", 0, 0,
        (1).to_bytes(4, "big")
        + n_frames.to_bytes(4, "big")
        + frame_delta.to_bytes(4, "big"),
    )
    stsz = _mp4_full(
        b"stsz", 0, 0,
        (0).to_bytes(4, "big")                  # sample_size 0 = per-entry
        + n_frames.to_bytes(4, "big")
        + b"".join(s.to_bytes(4, "big") for s in sizes),
    )
    stsc = _mp4_full(
        b"stsc", 0, 0,
        (1).to_bytes(4, "big")
        + (1).to_bytes(4, "big")                # first_chunk
        + n_frames.to_bytes(4, "big")           # samples_per_chunk
        + (1).to_bytes(4, "big"),               # sample_description_index
    )
    # stco's chunk offset is file-absolute, and moov's size depends on the
    # fixed-size stco (20 bytes) itself — compute the layout directly.
    stbl_partial = stsd + stts + stsc + stsz
    moov_payload_len = (
        len(mvhd)
        + 8 + len(tkhd)                               # trak header + tkhd
        + 8                                           # mdia header
        + len(mdhd) + len(hdlr)
        + 8                                           # minf header
        + 8 + len(stbl_partial) + 20                  # stbl incl. stco
    )
    ftyp = _mp4_box(b"ftyp", b"isom" + (0).to_bytes(4, "big") + b"isom")
    chunk_off = len(ftyp) + 8 + moov_payload_len + 8  # + moov, mdat headers
    stco = _mp4_full(
        b"stco", 0, 0,
        (1).to_bytes(4, "big") + chunk_off.to_bytes(4, "big"),
    )
    stbl = _mp4_box(b"stbl", stbl_partial + stco)
    minf = _mp4_box(b"minf", stbl)
    mdia = _mp4_box(b"mdia", mdhd + hdlr + minf)
    trak = _mp4_box(b"trak", tkhd + mdia)
    moov = _mp4_box(b"moov", mvhd + trak)
    if frames is not None:
        payload = b"".join(frames)
    else:
        payload = b"".join(
            bytes((j * 11 + i) % 256 for j in range(s))
            for i, s in enumerate(sizes)
        )
    return ftyp + moov + _mp4_box(b"mdat", payload)


def _mp4_walk(buf: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for the boxes tiling
    buf[start:end]; raise ValueError if they don't tile exactly."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated box header")
        size = int.from_bytes(buf[pos:pos + 4], "big")
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("truncated largesize")
            size = int.from_bytes(buf[pos + 8:pos + 16], "big")
            hdr = 16
        else:
            hdr = 8
        if size < hdr or pos + size > end:
            raise ValueError("box size out of bounds")
        yield buf[pos + 4:pos + 8], pos + hdr, pos + size
        pos += size
    if pos != end:
        raise ValueError("boxes do not tile container")


def _mp4_find(buf: bytes, start: int, end: int, btype: bytes):
    for t, s, e in _mp4_walk(buf, start, end):
        if t == btype:
            return s, e
    return None


def _parse_mp4(blob: bytes) -> dict | None:
    """Shared ISO-BMFF walker: validates the box structure and returns the
    movie header fields plus the first track's raw sample tables. Strict —
    boxes must exactly tile the file and every container, ftyp must come
    first, stts and stsz must agree on the sample count, and the declared
    sample bytes must fit inside mdat — so arbitrary bytes cannot alias
    into the real path."""
    try:
        top = list(_mp4_walk(blob, 0, len(blob)))
        if not top or top[0][0] != b"ftyp":
            return None
        moov = next(((s, e) for t, s, e in top if t == b"moov"), None)
        mdat = next(((s, e) for t, s, e in top if t == b"mdat"), None)
        if moov is None or mdat is None:
            return None
        mvhd = _mp4_find(blob, moov[0], moov[1], b"mvhd")
        trak = _mp4_find(blob, moov[0], moov[1], b"trak")
        if mvhd is None or trak is None:
            return None
        s, e = mvhd
        version = blob[s]
        if version == 0 and e - s >= 24:
            timescale = int.from_bytes(blob[s + 12:s + 16], "big")
            duration = int.from_bytes(blob[s + 16:s + 20], "big")
        elif version == 1 and e - s >= 36:
            timescale = int.from_bytes(blob[s + 20:s + 24], "big")
            duration = int.from_bytes(blob[s + 24:s + 32], "big")
        else:
            return None
        if timescale == 0:
            return None
        tkhd = _mp4_find(blob, trak[0], trak[1], b"tkhd")
        mdia = _mp4_find(blob, trak[0], trak[1], b"mdia")
        if tkhd is None or mdia is None:
            return None
        s, e = tkhd
        # width/height are the last 8 bytes of tkhd in both versions
        if blob[s] not in (0, 1) or e - s < (84 if blob[s] == 0 else 96):
            return None
        width = int.from_bytes(blob[e - 8:e - 4], "big") >> 16
        height = int.from_bytes(blob[e - 4:e], "big") >> 16
        minf = _mp4_find(blob, mdia[0], mdia[1], b"minf")
        stbl = minf and _mp4_find(blob, minf[0], minf[1], b"stbl")
        if not stbl:
            return None
        stts = _mp4_find(blob, stbl[0], stbl[1], b"stts")
        stsz = _mp4_find(blob, stbl[0], stbl[1], b"stsz")
        stsc = _mp4_find(blob, stbl[0], stbl[1], b"stsc")
        stco = _mp4_find(blob, stbl[0], stbl[1], b"stco")
        stsd = _mp4_find(blob, stbl[0], stbl[1], b"stsd")
        # sample-entry fourcc (the track codec): stsd payload is
        # version/flags(4) + entry_count(4) + first entry box
        # [size(4) + fourcc(4) + ...]
        codec = None
        if stsd is not None and stsd[1] - stsd[0] >= 16:
            s = stsd[0]
            if blob[s] == 0 and int.from_bytes(blob[s + 4:s + 8], "big") >= 1:
                codec = blob[s + 12:s + 16]
        if stts is None or stsz is None:
            return None
        s, e = stts
        if blob[s] != 0:
            return None
        n_entries = int.from_bytes(blob[s + 4:s + 8], "big")
        if e - s != 8 + 8 * n_entries:
            return None
        timing = [
            (
                int.from_bytes(blob[s + 8 + 8 * i:s + 12 + 8 * i], "big"),
                int.from_bytes(blob[s + 12 + 8 * i:s + 16 + 8 * i], "big"),
            )
            for i in range(n_entries)
        ]
        n_frames = sum(c for c, _ in timing)
        s, e = stsz
        if blob[s] != 0:
            return None
        fixed = int.from_bytes(blob[s + 4:s + 8], "big")
        count = int.from_bytes(blob[s + 8:s + 12], "big")
        if count != n_frames:
            return None
        if fixed:
            if e - s != 12:
                return None
            sizes = [fixed] * count
        else:
            if e - s != 12 + 4 * count:
                return None
            sizes = [
                int.from_bytes(blob[s + 12 + 4 * i:s + 16 + 4 * i], "big")
                for i in range(count)
            ]
        if sum(sizes) > mdat[1] - mdat[0]:
            return None
        chunk_offsets = stsc_entries = None
        if stco is not None:
            s, e = stco
            if blob[s] != 0:
                return None
            n = int.from_bytes(blob[s + 4:s + 8], "big")
            if e - s != 8 + 4 * n:
                return None
            chunk_offsets = [
                int.from_bytes(blob[s + 8 + 4 * i:s + 12 + 4 * i], "big")
                for i in range(n)
            ]
        if stsc is not None:
            s, e = stsc
            if blob[s] != 0:
                return None
            n = int.from_bytes(blob[s + 4:s + 8], "big")
            if e - s != 8 + 12 * n:
                return None
            stsc_entries = [
                (
                    int.from_bytes(blob[s + 8 + 12 * i:s + 12 + 12 * i], "big"),
                    int.from_bytes(blob[s + 12 + 12 * i:s + 16 + 12 * i], "big"),
                )
                for i in range(n)
            ]
        return {
            "timescale": timescale,
            "duration": duration,
            "width": width,
            "height": height,
            "timing": timing,
            "sizes": sizes,
            "mdat": mdat,
            "chunk_offsets": chunk_offsets,
            "stsc": stsc_entries,
            "codec": codec,
        }
    except ValueError:
        return None


def decode_mp4(blob: bytes) -> tuple[int, int, int, int, int, int] | None:
    """REAL video-metadata decode kernel: ISO-BMFF box walk — ftyp/moov/
    mvhd/trak/tkhd and the stts/stsz sample tables — pure arithmetic, no
    media library (the metadata stage of a video pipeline needs timing
    and size tables, not decoded pictures). Returns (byte_len,
    duration_ms, width, height, n_frames, sample_bytes), or None when the
    payload is not well-formed ISO-BMFF (see `_parse_mp4` for the strict
    validation that keeps arbitrary bytes out)."""
    meta = _parse_mp4(blob)
    if meta is None:
        return None
    return (
        len(blob),
        meta["duration"] * 1000 // meta["timescale"],
        meta["width"],
        meta["height"],
        len(meta["sizes"]),
        sum(meta["sizes"]),
    )


def mp4_sample_table(
    blob: bytes, meta: dict | None = None
) -> list[tuple[int, int, int, int]] | None:
    """REAL frame-sample kernel: walk stts/stsz/stsc/stco to produce one
    (frame_idx, frame_off, frame_bytes, t_ms) row per video sample —
    exactly what a keyframe-seeking extractor reads before touching any
    codec. ``frame_off`` is relative to the mdat payload (file-absolute
    stco offsets minus the located mdat start) so downstream arithmetic
    is container-layout-independent. Returns None for non-MP4 payloads or
    files whose chunk tables are absent/inconsistent. Pass ``meta`` (a
    `_parse_mp4` result for the SAME blob) to skip the re-parse in hot
    loops that already walked the boxes."""
    if meta is None:
        meta = _parse_mp4(blob)
    if meta is None or not meta["chunk_offsets"] or not meta["stsc"]:
        return None
    sizes = meta["sizes"]
    chunk_offsets, stsc = meta["chunk_offsets"], meta["stsc"]
    mdat_start, mdat_end = meta["mdat"]
    # samples-per-chunk for each chunk, from the stsc run-length map
    if stsc[0][0] != 1:
        return None
    spc = []
    for i, (first, per) in enumerate(stsc):
        last = stsc[i + 1][0] - 1 if i + 1 < len(stsc) else len(chunk_offsets)
        if first > last:
            return None
        spc.extend([per] * (last - first + 1))
    if sum(spc) != len(sizes):
        return None
    # absolute offset per sample: chunk base + running size within chunk
    offs = []
    k = 0
    for ci, base in enumerate(chunk_offsets):
        pos = base
        for _ in range(spc[ci]):
            offs.append(pos)
            pos += sizes[k]
            k += 1
    # timestamps from the stts run-length deltas
    ts, t = [], 0
    for count, delta in meta["timing"]:
        for _ in range(count):
            ts.append(t)
            t += delta
    scale = meta["timescale"]
    rows = []
    for i, (off, size) in enumerate(zip(offs, sizes)):
        if off < mdat_start or off + size > mdat_end:
            return None  # sample claims bytes outside mdat
        rows.append((i, off - mdat_start, size, ts[i] * 1000 // scale))
    return rows


MP4_META_SCHEMA = (
    "doc_id long, duration_ms long, width long, height long, "
    "n_frames long, sample_bytes long"
)


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


def decode_video_blobs(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """Decode MP4 payloads to typed metadata via mapInPandas — the video
    twin of `decode_png_blobs`. Non-MP4 payloads yield NULL metadata.
    byte_len is intentionally NOT part of the output: box-layout byte
    counts are not arithmetic-derivable (same reasoning that excluded
    PNG's deflate length)."""
    return _decode_meta_blobs(
        df, decode_mp4,
        ["duration_ms", "width", "height", "n_frames", "sample_bytes"],
        MP4_META_SCHEMA, id_col, blob_col,
    )


MP4_FRAME_SCHEMA = (
    "doc_id long, frame_idx long, frame_off long, frame_bytes long, t_ms long"
)


def sample_mp4_frames(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """REAL frame-sample operator: 1:N explode of each MP4 payload into
    its sample-table rows via `mp4_sample_table` (the non-stub successor
    of `sample_frames` for ISO-BMFF payloads — real offsets, sizes, and
    timestamps, no codec needed). Non-MP4 payloads contribute no rows.
    At scale this stage is decode-bound on its INPUT, so partition on the
    blobs, never on the exploded output."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, offs, sizes, tss = [], [], [], [], []
            for doc, b in zip(pdf[id_col], pdf[blob_col]):
                rows = mp4_sample_table(b)
                for i, off, size, tms in rows or ():
                    ids.append(doc)
                    idxs.append(i)
                    offs.append(off)
                    sizes.append(size)
                    tss.append(tms)
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_off": offs,
                 "frame_bytes": sizes, "t_ms": tss}
            )

    return df.select(id_col, blob_col).mapInPandas(batches, MP4_FRAME_SCHEMA)


# --------------------------------------------------------- baseline JPEG
def _jpeg_zigzag() -> list[int]:
    """Natural index (8*row+col) of the i-th coefficient in zigzag scan,
    generated from the diagonal traversal rule rather than hardcoded."""
    pts = [(r, c) for r in range(8) for c in range(8)]
    pts.sort(key=lambda p: (p[0] + p[1],
                            p[0] if (p[0] + p[1]) % 2 else -p[0]))
    return [8 * r + c for r, c in pts]


_JPEG_ZIGZAG = _jpeg_zigzag()
# Custom (spec-legal) huffman tables declared via DHT and decoded
# generically: DC categories 0..7 as eight 4-bit codes (0000..0111 — the
# all-ones code is never assigned), AC with the single EOB symbol as the
# 2-bit code 00. The decoder reads whatever tables the file declares.
_JPEG_DC_BITS = [0, 0, 0, 8] + [0] * 12
_JPEG_DC_VALS = list(range(8))
_JPEG_AC_BITS = [0, 1] + [0] * 14
_JPEG_AC_VALS = [0x00]
_JPEG_QTAB = [16] * 64  # flat quant table (DQT carries zigzag order)


class _JpegBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def flush(self) -> bytes:
        while self.n:
            self.write(1, 1)  # pad with 1s per T.81 F.1.2.3
        return bytes(self.out)


def _jpeg_canonical_codes(bits: list[int], vals: list[int]) -> dict:
    """symbol -> (code, length) canonical huffman assignment (T.81 C.2)."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _jpeg_seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def _jpeg_validate_fixture(
    width: int, height: int, block_values: list[int], n_components: int,
    subsampling: str,
) -> tuple[bool, int, int, int]:
    """Shared parameter contract of the baseline AND progressive fixture
    encoders (one home — q40i pins their pixel equality, so the accepted
    input space must never diverge). Returns (is420, wb, hb, nb)."""
    if width % 8 or height % 8 or width <= 0 or height <= 0:
        raise ValueError("width/height must be positive multiples of 8")
    if n_components not in (1, 3):
        raise ValueError("n_components must be 1 (gray) or 3 (YCbCr)")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    is420 = n_components == 3 and subsampling == "420"
    if is420 and (width % 16 or height % 16):
        raise ValueError("4:2:0 needs width/height multiples of 16")
    wb, hb = width // 8, height // 8
    nb = wb * hb
    if len(block_values) != nb:
        raise ValueError(f"need {nb} block values, got {len(block_values)}")
    if any(v % 2 or not 0 <= v <= 255 for v in block_values):
        raise ValueError("block values must be even bytes")
    return is420, wb, hb, nb


def _jpeg_mcu_order(
    block_values: list[int], wb: int, hb: int, n_components: int,
    is420: bool,
):
    """Interleaved MCU emit order shared by the baseline and progressive
    encoders — the ONE home for the 4:2:0 2x2-Y traversal (the q40i
    oracle relies on baseline<->progressive pixel equality, so the emit
    orders must never diverge). Yields (component_index, y_block_value),
    value None for the neutral-chroma blocks."""
    if is420:
        # 4 Y blocks (2x2, raster within the MCU), one Cb, one Cr; the
        # Y DC predictor chains in EMIT order
        for myi in range(hb // 2):
            for mxi in range(wb // 2):
                for v in range(2):
                    for hh in range(2):
                        yield 0, block_values[(myi * 2 + v) * wb
                                              + mxi * 2 + hh]
                yield 1, None
                yield 2, None
    else:
        for v in block_values:
            yield 0, v
            if n_components == 3:
                yield 1, None
                yield 2, None


def encode_jpeg(
    width: int, height: int, block_values: list[int], n_components: int = 1,
    subsampling: str = "444",
) -> bytes:
    """Pure-Python baseline-JPEG writer for BLOCK-UNIFORM images (fixture
    generator for the real decode path — no image library). Block b of
    the row-major 8x8 grid is filled with block_values[b], which must be
    EVEN so the quantized DC (uniform block: FDCT DC = 8*(v-128), all AC
    zero; quant 16) is exact and the decoded image reproduces the values
    bit-for-bit despite the lossy pipeline — that's what keeps the
    oracle checksum closed-form. DC *differences* across blocks still
    exercise huffman magnitude categories up to 7. With n_components=3
    the file is YCbCr with NEUTRAL chroma (Cb=Cr=128, quantized DC
    exactly 0), so the decoded RGB equals the Y values on all three
    channels and pixel_sum is exactly 3x the grayscale sum — the color
    path stays closed-form while exercising interleaved MCUs and
    per-component DC predictors. ``subsampling`` picks the color MCU
    layout: "444" (one block per component per MCU) or "420" (Y at
    2x2 blocks per MCU, chroma at 1x1 — the dominant real-corpus
    format; width/height must be multiples of 16 so every MCU is full,
    and neutral chroma makes the construction independent of the
    decoder's upsampling filter, keeping it closed-form)."""
    is420, wb, hb, nb = _jpeg_validate_fixture(
        width, height, block_values, n_components, subsampling
    )
    dc_codes = _jpeg_canonical_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_canonical_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    w = _JpegBitWriter()
    pred = 0
    eob = ac_codes[0x00]
    zero_dc = dc_codes[0]

    def put_y(v: int) -> None:
        nonlocal pred
        qdc = (v - 128) // 2
        diff = qdc - pred
        pred = qdc
        t = abs(diff).bit_length()
        code, length = dc_codes[t]
        w.write(code, length)
        if t:
            w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        w.write(*eob)

    for comp, v in _jpeg_mcu_order(block_values, wb, hb, n_components,
                                   is420):
        if comp == 0:
            put_y(v)
        else:
            # neutral chroma block (quantized DC 0, predictor stays
            # 0 -> category-0 code + EOB)
            w.write(*zero_dc)
            w.write(*eob)
    dqt = _jpeg_seg(0xDB, bytes([0x00]) + bytes(_JPEG_QTAB))
    y_samp = 0x22 if is420 else 0x11
    comp_specs = bytes([1, y_samp, 0]) + b"".join(
        bytes([cid, 0x11, 0]) for cid in range(2, n_components + 1)
    )
    sof0 = _jpeg_seg(
        0xC0,
        bytes([8])
        + height.to_bytes(2, "big") + width.to_bytes(2, "big")
        + bytes([n_components]) + comp_specs,
    )
    dht = (
        _jpeg_seg(0xC4, bytes([0x00]) + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS))
        + _jpeg_seg(0xC4, bytes([0x10]) + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS))
    )
    scan_specs = b"".join(
        bytes([cid, 0x00]) for cid in range(1, n_components + 1)
    )
    sos = _jpeg_seg(0xDA, bytes([n_components]) + scan_specs + bytes([0, 63, 0]))
    return b"\xff\xd8" + dqt + sof0 + dht + sos + w.flush() + b"\xff\xd9"


# Fixed refinement-scan AC symbol superset: new-coefficient symbols
# (run, 1), ZRL, and every EOBn — data-independent by construction.
_JPEG_AC_REFINE_SYMS = (
    {0xF0} | {r << 4 for r in range(15)} | {(r << 4) | 1 for r in range(16)}
)


def _jpeg_dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    return _jpeg_seg(
        0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    )


def _jpeg_sos(scan_comps: list[tuple[int, int, int]],
              ss: int, se: int, ah: int, al: int) -> bytes:
    body = bytes([len(scan_comps)])
    for cid, dc_id, ac_id in scan_comps:
        body += bytes([cid, (dc_id << 4) | ac_id])
    return _jpeg_seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))


def _jpeg_write_dc_first(
    w: _JpegBitWriter, dc_codes: dict, seq: list[tuple[int, int]], al: int
) -> None:
    """Progressive DC first scan: point-transformed quantized DC values
    (arithmetic >> Al), predictor-differenced per component, in the
    given (component, value) emit order."""
    preds: dict[int, int] = {}
    for ci, qdc in seq:
        v = qdc >> al
        diff = v - preds.get(ci, 0)
        preds[ci] = v
        s, x = _jpeg_mag_bits(diff)
        w.write(*dc_codes[s])
        if s:
            w.write(x, s)


def encode_jpeg_progressive(
    width: int, height: int, block_values: list[int], n_components: int = 1,
    subsampling: str = "444",
) -> bytes:
    """PROGRESSIVE (SOF2) twin of `encode_jpeg` — same block-uniform
    closed-form contract (even values, flat quant 16, neutral chroma),
    emitted as a real multi-scan progressive file: an interleaved DC
    first scan at point transform Al=1, a DC refinement scan (raw bit
    per block), and per-component spectral-selection AC scans
    (1..5 at Al=1, 6..63, then the 1..5 refinement) — which for the
    all-zero-AC fixture are pure cross-block EOB runs, the dominant
    symbol of real progressive files. Decoded pixels are identical to
    the baseline encoding of the same values, so the q40-family
    closed-form oracles carry over unchanged."""
    is420, wb, hb, nb = _jpeg_validate_fixture(
        width, height, block_values, n_components, subsampling
    )
    dc_codes = _jpeg_canonical_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    eob_bits, eob_vals = _jpeg_flat_table({r << 4 for r in range(15)})
    ac_codes = _jpeg_canonical_codes(eob_bits, eob_vals)

    # DC emit order: the SHARED interleaved MCU traversal (matches the
    # decoder's scan order; grayscale's 1x1 MCU degenerates to raster)
    seq: list[tuple[int, int]] = [
        (comp, 0 if v is None else (v - 128) // 2)
        for comp, v in _jpeg_mcu_order(block_values, wb, hb,
                                       n_components, is420)
    ]

    w1 = _JpegBitWriter()
    _jpeg_write_dc_first(w1, dc_codes, seq, al=1)
    w2 = _JpegBitWriter()
    for _, qdc in seq:
        w2.write(qdc & 1, 1)

    # per-component block counts for the AC scans (component raster)
    if n_components == 1:
        comp_nb = [nb]
    elif is420:
        comp_nb = [nb, nb // 4, nb // 4]
    else:
        comp_nb = [nb, nb, nb]

    dqt = _jpeg_seg(0xDB, bytes([0x00]) + bytes(_JPEG_QTAB))
    y_samp = 0x22 if is420 else 0x11
    comp_specs = bytes([1, y_samp, 0]) + b"".join(
        bytes([cid, 0x11, 0]) for cid in range(2, n_components + 1)
    )
    sof2 = _jpeg_seg(
        0xC2,
        bytes([8])
        + height.to_bytes(2, "big") + width.to_bytes(2, "big")
        + bytes([n_components]) + comp_specs,
    )
    dht = (
        _jpeg_dht(0, 0, _JPEG_DC_BITS, _JPEG_DC_VALS)
        + _jpeg_dht(1, 0, eob_bits, eob_vals)
    )
    all_ids = [(cid, 0, 0) for cid in range(1, n_components + 1)]
    out = b"\xff\xd8" + dqt + sof2 + dht
    out += _jpeg_sos(all_ids, 0, 0, 0, 1) + w1.flush()
    out += _jpeg_sos(all_ids, 0, 0, 1, 0) + w2.flush()
    for cid in range(1, n_components + 1):
        for ss, se, ah, al in ((1, 5, 0, 1), (6, 63, 0, 0), (1, 5, 1, 0)):
            ws = _JpegBitWriter()
            band = [[0] * (se - ss + 1)] * comp_nb[cid - 1]
            if ah == 0:
                _jpeg_write_ac_first(ws, ac_codes, band, al)
            else:
                _jpeg_write_ac_refine(ws, ac_codes, band, al)
            out += _jpeg_sos([(cid, 0, 0)], ss, se, ah, al) + ws.flush()
    return out + b"\xff\xd9"


def _encode_jpeg_coefs(
    width: int, height: int, blocks: list[list[int]],
    progressive: bool = False,
) -> bytes:
    """Grayscale JPEG from ARBITRARY per-block quantized coefficients
    (zigzag order, 64 per block, block raster) — the coefficient-level
    fixture generator behind the baseline<->progressive equivalence
    tests: both encodings of the same coefficient grid must decode to
    identical pixel arrays, which exercises every progressive decode
    path (DC first/refine, AC first magnitudes, EOB runs, ZRL, and the
    refinement scan's correction bits for nonzero-history coefficients)
    against the already-proven baseline chain. Flat quant table 16;
    values must keep huffman categories <= 11 (|coef| < 1024)."""
    wb, hb = width // 8, height // 8
    if width % 8 or height % 8 or len(blocks) != wb * hb:
        raise ValueError("bad geometry")
    if any(len(b) != 64 for b in blocks):
        raise ValueError("blocks must carry 64 zigzag coefficients")
    if any(abs(c) > 1023 for b in blocks for c in b):
        raise ValueError("|coefficient| must be < 1024")
    dqt = _jpeg_seg(0xDB, bytes([0x00]) + bytes(_JPEG_QTAB))
    sof = _jpeg_seg(
        0xC2 if progressive else 0xC0,
        bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0]),
    )
    head = b"\xff\xd8" + dqt + sof
    if not progressive:
        dc_syms, ac_syms = set(), {0x00}
        pred = 0
        for b in blocks:
            dc_syms.add(_jpeg_mag_bits(b[0] - pred)[0])
            pred = b[0]
            r = 0
            for c in b[1:]:
                if c == 0:
                    r += 1
                    continue
                while r > 15:
                    ac_syms.add(0xF0)
                    r -= 16
                ac_syms.add((r << 4) | _jpeg_mag_bits(c)[0])
                r = 0
        dc_bits, dc_vals = _jpeg_flat_table(dc_syms)
        ac_bits, ac_vals = _jpeg_flat_table(ac_syms)
        dcc = _jpeg_canonical_codes(dc_bits, dc_vals)
        acc = _jpeg_canonical_codes(ac_bits, ac_vals)
        w = _JpegBitWriter()
        pred = 0
        for b in blocks:
            s, x = _jpeg_mag_bits(b[0] - pred)
            pred = b[0]
            w.write(*dcc[s])
            if s:
                w.write(x, s)
            r = 0
            for c in b[1:]:
                if c == 0:
                    r += 1
                    continue
                while r > 15:
                    w.write(*acc[0xF0])
                    r -= 16
                s, x = _jpeg_mag_bits(c)
                w.write(*acc[(r << 4) | s])
                w.write(x, s)
                r = 0
            if r:
                w.write(*acc[0x00])  # EOB
        return (
            head
            + _jpeg_dht(0, 0, dc_bits, dc_vals)
            + _jpeg_dht(1, 0, ac_bits, ac_vals)
            + _jpeg_sos([(1, 0, 0)], 0, 63, 0, 0)
            + w.flush() + b"\xff\xd9"
        )
    # progressive: DC at Al=1 + refine; two spectral bands, each at
    # Al=1 then its refinement scan
    dc_syms = set()
    pred = 0
    for b in blocks:
        dc_syms.add(_jpeg_mag_bits((b[0] >> 1) - pred)[0])
        pred = b[0] >> 1
    dc_bits, dc_vals = _jpeg_flat_table(dc_syms)
    dcc = _jpeg_canonical_codes(dc_bits, dc_vals)
    out = head + _jpeg_dht(0, 0, dc_bits, dc_vals)
    w1 = _JpegBitWriter()
    _jpeg_write_dc_first(w1, dcc, [(0, b[0]) for b in blocks], al=1)
    out += _jpeg_sos([(1, 0, 0)], 0, 0, 0, 1) + w1.flush()
    w2 = _JpegBitWriter()
    for b in blocks:
        w2.write(b[0] & 1, 1)
    out += _jpeg_sos([(1, 0, 0)], 0, 0, 1, 0) + w2.flush()
    rf_bits, rf_vals = _jpeg_flat_table(_JPEG_AC_REFINE_SYMS)
    rfc = _jpeg_canonical_codes(rf_bits, rf_vals)
    for ss, se in ((1, 5), (6, 63)):
        band = [b[ss:se + 1] for b in blocks]
        fs_bits, fs_vals = _jpeg_flat_table(
            _jpeg_ac_first_symbols(band, al=1)
        )
        fsc = _jpeg_canonical_codes(fs_bits, fs_vals)
        wf = _JpegBitWriter()
        _jpeg_write_ac_first(wf, fsc, band, al=1)
        out += (
            _jpeg_dht(1, 0, fs_bits, fs_vals)
            + _jpeg_sos([(1, 0, 0)], ss, se, 0, 1) + wf.flush()
        )
        wr = _JpegBitWriter()
        _jpeg_write_ac_refine(wr, rfc, band, al=0)
        out += (
            _jpeg_dht(1, 0, rf_bits, rf_vals)
            + _jpeg_sos([(1, 0, 0)], ss, se, 1, 0) + wr.flush()
        )
    return out + b"\xff\xd9"


def _jpeg_flat_table(symbols) -> tuple[list[int], list[int]]:
    """Canonical huffman declaration assigning every distinct symbol a
    fixed-length code (smallest L with count <= 2^L - 1, keeping the
    all-ones code unassigned per T.81 C.2's recommendation) — spec-legal
    and trivially collision-free, for the fixture encoders."""
    syms = sorted(set(symbols))
    lng = max(2, len(syms).bit_length())
    if len(syms) > (1 << lng) - 1:
        lng += 1
    bits = [0] * 16
    bits[lng - 1] = len(syms)
    return bits, syms


def _jpeg_mag_bits(v: int) -> tuple[int, int]:
    """(category, extension-bit value) for a signed magnitude per T.81
    F.1.2.1.3: s = bit length of |v|; negatives send v + 2^s - 1."""
    s = abs(v).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


class _JpegEobBuffer:
    """Encoder-side EOB-run + buffered-correction-bit state for one
    progressive AC scan (T.81 G.1.2.2/G.1.2.3): EOB runs accumulate
    across blocks (flushed as EOBn symbol + extension bits + any
    correction bits buffered inside the run) and cap at 32767."""

    def __init__(self, w: _JpegBitWriter, ac_codes: dict):
        self.w, self.ac = w, ac_codes
        self.eobrun = 0
        self.bits: list[int] = []

    def flush(self) -> None:
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            self.w.write(*self.ac[r << 4])
            if r:
                self.w.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for b in self.bits:
            self.w.write(b, 1)
        self.bits = []

    def add_block(self, correction_bits: list[int]) -> None:
        self.eobrun += 1
        self.bits.extend(correction_bits)
        if self.eobrun == 32767:
            self.flush()


def _jpeg_ac_first_symbols(band_vals: list[list[int]], al: int) -> set[int]:
    """AC symbol set an Ah=0 progressive scan will emit (for DHT)."""
    syms = {0x00, 0xE0}  # EOBn seeds; include common run symbols lazily
    for vals in band_vals:
        r = 0
        for v in vals:
            t = abs(v) >> al
            if t == 0:
                r += 1
                continue
            while r > 15:
                syms.add(0xF0)
                r -= 16
            syms.add((r << 4) | t.bit_length())
            r = 0
    syms.update((r << 4) for r in range(15))  # all EOBn run symbols
    return syms


def _jpeg_write_ac_first(
    w: _JpegBitWriter, ac_codes: dict, band_vals: list[list[int]], al: int
) -> None:
    """Encode one progressive AC first scan (Ah=0): point-transformed
    magnitudes with run-length coding and cross-block EOB runs."""
    eob = _JpegEobBuffer(w, ac_codes)
    for vals in band_vals:
        r = 0
        wrote = False
        for v in vals:
            t = abs(v) >> al
            if t == 0:
                r += 1
                continue
            eob.flush()
            wrote = True
            while r > 15:
                w.write(*ac_codes[0xF0])  # ZRL
                r -= 16
            tv = t if v >= 0 else -t
            s, x = _jpeg_mag_bits(tv)
            w.write(*ac_codes[(r << 4) | s])
            w.write(x, s)
            r = 0
        if r > 0 or not wrote:
            eob.add_block([])
    eob.flush()


def _jpeg_write_ac_refine(
    w: _JpegBitWriter, ac_codes: dict, band_vals: list[list[int]], al: int
) -> None:
    """Encode one progressive AC refinement scan (Ah=Al+1 -> Al): newly
    nonzero coefficients as run/+-1 symbols, correction bits for
    already-nonzero ones buffered and emitted after the covering symbol
    (T.81 G.1.2.3 — the libjpeg-style buffered-bit discipline)."""
    eob = _JpegEobBuffer(w, ac_codes)
    for vals in band_vals:
        absv = [abs(v) >> al for v in vals]
        # index of the last NEWLY nonzero coefficient: zero runs beyond
        # it fold into the EOB run instead of ZRLs (T.81 G.1.2.3)
        last_new = max(
            (k for k, t in enumerate(absv) if t == 1), default=-1
        )
        r = 0
        br: list[int] = []
        for k, v in enumerate(vals):
            t = absv[k]
            if t == 0:
                r += 1
                continue
            # flush ZRLs at EVERY nonzero-precision position (correction
            # or new) so each ZRL carries exactly the correction bits its
            # 16-zero sweep passes on the decoder side
            while r > 15 and k <= last_new:
                eob.flush()
                w.write(*ac_codes[0xF0])
                r -= 16
                for b in br:
                    w.write(b, 1)
                br = []
            if t > 1:
                br.append(t & 1)
                continue
            # newly nonzero (+-1 at this precision)
            eob.flush()
            w.write(*ac_codes[(r << 4) | 1])
            w.write(1 if v >= 0 else 0, 1)
            for b in br:
                w.write(b, 1)
            br = []
            r = 0
        # trailing zero run and correction bits past the last new
        # coefficient fold into the cross-block EOB run
        if r > 0 or br:
            eob.add_block(br)
    eob.flush()


class _JpegBitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; any real marker
    inside the stream is an error (restart intervals are rejected at DRI)."""

    def __init__(self, buf: bytes, pos: int):
        self.buf, self.pos = buf, pos
        self.acc, self.n = 0, 0

    def _fill(self) -> None:
        if self.pos >= len(self.buf):
            raise ValueError("entropy stream truncated")
        b = self.buf[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.buf) or self.buf[self.pos + 1] != 0x00:
                raise ValueError("marker inside entropy stream")
            self.pos += 2  # stuffed literal 0xFF
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _jpeg_build_decode(bits: list[int], vals: list[int]) -> dict:
    """(length, code) -> symbol map from a DHT declaration."""
    table, code, k = {}, 0, 0
    if sum(bits) != len(vals) or not vals:
        raise ValueError("bad huffman table")
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        if code > (1 << length):
            raise ValueError("over-subscribed huffman table")
        code <<= 1
    return table


def _jpeg_huff_decode(reader: _JpegBitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | reader.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code")


def _jpeg_extend(v: int, t: int) -> int:
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _jpeg_idct_basis():
    """8x8 IDCT basis B[u, x] = c(u) cos((2x+1)u*pi/16), built lazily so
    module import stays numpy-free until a decode actually runs."""
    import math

    import numpy as np

    return np.array(
        [
            [
                math.cos((2 * x + 1) * u * math.pi / 16)
                * (math.sqrt(0.5) if u == 0 else 1.0)
                for x in range(8)
            ]
            for u in range(8)
        ]
    )


def _jpeg_decode_dc_scan(reader, blocks, comp_state, ah, al):
    """DC scan over ``blocks`` (list of (ci, row) in scan order). First
    pass (Ah=0): huffman category + extend, predictor-chained, stored
    shifted left by the point transform. Refinement (Ah>0): one raw bit
    per block ORed into bit Al (Python's arbitrary-precision two's
    complement makes ``coef | (1 << al)`` correct for negatives too,
    T.81 G.1.2.1)."""
    if ah == 0:
        preds = {ci: 0 for ci, _ in blocks}
        for ci, row in blocks:
            dct = comp_state[ci]["dc"]
            t = _jpeg_huff_decode(reader, dct)
            if t > 11:
                raise ValueError("DC category > 11")
            preds[ci] += _jpeg_extend(reader.bits(t), t) if t else 0
            comp_state[ci]["coefs"][row][0] = preds[ci] << al
    else:
        for ci, row in blocks:
            if reader.bit():
                comp_state[ci]["coefs"][row][0] |= 1 << al


def _jpeg_decode_ac_first(reader, rows, coefs, act, ss, se, al):
    """Progressive AC first scan (Ah=0) for one component's blocks in
    ``rows`` order: run-length/magnitude pairs within the Ss..Se band,
    EOBn symbols (s=0, r<15) start an EOB run of 2^r - 1 + r extra bits
    more blocks, ZRL (r=15, s=0) skips 16 zeros (T.81 G.1.2.2)."""
    eobrun = 0
    for row in rows:
        if eobrun > 0:
            eobrun -= 1
            continue
        blk = coefs[row]
        k = ss
        while k <= se:
            rs = _jpeg_huff_decode(reader, act)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r == 15:
                    k += 16  # ZRL
                    if k > se + 1:
                        # a ZRL landing past the band end is the same
                        # malformed-stream class as a coefficient run
                        # overrunning it (k == se+1 just exhausts the
                        # band) — reject, don't silently accept
                        raise ValueError("AC ZRL past band end")
                    continue
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.bits(r)
                break
            k += r
            if k > se:
                raise ValueError("AC run past band end")
            blk[_JPEG_ZIGZAG[k]] = _jpeg_extend(reader.bits(s), s) << al
            k += 1


def _jpeg_ac_correct(reader, blk, zz, k, se, al, skip):
    """Refinement positioning sweep (T.81 G.1.2.3): advance from k,
    reading a correction bit for every nonzero-history coefficient, and
    counting down ``skip`` zero-history positions (the run length of the
    current symbol; None = run to the band end). Returns the index where
    the new coefficient (if any) lands."""
    while k <= se:
        idx = zz[k]
        if blk[idx] != 0:
            if reader.bit():
                if blk[idx] > 0:
                    if not blk[idx] & (1 << al):
                        blk[idx] += 1 << al
                else:
                    if not (-blk[idx]) & (1 << al):
                        blk[idx] -= 1 << al
        else:
            if skip is not None:
                if skip == 0:
                    return k
                skip -= 1
        k += 1
    if skip not in (None, 0):
        raise ValueError("refinement run past band end")
    return k


def _jpeg_decode_ac_refine(reader, rows, coefs, act, ss, se, al):
    """Progressive AC refinement scan (Ah>0) for one component: each
    symbol either places a new +-1<<Al coefficient after a run of
    zero-history positions, skips 16 zero-history positions (ZRL), or
    starts an EOB run — and every nonzero-history coefficient passed on
    the way (including in EOB-run blocks) reads a correction bit
    (T.81 G.1.2.3)."""
    zz = _JPEG_ZIGZAG
    eobrun = 0
    for row in rows:
        blk = coefs[row]
        if eobrun > 0:
            eobrun -= 1
            _jpeg_ac_correct(reader, blk, zz, ss, se, al, None)
            continue
        k = ss
        while k <= se:
            rs = _jpeg_huff_decode(reader, act)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r != 15:
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += reader.bits(r)
                    _jpeg_ac_correct(reader, blk, zz, k, se, al, None)
                    break
                # ZRL: 15 zero-history skips + the break position itself
                # (unwritten) = 16 zeros, exactly libjpeg's r-- / break
                k = _jpeg_ac_correct(reader, blk, zz, k, se, al, 15) + 1
                continue
            if s != 1:
                raise ValueError("refinement magnitude must be 1")
            newval = (1 << al) if reader.bit() else -(1 << al)
            k = _jpeg_ac_correct(reader, blk, zz, k, se, al, r)
            if k > se:
                raise ValueError("AC refine run past band end")
            blk[zz[k]] = newval
            k += 1


def _jpeg_decode_pixels(blob: bytes):
    """Shared JPEG decode core (validation + entropy decode + IDCT +
    color conversion — contract documented on `decode_jpeg`): baseline
    (SOF0, one interleaved scan) AND progressive (SOF2, multi-scan —
    spectral selection + successive approximation, DC and AC first and
    refinement passes, EOB-run coding). Returns a numpy uint8 pixel
    array of shape (height, width, n_components) in raster order
    (grayscale stays a 1-channel plane; color is converted YCbCr->RGB),
    or None outside the decode envelope."""
    import numpy as np

    try:
        if len(blob) < 4 or blob[:2] != b"\xff\xd8":
            return None
        pos = 2
        qtabs: dict[int, list[int]] = {}
        dc_tabs: dict[int, dict] = {}
        ac_tabs: dict[int, dict] = {}
        sof = None
        progressive = False
        geo = None  # (hmax, vmax, mx, my) once SOF is seen
        comp_coefs: list[list[list[int]]] = []  # QUANTIZED, per component
        # per-component progression: DC first-pass seen, per-coefficient
        # completeness is the file's responsibility (undecoded
        # coefficients legitimately render as 0 mid-progression, but we
        # require EVERY declared scan to decode cleanly and at least the
        # DC first pass per component — a truncated file fails the EOI
        # check instead of half-rendering)
        dc_done: set[int] = set()
        any_scan = False
        while True:
            if pos + 2 > len(blob) or blob[pos] != 0xFF:
                return None
            marker = blob[pos + 1]
            pos += 2
            if marker == 0xFF:  # fill byte
                pos -= 1
                continue
            if marker == 0xD9:  # EOI
                if not any_scan or pos != len(blob):
                    return None
                break
            if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # standalone
                continue
            if pos + 2 > len(blob):
                return None
            seglen = int.from_bytes(blob[pos:pos + 2], "big")
            if seglen < 2 or pos + seglen > len(blob):
                return None
            body = blob[pos + 2:pos + seglen]
            pos += seglen
            if marker == 0xDB:  # DQT
                i = 0
                while i < len(body):
                    pq, tq = body[i] >> 4, body[i] & 15
                    if pq != 0 or i + 65 > len(body):
                        return None  # 16-bit tables rejected
                    qtabs[tq] = list(body[i + 1:i + 65])
                    i += 65
            elif marker == 0xC4:  # DHT (possibly several tables)
                i = 0
                while i + 17 <= len(body):
                    tc, th = body[i] >> 4, body[i] & 15
                    bits = list(body[i + 1:i + 17])
                    n = sum(bits)
                    if i + 17 + n > len(body):
                        return None
                    tab = _jpeg_build_decode(bits, list(body[i + 17:i + 17 + n]))
                    (dc_tabs if tc == 0 else ac_tabs)[th] = tab
                    i += 17 + n
                if i != len(body):
                    return None
            elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
                if sof is not None or len(body) < 6 or body[0] != 8:
                    return None
                progressive = marker == 0xC2
                h = int.from_bytes(body[1:3], "big")
                w = int.from_bytes(body[3:5], "big")
                ncomp = body[5]
                if ncomp not in (1, 3) or len(body) != 6 + 3 * ncomp:
                    return None
                comps = []  # (component id, (quant id, h_i, v_i)), SOF order
                for ci in range(ncomp):
                    cid, samp, tq = body[6 + 3 * ci:9 + 3 * ci]
                    hi, vi = samp >> 4, samp & 15
                    # sampling factors 1 or 2 cover 4:4:4, 4:2:2, 4:4:0
                    # and 4:2:0 — everything a real corpus has; a
                    # single-component image is non-interleaved by spec,
                    # so its factors must be 1x1
                    if hi not in (1, 2) or vi not in (1, 2) or (
                        ncomp == 1 and samp != 0x11
                    ):
                        return None
                    comps.append((cid, (tq, hi, vi)))
                if len({cid for cid, _ in comps}) != ncomp or w == 0 or h == 0:
                    return None
                sof = (w, h, comps)
                # MCU geometry: an MCU covers 8*hmax x 8*vmax pixels;
                # component i contributes h_i x v_i blocks per MCU
                # (JPEG Annex A.2)
                hmax = max(c[1][1] for c in comps)
                vmax = max(c[1][2] for c in comps)
                mx = (w + 8 * hmax - 1) // (8 * hmax)
                my = (h + 8 * vmax - 1) // (8 * vmax)
                geo = (hmax, vmax, mx, my)
                blocks_total = sum(
                    my * vi * mx * hi for _, (_, hi, vi) in comps
                )
                # the downstream coefficient matrix is float64 (8
                # bytes/sample): bound the SOF-declared size BEFORE
                # allocating so a crafted header cannot pick the
                # allocation (MemoryError would kill the task, not fall
                # back to NULL)
                if blocks_total * 64 > _MAX_DECODE_BYTES // 8:
                    return None
                comp_coefs = [
                    [[0] * 64 for _ in range(my * vi * mx * hi)]
                    for _, (_, hi, vi) in comps
                ]
            elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None  # extended/arithmetic/lossless SOFs rejected
            elif marker == 0xDD:  # DRI
                if body != b"\x00\x00":
                    return None  # restart intervals rejected
            elif marker == 0xDA:  # SOS
                if sof is None or len(body) < 1:
                    return None
                if any_scan and not progressive:
                    return None  # baseline is single-scan
                ns = body[0]
                if not 1 <= ns <= len(sof[2]) or len(body) != 4 + 2 * ns:
                    return None
                ss_, se_, aa = body[-3], body[-2], body[-1]
                ah, al = aa >> 4, aa & 15
                by_id = dict(sof[2])
                ids = [c[0] for c in sof[2]]
                scan = []  # (ci in SOF order, dc table id, ac table id)
                for si in range(ns):
                    sel, tabs = body[1 + 2 * si], body[2 + 2 * si]
                    if sel not in by_id:
                        return None
                    scan.append((ids.index(sel), tabs >> 4, tabs & 15))
                if len({s[0] for s in scan}) != ns:
                    return None
                hmax, vmax, mx, my = geo
                w, h, comps = sof
                if progressive:
                    if al > 13 or (ah and ah != al + 1):
                        return None
                    if ss_ == 0:
                        if se_ != 0:
                            return None  # DC scan is exactly the DC band
                    elif not (1 <= ss_ <= se_ <= 63 and ns == 1):
                        return None  # AC scans are single-component
                    if ss_ > 0 and scan[0][0] not in dc_done:
                        return None  # AC before that component's DC
                else:
                    if (ss_, se_, ah, al) != (0, 63, 0, 0) or ns != len(comps):
                        return None
                reader = _JpegBitReader(blob, pos)
                comp_state = {}
                for ci, dc_id, ac_id in scan:
                    need_dc = ss_ == 0 and ah == 0
                    need_ac = not progressive or ss_ > 0
                    if (need_dc and dc_id not in dc_tabs) or (
                        need_ac and ac_id not in ac_tabs
                    ):
                        return None
                    comp_state[ci] = {
                        "coefs": comp_coefs[ci],
                        "dc": dc_tabs.get(dc_id),
                        "ac": ac_tabs.get(ac_id),
                    }
                if not progressive:
                    # baseline: one interleaved pass doing DC+AC per block
                    preds = [0] * len(comps)
                    for mi in range(my * mx):
                        myi, mxi = divmod(mi, mx)
                        for ci, dc_id, ac_id in scan:
                            _, hi, vi = comps[ci][1]
                            st = comp_state[ci]
                            for v in range(vi):
                                for hh in range(hi):
                                    row = (myi * vi + v) * (mx * hi) + (
                                        mxi * hi + hh
                                    )
                                    blk = st["coefs"][row]
                                    t = _jpeg_huff_decode(reader, st["dc"])
                                    if t > 11:
                                        return None
                                    preds[ci] += (
                                        _jpeg_extend(reader.bits(t), t)
                                        if t else 0
                                    )
                                    blk[0] = preds[ci]
                                    k = 1
                                    while k < 64:
                                        rs = _jpeg_huff_decode(
                                            reader, st["ac"]
                                        )
                                        if rs == 0x00:
                                            break  # EOB
                                        r, s = rs >> 4, rs & 15
                                        if s == 0:
                                            if r != 15:
                                                return None
                                            k += 16  # ZRL
                                            continue
                                        k += r
                                        if k > 63:
                                            return None
                                        blk[_JPEG_ZIGZAG[k]] = _jpeg_extend(
                                            reader.bits(s), s
                                        )
                                        k += 1
                elif ss_ == 0:
                    # progressive DC scan: interleaved MCU order when
                    # ns > 1, else the sole component's own block raster
                    # (ceil(cw/8) x ceil(ch/8) — NOT the padded grid)
                    blocks = []
                    if ns > 1:
                        for mi in range(my * mx):
                            myi, mxi = divmod(mi, mx)
                            for ci, _, _ in scan:
                                _, hi, vi = comps[ci][1]
                                for v in range(vi):
                                    for hh in range(hi):
                                        blocks.append((ci, (
                                            (myi * vi + v) * (mx * hi)
                                            + mxi * hi + hh
                                        )))
                    else:
                        ci = scan[0][0]
                        _, hi, vi = comps[ci][1]
                        cbw = ((w * hi + hmax - 1) // hmax + 7) // 8
                        cbh = ((h * vi + vmax - 1) // vmax + 7) // 8
                        for by in range(cbh):
                            for bx in range(cbw):
                                blocks.append((ci, by * (mx * hi) + bx))
                    _jpeg_decode_dc_scan(reader, blocks, comp_state, ah, al)
                    if ah == 0:
                        dc_done.update(ci for ci, _, _ in scan)
                else:
                    # progressive AC scan: single component, its own
                    # block raster over the component's true dims
                    ci = scan[0][0]
                    _, hi, vi = comps[ci][1]
                    cbw = ((w * hi + hmax - 1) // hmax + 7) // 8
                    cbh = ((h * vi + vmax - 1) // vmax + 7) // 8
                    rows = [
                        by * (mx * hi) + bx
                        for by in range(cbh) for bx in range(cbw)
                    ]
                    fn = (
                        _jpeg_decode_ac_first if ah == 0
                        else _jpeg_decode_ac_refine
                    )
                    fn(
                        reader, rows, comp_state[ci]["coefs"],
                        comp_state[ci]["ac"], ss_, se_, al,
                    )
                pos = reader.pos
                any_scan = True
            # APPn / COM: skipped
        w, h, comps = sof
        ncomp = len(comps)
        if len(dc_done) != ncomp and progressive:
            return None
        hmax, vmax, mx, my = geo
        scan_geo = []
        for _, (tq, hi, vi) in comps:
            if tq not in qtabs:
                return None
            scan_geo.append((qtabs[tq], hi, vi))
        basis = _jpeg_idct_basis()
        zz_nat = np.array(_JPEG_ZIGZAG)
        planes = []
        for ci, (q, hi, vi) in enumerate(scan_geo):
            # dequantize: DQT tables are declared in ZIGZAG order, the
            # coefficient grids store natural order — scatter q first
            qnat = np.empty(64)
            qnat[zz_nat] = np.asarray(q, dtype=float)
            deq = np.asarray(comp_coefs[ci], dtype=float) * qnat
            # batched separable IDCT: f = (1/4) * B^T F B per block
            f = np.einsum(
                "yu,nuv,vx->nyx", basis.T,
                deq.reshape(-1, 8, 8), basis,
            ) / 4.0
            plane = np.clip(np.rint(f) + 128, 0, 255)
            byc, bxc = my * vi, mx * hi
            plane = (
                plane.reshape(byc, bxc, 8, 8)
                .transpose(0, 2, 1, 3)
                .reshape(byc * 8, bxc * 8)
            )
            # crop to the component's true dims (ceil(dim * f_i / f_max),
            # JPEG A.1.1), then upsample subsampled chroma to full
            # resolution by sample replication (box upsample)
            ch = (h * vi + vmax - 1) // vmax
            cw = (w * hi + hmax - 1) // hmax
            plane = plane[:ch, :cw]
            if vi != vmax or hi != hmax:
                ys = (np.arange(h) * vi) // vmax
                xs = (np.arange(w) * hi) // hmax
                plane = plane[np.ix_(ys, xs)]
            planes.append(plane)
        if ncomp == 1:
            px = planes[0][:, :, None]
        else:
            # JPEG YCbCr -> full-range RGB (BT.601)
            y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
            r = np.clip(np.rint(y + 1.402 * cr), 0, 255)
            g = np.clip(np.rint(y - 0.344136 * cb - 0.714136 * cr), 0, 255)
            b = np.clip(np.rint(y + 1.772 * cb), 0, 255)
            px = np.stack([r, g, b], axis=2)
        return px.astype(np.uint8)
    except ValueError:
        return None


def decode_jpeg(blob: bytes) -> tuple[int, int, int, int, int] | None:
    """REAL image decode kernel: full JPEG read — marker walk,
    DQT/DHT/SOF/SOS parse, huffman entropy decode driven by the
    DECLARED tables (generic run-length AC path, per-component table
    selection and DC predictors, interleaved MCUs), dequantize,
    numpy-BATCHED float 2-D IDCT over all blocks at once, level shift,
    and for color the YCbCr->RGB conversion — no image library. Supports
    BASELINE (SOF0, one interleaved scan) and PROGRESSIVE (SOF2,
    multi-scan — spectral selection, successive approximation with DC
    and AC first/refinement passes, cross-block EOB-run coding,
    non-interleaved per-component AC scan geometry; r10), for grayscale
    and YCbCr color at sampling factors 1-2 per axis: 4:4:4 AND the
    chroma-subsampled layouts real corpora are full of (4:2:0 — the
    dominant camera/web format — 4:2:2, 4:4:0), with subsampled chroma
    box-upsampled by sample replication. Returns (byte_len, width,
    height, n_components, pixel_sum) where pixel_sum is the sum of
    every reconstructed sample (R,G,B for color — a content checksum
    only a correct huffman+IDCT chain reproduces), or None for anything
    outside that envelope — restart intervals, 16-bit quant tables,
    sampling factors > 2, arithmetic/lossless/hierarchical SOFs, and
    truncated or lying segments are all honestly rejected rather than
    half-decoded."""
    px = _jpeg_decode_pixels(blob)
    if px is None:
        return None
    h, w, ncomp = px.shape
    return len(blob), w, h, ncomp, int(px.sum(dtype="int64"))


def decode_jpeg_pixels(blob: bytes):
    """REAL pixel-decode kernel: the full `decode_jpeg` validation and
    reconstruction chain, returning the actual pixel ARRAY — a numpy
    uint8 array of shape (height, width, n_components) in raster order
    (1 channel grayscale, 3 channels RGB after YCbCr conversion), or
    None outside the baseline+progressive envelope. This is the JPEG leg of the
    perceptual-hash ingest path (`phash_blobs`); pHash's
    brightness/contrast invariance composes with JPEG's quantization
    exactly when the encoded content is quant-exact (see
    `encode_jpeg`), and within a few Hamming bits otherwise."""
    return _jpeg_decode_pixels(blob)


JPEG_META_SCHEMA = (
    "doc_id long, width long, height long, n_components long, pixel_sum long"
)


def decode_jpeg_blobs(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """Decode baseline-JPEG payloads to typed metadata + pixel checksum
    via mapInPandas — the lossy-compressed twin of `decode_png_blobs`.
    Non-JPEG (or non-baseline) payloads yield NULL metadata (explicit
    unknown, never fake numbers). byte_len is intentionally NOT part of
    the output: entropy-coded lengths are not arithmetic-derivable (same
    reasoning that excluded PNG's deflate length)."""
    return _decode_meta_blobs(
        df, decode_jpeg,
        ["width", "height", "n_components", "pixel_sum"],
        JPEG_META_SCHEMA, id_col, blob_col,
    )


def synth_jpeg420_blobs(
    df: DataFrame, id_col: str = "doc_id", len_col: str = "n_chars",
    encoder=None,
) -> DataFrame:
    """4:2:0 JPEG fixture-synthesis stage — the ONE home for the
    derivation arithmetic q40h's oracle restates (and q40i's reuses
    verbatim via the ``encoder`` parameter): EVEN Y-block grid
    wb = 2*(1+len%8) by hb = 2*(1+|id|%6) (full 16x16 MCUs), base =
    |id|%114, block b filled with the even value 28 + 2*((base+b)%114),
    rendered as YCbCr 4:2:0 with neutral chroma so the decode stays
    closed-form through the chroma upsample. ``encoder`` defaults to
    baseline `encode_jpeg`; pass `encode_jpeg_progressive` for the same
    content as a real SOF2 multi-scan file. Arrow-batched mapInPandas;
    blobs never leave the executors."""
    enc = encoder if encoder is not None else encode_jpeg

    def make(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = []
            for d, n in zip(pdf[id_col], pdf[len_col]):
                d, n = abs(int(d)), int(n)
                wb, hb = 2 * (1 + n % 8), 2 * (1 + d % 6)
                base = d % 114
                vals = [28 + 2 * ((base + b) % 114) for b in range(wb * hb)]
                blobs.append(
                    enc(
                        8 * wb, 8 * hb, vals, n_components=3,
                        subsampling="420",
                    )
                )
            yield pd.DataFrame({id_col: pdf[id_col], "blob": blobs})

    return df.select(id_col, len_col).mapInPandas(
        make, f"{id_col} long, blob binary"
    )


def synth_mp4_blobs(
    df: DataFrame, id_col: str = "doc_id", len_col: str = "n_chars"
) -> DataFrame:
    """MP4 fixture-synthesis stage — the ONE home for the derivation
    arithmetic q40e/q40g's oracles restate (and the stress shapes
    reuse): n_frames = 1 + len%240 at 40 ticks/frame on a 1000
    timescale, track dims 16*(1+|id|%80) x 16*(1+|id|%45), per-frame
    sizes 16+(i%7). Arrow-batched mapInPandas; blobs never leave the
    executors."""

    def make(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = [
                encode_mp4(
                    1 + int(n) % 240, 40, 1000,
                    16 * (1 + abs(int(d)) % 80),
                    16 * (1 + abs(int(d)) % 45),
                )
                for d, n in zip(pdf[id_col], pdf[len_col])
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "blob": blobs})

    return df.select(id_col, len_col).mapInPandas(
        make, f"{id_col} long, blob binary"
    )


def synth_jpeg_progressive_blobs(
    df: DataFrame, id_col: str = "doc_id", len_col: str = "n_chars"
) -> DataFrame:
    """PROGRESSIVE 4:2:0 JPEG fixture-synthesis stage: q40h's exact
    derivation arithmetic (even Y-block grid wb = 2*(1+len%8) by
    hb = 2*(1+|id|%6), base = |id|%114, even block values, neutral
    chroma) rendered through `encode_jpeg_progressive` — a real SOF2
    multi-scan file (interleaved DC first scan at Al=1, DC refinement,
    per-component spectral-selection AC scans with cross-block EOB
    runs), so q40i's oracle can reuse q40h's closed form verbatim.
    Delegates to `synth_jpeg420_blobs` — the arithmetic has ONE home;
    only the encoder differs."""
    return synth_jpeg420_blobs(
        df, id_col, len_col, encoder=encode_jpeg_progressive
    )


def synth_jpeg_blobs(
    df: DataFrame, id_col: str = "doc_id", len_col: str = "n_chars"
) -> DataFrame:
    """JPEG fixture-synthesis stage — the ONE home for the derivation
    arithmetic q40f's oracle restates (and the stress shape reuses):
    block grid wb = 1+len%16 by hb = 1+|id|%12, base = |id|%114, block b
    filled with the EVEN value 28 + 2*((base+b)%114) so the quantized DC
    survives the lossy pipeline exactly. Arrow-batched mapInPandas;
    blobs never leave the executors."""

    def make(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = []
            for d, n in zip(pdf[id_col], pdf[len_col]):
                d, n = abs(int(d)), int(n)
                wb, hb = 1 + n % 16, 1 + d % 12
                base = d % 114
                vals = [28 + 2 * ((base + b) % 114) for b in range(wb * hb)]
                blobs.append(encode_jpeg(8 * wb, 8 * hb, vals))
            yield pd.DataFrame({id_col: pdf[id_col], "blob": blobs})

    return df.select(id_col, len_col).mapInPandas(
        make, f"{id_col} long, blob binary"
    )


# --------------------------------------------------- Motion-JPEG video path
def mp4_codec(blob: bytes) -> bytes | None:
    """The track's stsd sample-entry fourcc (e.g. b'mp4v', b'jpeg'), or
    None if the payload is not a well-formed MP4."""
    meta = _parse_mp4(blob)
    return None if meta is None else meta["codec"]


def decode_mjpeg_frame(
    blob: bytes,
    frame_idx: int,
    meta: dict | None = None,
    table: list[tuple[int, int, int, int]] | None = None,
):
    """REAL video-frame PIXEL decode for the Motion-JPEG family: seek
    ONE sample via the stts/stsz/stsc/stco tables (`mp4_sample_table`),
    slice its bytes out of mdat, and run the full JPEG pixel kernel on
    them (`decode_jpeg_pixels` — huffman + dequant + IDCT, baseline or
    progressive). Returns the (h, w, ch) uint8 array, or None when the
    payload is not MP4, the track codec is not b'jpeg', or the index is
    out of range.

    MJPEG is the intra-frame video family (every sample is a standalone
    JPEG — the webcam/capture/archival format), so frame pixels need no
    codec library and SELECTIVE decode is exact: cost is per SAMPLED
    frame, never per video second. Inter-frame codecs (H.264/VP9/AV1)
    remain the honest environment-blocked stub (module docstring).

    ``meta``/``table`` accept precomputed `_parse_mp4`/`mp4_sample_table`
    results for the SAME blob so hot loops (mjpeg_phash_blobs) parse the
    container once, not three times."""
    if meta is None:
        meta = _parse_mp4(blob)
    if meta is None or meta["codec"] != b"jpeg":
        return None
    if table is None:
        table = mp4_sample_table(blob, meta=meta)
    if table is None or not 0 <= frame_idx < len(table):
        return None
    _, off, size, _ = table[frame_idx]
    mdat_start = meta["mdat"][0]
    return decode_jpeg_pixels(blob[mdat_start + off : mdat_start + off + size])


def mjpeg_phash_blobs(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """Per-video perceptual hash over a binary column of MJPEG MP4s:
    walk the sample table, SELECTIVELY decode the middle frame only
    (the cheapest defensible representative — seek + one JPEG decode
    per video regardless of length), collapse to luma with the shared
    convention, pHash. One Arrow-batched mapInPandas projection —
    output (id, n_frames, vhash) is the shuffle key for Hamming-
    bucketed video near-dup, the q158 chain one modality up."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, counts, hashes = [], [], []
            for d, b in zip(pdf[id_col], pdf[blob_col]):
                blob = bytes(b)
                meta = _parse_mp4(blob)
                table = (
                    mp4_sample_table(blob, meta=meta)
                    if meta is not None else None
                )
                if table is None:
                    raise ValueError("mjpeg_phash_blobs: not a valid MP4")
                px = decode_mjpeg_frame(
                    blob, len(table) // 2, meta=meta, table=table
                )
                if px is None:
                    raise ValueError("mjpeg_phash_blobs: not an MJPEG track")
                ids.append(d)
                counts.append(len(table))
                hashes.append(phash64(_pixels_to_luma(px)))
            yield pd.DataFrame(
                {id_col: ids, "n_frames": counts, "vhash": hashes}
            )

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, blob_col).mapInPandas(
        batches, f"{id_col} {id_type}, n_frames long, vhash long"
    )


def synth_mjpeg_blobs(
    df: DataFrame, id_col: str = "doc_id", len_col: str = "n_chars"
) -> DataFrame:
    """MJPEG fixture-synthesis stage — the ONE home for the q174
    derivation arithmetic: every doc in perceptual group g = id//3 gets
    the SAME video (group-determined length n_frames = 3 + g%3, frame f
    a 56x56 grayscale quant-exact JPEG whose 7x7 blocks hold even
    values drawn from an rng seeded by (g, f) — INDEPENDENT patterns
    per group and per frame, so videos dedup exactly by group while a
    wrong frame index changes the hash; an offset-only pattern family
    would alias across groups). 56x56 for the q158c reason: an
    8-aligned 32x32 grid parks 15 pHash DCT coefficients at exact
    zero. Arrow-batched mapInPandas; blobs never leave the executors."""
    import numpy as np

    def make(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = []
            for d in pdf[id_col]:
                g = abs(int(d)) // 3
                n = 3 + g % 3
                frames = []
                for f in range(n):
                    rng = np.random.RandomState(
                        (g * 2654435761 + f * 97 + 5) % (2**31)
                    )
                    vals = (28 + 2 * rng.randint(0, 114, 49)).tolist()
                    frames.append(encode_jpeg(56, 56, vals))
                blobs.append(
                    encode_mp4(
                        n, width=56, height=56,
                        frames=frames, codec=b"jpeg",
                    )
                )
            yield pd.DataFrame({id_col: pdf[id_col], "blob": blobs})

    return df.select(id_col, len_col).mapInPandas(
        make, f"{id_col} long, blob binary"
    )


# ------------------------------------------------- FLAC (lossless audio)
# Round 12: the remaining common crawled-audio format decodable with NO
# codec library — like PNG, the FLAC spec (RFC 9639, public) is pure
# integer arithmetic: UTF-8-coded frame numbers, Rice-coded residuals,
# fixed/LPC integer predictors, CRC-8/CRC-16 integrity, MD5 of the raw
# PCM. The reference (song9446/kstreamjs) has no media surface; this is
# part of the engine's multimodal extension (SURVEY.md §2B Q40/Q160
# family). Supported subset (documented, like the JPEG/GIF kernels):
# 16-bit streams, fixed blocking, CONSTANT/VERBATIM/FIXED/LPC subframes,
# independent + left/right/mid-side stereo, Rice partitions with escape
# codes, wasted bits. Anything else returns None — never raises.

_FLAC_SAMPLE_RATES = {
    1: 88_200, 2: 176_400, 3: 192_000, 4: 8_000, 5: 16_000, 6: 22_050,
    7: 24_000, 8: 32_000, 9: 44_100, 10: 48_000, 11: 96_000,
}


def _flac_crc8(data) -> int:
    """CRC-8, polynomial x^8+x^2+x+1 (0x07), init 0 — frame header CRC."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _flac_crc16(data) -> int:
    """CRC-16, polynomial x^16+x^15+x^2+1 (0x8005), init 0 — frame CRC."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


def _flac_utf8_encode(n: int) -> bytes:
    """FLAC's extended UTF-8 number coding (frame/sample numbers, up to
    36 bits — same scheme as UTF-8 but allowed to run to 7 bytes)."""
    if n < 0x80:
        return bytes([n])
    for nbytes, bits in ((2, 11), (3, 16), (4, 21), (5, 26), (6, 31), (7, 36)):
        if n < (1 << bits):
            head_ones = (0xFF00 >> nbytes) & 0xFF
            payload = 8 - nbytes - 1
            out = bytearray(
                [head_ones | (n >> (6 * (nbytes - 1))) & ((1 << payload) - 1)]
            )
            for i in range(nbytes - 2, -1, -1):
                out.append(0x80 | ((n >> (6 * i)) & 0x3F))
            return bytes(out)
    raise ValueError("FLAC number exceeds 36 bits")


class _FlacBitWriter:
    """MSB-first bit packer (the FLAC bit order)."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        # FLAC unary: q zero bits terminated by a one bit
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def write_bytes(self, bs: bytes) -> None:
        for b in bs:
            self.write(b, 8)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)


class _FlacBitReader:
    """MSB-first bit reader with explicit end detection (returns None
    past the end — callers propagate to a total None result)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos          # byte position of the NEXT unread byte
        self.acc = 0
        self.nbits = 0

    def read(self, nbits: int):
        while self.nbits < nbits:
            if self.pos >= len(self.data):
                return None
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        self.nbits -= nbits
        out = (self.acc >> self.nbits) & ((1 << nbits) - 1)
        self.acc &= (1 << self.nbits) - 1
        return out

    def read_signed(self, nbits: int):
        v = self.read(nbits)
        if v is None:
            return None
        return v - (1 << nbits) if v >= (1 << (nbits - 1)) else v

    def read_unary(self):
        q = 0
        while True:
            b = self.read(1)
            if b is None:
                return None
            if b:
                return q
            q += 1
            if q > 1 << 20:
                return None  # bomb bound: no sane residual quotient

    def byte_aligned(self) -> bool:
        return self.nbits == 0

    def align(self) -> bool:
        """Consume pad bits to the byte boundary; False if any is set."""
        if self.nbits and self.read(self.nbits) != 0:
            return False
        return True


def _flac_utf8_decode(br: _FlacBitReader):
    b0 = br.read(8)
    if b0 is None:
        return None
    if b0 < 0x80:
        return b0
    nbytes = 0
    while b0 & (0x80 >> nbytes):
        nbytes += 1
    if nbytes < 2 or nbytes > 7:
        return None
    n = b0 & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        b = br.read(8)
        if b is None or (b & 0xC0) != 0x80:
            return None
        n = (n << 6) | (b & 0x3F)
    return n


def _flac_residual(br: _FlacBitReader, blocksize: int, order: int):
    """Rice-coded residual section (both 4- and 5-bit parameter methods,
    partition orders, escape-code verbatim partitions)."""
    method = br.read(2)
    if method not in (0, 1):
        return None
    pbits = 4 if method == 0 else 5
    esc = (1 << pbits) - 1
    po = br.read(4)
    if po is None or blocksize % (1 << po):
        return None
    out = []
    for p in range(1 << po):
        n = blocksize >> po
        if p == 0:
            n -= order
        if n < 0:
            return None
        param = br.read(pbits)
        if param is None:
            return None
        if param == esc:
            nb = br.read(5)
            if nb is None:
                return None
            for _ in range(n):
                v = br.read_signed(nb) if nb else 0
                if v is None:
                    return None
                out.append(v)
        else:
            for _ in range(n):
                q = br.read_unary()
                if q is None:
                    return None
                r = br.read(param) if param else 0
                if r is None:
                    return None
                u = (q << param) | r
                out.append((u >> 1) ^ -(u & 1))
    return out


_FLAC_FIXED_COEFS = {
    0: (), 1: (1,), 2: (2, -1), 3: (3, -3, 1), 4: (4, -6, 4, -1),
}


def _flac_subframe(br: _FlacBitReader, blocksize: int, bps: int):
    """One subframe: CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32), with
    the wasted-bits run. Returns the channel's sample list or None."""
    if br.read(1) != 0:
        return None
    t = br.read(6)
    if t is None:
        return None
    wasted = 0
    wflag = br.read(1)
    if wflag is None:
        return None
    if wflag:
        u = br.read_unary()
        if u is None:
            return None
        wasted = u + 1
        bps -= wasted
        if bps <= 0:
            return None
    if t == 0:
        v = br.read_signed(bps)
        if v is None:
            return None
        samples = [v] * blocksize
    elif t == 1:
        samples = []
        for _ in range(blocksize):
            v = br.read_signed(bps)
            if v is None:
                return None
            samples.append(v)
    elif 8 <= t <= 12 or t >= 32:
        if t >= 32:
            order = t - 31
        else:
            order = t - 8
        if order > blocksize:
            return None
        samples = []
        for _ in range(order):
            v = br.read_signed(bps)
            if v is None:
                return None
            samples.append(v)
        if t >= 32:  # LPC: precision, shift, coefficients
            prec = br.read(4)
            if prec is None or prec == 15:
                return None
            prec += 1
            shift = br.read_signed(5)
            if shift is None or shift < 0:
                return None
            coefs = []
            for _ in range(order):
                c = br.read_signed(prec)
                if c is None:
                    return None
                coefs.append(c)
        else:
            coefs, shift = _FLAC_FIXED_COEFS[order], 0
        res = _flac_residual(br, blocksize, order)
        if res is None:
            return None
        for r in res:
            pred = 0
            for j, c in enumerate(coefs):
                pred += c * samples[-1 - j]
            samples.append((pred >> shift) + r)
    else:
        return None  # reserved types 2-7, 13-31
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_flac_samples(blob: bytes):
    """REAL FLAC decode kernel: strict parse of the full container —
    STREAMINFO, metadata-block walk, every frame's sync/CRC-8/CRC-16,
    UTF-8 frame numbering, Rice residuals, fixed/LPC prediction, stereo
    decorrelation (L/S, R/S, M/S) — returning (sample_rate, int16 array
    of shape (n_samples, n_channels)) exactly like `decode_wav_samples`,
    or None on ANY malformation: bad magic, missing/short STREAMINFO,
    non-16-bit streams, CRC mismatch, frame-number discontinuity,
    sample overflow, trailing bytes, or an MD5 (when set in STREAMINFO)
    that does not match the decoded PCM. Pure integer arithmetic per
    RFC 9639 (public); no codec library."""
    import hashlib

    import numpy as np

    if len(blob) < 4 + 4 + 34 or blob[:4] != b"fLaC":
        return None
    pos = 4
    streaminfo = None
    last = False
    while not last:
        if pos + 4 > len(blob):
            return None
        head = blob[pos]
        last = bool(head & 0x80)
        btype = head & 0x7F
        size = int.from_bytes(blob[pos + 1:pos + 4], "big")
        body = blob[pos + 4:pos + 4 + size]
        if len(body) != size:
            return None
        if btype == 0:
            if streaminfo is not None or size != 34:
                return None
            streaminfo = body
        elif btype == 127:
            return None  # invalid block type
        pos += 4 + size
    if streaminfo is None:
        return None
    si = int.from_bytes(streaminfo[:18], "big")
    # 144-bit layout: min_bs(16) max_bs(16) min_fs(24) max_fs(24)
    # rate(20) channels-1(3) bps-1(5) total(36) — shifts from the LSB
    sample_rate = (si >> 44) & 0xFFFFF
    n_channels = ((si >> 41) & 0x7) + 1
    bps = ((si >> 36) & 0x1F) + 1
    total = si & ((1 << 36) - 1)
    md5 = streaminfo[18:34]
    if sample_rate == 0 or bps != 16 or total == 0:
        return None  # 16-bit-only, like decode_wav_samples
    br = _FlacBitReader(blob, pos)
    chans = [[] for _ in range(n_channels)]
    frame_idx = 0
    got = 0
    while got < total:
        if not br.byte_aligned():
            return None
        fstart = br.pos
        if br.read(14) != 0x3FFE or br.read(1) != 0:
            return None
        blocking = br.read(1)
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        if br.read(1) != 0:
            return None
        number = _flac_utf8_decode(br)
        if number is None:
            return None
        if blocking == 0 and number != frame_idx:
            return None  # fixed blocking: the coded number IS the index
        if blocking == 1 and number != got:
            return None  # variable blocking: it is the first SAMPLE index
        if bs_code == 0:
            return None
        elif bs_code == 1:
            blocksize = 192
        elif bs_code <= 5:
            blocksize = 576 << (bs_code - 2)
        elif bs_code == 6:
            v = br.read(8)
            if v is None:
                return None
            blocksize = v + 1
        elif bs_code == 7:
            v = br.read(16)
            if v is None:
                return None
            blocksize = v + 1
        else:
            blocksize = 256 << (bs_code - 8)
        if sr_code == 0:
            fsr = sample_rate
        elif sr_code in _FLAC_SAMPLE_RATES:
            fsr = _FLAC_SAMPLE_RATES[sr_code]
        elif sr_code == 12:
            v = br.read(8)
            fsr = v * 1000 if v is not None else None
        elif sr_code == 13:
            fsr = br.read(16)
        elif sr_code == 14:
            v = br.read(16)
            fsr = v * 10 if v is not None else None
        else:
            return None
        if fsr is None or fsr != sample_rate:
            return None
        if ch_code <= 7:
            nch, mode = ch_code + 1, "indep"
        elif ch_code in (8, 9, 10):
            nch, mode = 2, ("ls", "rs", "ms")[ch_code - 8]
        else:
            return None
        if nch != n_channels:
            return None
        fbps = {0: bps, 1: 8, 2: 12, 4: 16, 5: 20, 6: 24}.get(ss_code)
        if fbps != 16:
            return None
        crc8 = br.read(8)
        if crc8 is None or _flac_crc8(blob[fstart:br.pos - 1]) != crc8:
            return None
        if got + blocksize > total:
            return None
        subs = []
        for c in range(nch):
            sbps = fbps
            if (mode == "ls" and c == 1) or (mode == "rs" and c == 0) \
                    or (mode == "ms" and c == 1):
                sbps += 1  # the side channel carries one extra bit
            s = _flac_subframe(br, blocksize, sbps)
            if s is None:
                return None
            subs.append(s)
        if not br.align():
            return None
        crc16 = br.read(16)
        if crc16 is None or _flac_crc16(blob[fstart:br.pos - 2]) != crc16:
            return None
        if mode == "ls":
            left, side = subs
            subs = [left, [l - s for l, s in zip(left, side)]]
        elif mode == "rs":
            side, right = subs
            subs = [[r + s for r, s in zip(right, side)], right]
        elif mode == "ms":
            mid, side = subs
            lr = []
            for m, s in zip(mid, side):
                m2 = (m << 1) | (s & 1)
                lr.append(((m2 + s) >> 1, (m2 - s) >> 1))
            subs = [[p[0] for p in lr], [p[1] for p in lr]]
        for c in range(n_channels):
            for v in subs[c]:
                if v < -32768 or v > 32767:
                    return None
            chans[c].extend(subs[c])
        got += blocksize
        frame_idx += 1
    if br.pos != len(blob) or got != total:
        return None
    arr = np.empty((total, n_channels), dtype=np.int16)
    for c in range(n_channels):
        arr[:, c] = chans[c]
    if md5 != b"\x00" * 16:
        if hashlib.md5(arr.astype("<i2").tobytes()).digest() != md5:
            return None
    return sample_rate, arr


def _flac_best_rice_param(uvals) -> int:
    """Smallest-cost Rice parameter (classic mean-based estimate, then
    local refinement over p-1/p/p+1 by exact bit cost)."""
    n = len(uvals)
    if n == 0:
        return 0
    total = sum(uvals)
    p = 0
    while (n << (p + 1)) < total and p < 14:
        p += 1

    def cost(k):
        return sum(u >> k for u in uvals) + n * (k + 1)

    best = min(
        (c for c in (p - 1, p, p + 1) if 0 <= c <= 14),
        key=cost,
    )
    return best


def encode_flac_samples(
    samples, sample_rate: int = 16000, n_channels: int = 1,
    block_size: int = 4096, max_order: int = 3,
) -> bytes:
    """Pure-Python FLAC encoder (fixture generator for the real decode
    path, like `encode_wav_samples`/`encode_png`): 16-bit PCM in,
    spec-conformant stream out — STREAMINFO with the PCM MD5, fixed
    blocking, per-channel best FIXED predictor (order 0..``max_order``
    by exact residual cost, CONSTANT when flat), single-partition Rice
    residuals with the escape raw fallback, CRC-8/CRC-16 per frame.
    Round-trips bit-exactly through `decode_flac_samples` (property
    test), and real decoders accept the output (same spec arithmetic).
    """
    import hashlib

    import numpy as np

    arr = np.asarray(samples, dtype=np.int16)
    if arr.size % n_channels:
        raise ValueError(
            f"encode_flac_samples: {arr.size} samples do not divide into "
            f"{n_channels} channels"
        )
    if not 1 <= n_channels <= 8:
        raise ValueError("encode_flac_samples: 1..8 channels")
    frames = arr.reshape(-1, n_channels)
    total = frames.shape[0]
    if total == 0:
        raise ValueError("encode_flac_samples: empty input")
    md5 = hashlib.md5(arr.astype("<i2").tobytes()).digest()
    n_frames = (total + block_size - 1) // block_size
    sizes = [
        min(block_size, total - i * block_size) for i in range(n_frames)
    ]
    # ---- STREAMINFO (34 bytes)
    si = 0
    si = (si << 16) | min(sizes)
    si = (si << 16) | max(sizes)
    si = (si << 24) | 0          # min frame size unknown
    si = (si << 24) | 0          # max frame size unknown
    si = (si << 20) | sample_rate
    si = (si << 3) | (n_channels - 1)
    si = (si << 5) | 15          # bits per sample - 1 = 15
    si = (si << 36) | total
    streaminfo = si.to_bytes(18, "big") + md5
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + (34).to_bytes(3, "big") + streaminfo

    for fi in range(n_frames):
        chunk = frames[fi * block_size:(fi + 1) * block_size]
        bs = chunk.shape[0]
        w = _FlacBitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)                    # fixed blocking
        w.write(7, 4)                    # 16-bit blocksize-1 follows
        w.write(0, 4)                    # sample rate: from STREAMINFO
        w.write(n_channels - 1, 4)       # independent channels
        w.write(0b100, 3)                # 16 bits per sample
        w.write(0, 1)
        w.write_bytes(_flac_utf8_encode(fi))
        w.write(bs - 1, 16)
        w.write(_flac_crc8(w.buf), 8)
        for c in range(n_channels):
            ch = chunk[:, c].astype(np.int64)
            if bs > 1 and (ch == ch[0]).all():
                w.write(0, 1)
                w.write(0, 6)            # CONSTANT
                w.write(0, 1)
                w.write(int(ch[0]), 16)
                continue
            # best fixed order by exact rice cost of the zigzagged
            # residuals (warmup cost included)
            best = None
            for order in range(0, min(max_order, bs - 1) + 1):
                res = ch.copy()
                for _ in range(order):
                    res = np.diff(res)
                uz = np.where(res >= 0, res * 2, -res * 2 - 1)
                p = _flac_best_rice_param(uz.tolist())
                bits = 16 * order + int((uz >> p).sum()) + len(uz) * (p + 1)
                if best is None or bits < best[0]:
                    best = (bits, order, res, p)
            _, order, res, p = best
            w.write(0, 1)
            w.write(8 + order, 6)        # FIXED subframe, this order
            w.write(0, 1)                # no wasted bits
            for v in ch[:order]:
                w.write(int(v), 16)
            w.write(0, 2)                # rice method: 4-bit params
            w.write(0, 4)                # partition order 0
            # residuals after the warmup (np.diff already dropped them)
            if p <= 14:
                w.write(p, 4)
                for r in res.tolist():
                    u = r * 2 if r >= 0 else -r * 2 - 1
                    w.write_unary(u >> p)
                    if p:
                        w.write(u & ((1 << p) - 1), p)
            else:  # escape: raw residuals (never hit by int16 + order<=3)
                w.write(15, 4)
                w.write(18, 5)
                for r in res.tolist():
                    w.write(int(r), 18)
        w.align()
        w.write(_flac_crc16(w.buf), 16)
        out += w.buf
    return bytes(out)


def decode_audio_samples(blob: bytes):
    """Magic-byte audio-codec dispatch (the `decode_image_pixels`
    analog): RIFF/WAVE -> `decode_wav_samples`, fLaC ->
    `decode_flac_samples`; anything else None. Both kernels return the
    same (sample_rate, int16 (n_samples, n_channels)) contract, so the
    fingerprint chain above is codec-agnostic."""
    if blob[:4] == b"RIFF":
        return decode_wav_samples(blob)
    if blob[:4] == b"fLaC":
        return decode_flac_samples(blob)
    return None
