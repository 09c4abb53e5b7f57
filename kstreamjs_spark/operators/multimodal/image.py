"""Still-image kernels: uncompressed BMP, 8-bit PNG (chunk walk +
CRC + stdlib-zlib inflate + all-five-filter reconstruction), and the
perceptual-hash primitives (32x32 DCT pHash, luma collapse) shared
by every visual near-dup pipeline."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .core import _MAX_DECODE_BYTES, _decode_meta_blobs

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


