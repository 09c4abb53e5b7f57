"""JPEG kernels: baseline AND progressive (SOF2 spectral selection,
successive approximation, EOB-run coding), grayscale / 4:4:4 /
subsampled 4:2:0 and 4:2:2 layouts — marker walk, DHT huffman
entropy decode, dequantize, numpy-batched 2-D IDCT, chroma
upsample — plus the deterministic JPEG fixture synthesizers."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .core import _MAX_DECODE_BYTES, _decode_meta_blobs, widen_partitions

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

    return widen_partitions(df.select(id_col, len_col)).mapInPandas(
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

    return widen_partitions(df.select(id_col, len_col)).mapInPandas(
        make, f"{id_col} long, blob binary"
    )


