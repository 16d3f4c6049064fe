"""Third-party conformance vectors for the codec tier (VERDICT r13 #3).

Self-round-trip and cross-codec-transcode tests prove SELF-consistency;
they cannot catch a self-consistent-but-nonstandard table or filter
convention (ADVICE r12 caught exactly one instance of that class in the
G.711 encoder). This file pins the decoders against material that did
NOT come from this codebase's encoders:

- the canonical Sun Microsystems / CCITT G.711 expansion tables
  (embedded as 512 literal values — the public-domain g711.c tables
  every telephony stack ships), all 256 codes per law;
- an exhaustive (all 65536 int16 inputs) differential against an
  ITU-T G.191 Software Tool Library-style compressor written fresh
  here in the STL's own structure (ones'-complement negative
  magnitudes), characterizing the encoder's documented divergence
  EXACTLY — 127 codes per law, negatives only, one reconstruction
  level apart;
- the canonical IMA/DVI ADPCM step and index tables (89 + 8 literal
  values from the IMA recommended practice) plus an independent
  reference decoder walked over a pseudorandom nibble stream;
- hand-assembled PNG fixtures (stdlib zlib + struct, an in-test
  forward filter written fresh from spec §9) exercising filter types
  and type/depth combinations this repo's encoders never emit;
- hand-assembled baseline JPEGs carrying the ITU T.81 **Annex K**
  typical Huffman and quantization tables (this repo's encoder emits
  custom flat tables, so Annex K streams are genuinely foreign), with
  closed-form expected pixels (DC-only blocks ⇒ constant 8x8 tiles);
- a hand-assembled μ-law RIFF/WAVE container decoded through
  decode_wav_compressed against the embedded expansion table.

Reference parity note: the reference server does not implement G.711 /
ADPCM / PNG / JPEG codecs at all — this tier is north-star scope, so
conformance is pinned against the public standards instead.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from kassette_server_spark.operators.multimodal import (
    _IMA_INDEX_TABLE,
    _IMA_STEP_TABLE,
    alaw_decode,
    alaw_encode,
    decode_jpeg_pixels,
    decode_png_pixels,
    decode_png_pixels_deep,
    decode_wav_compressed,
    ima_adpcm_decode,
    mulaw_decode,
    mulaw_encode,
)

# ---------------------------------------------------------------------------
# G.711 expansion tables — the canonical public-domain Sun/CCITT
# ulaw2linear16 / alaw2linear16 tables, negative halves; positives mirror.
# ---------------------------------------------------------------------------

ULAW_TABLE_NEG = (
    -32124, -31100, -30076, -29052, -28028, -27004, -25980, -24956,
    -23932, -22908, -21884, -20860, -19836, -18812, -17788, -16764,
    -15996, -15484, -14972, -14460, -13948, -13436, -12924, -12412,
    -11900, -11388, -10876, -10364, -9852, -9340, -8828, -8316,
    -7932, -7676, -7420, -7164, -6908, -6652, -6396, -6140,
    -5884, -5628, -5372, -5116, -4860, -4604, -4348, -4092,
    -3900, -3772, -3644, -3516, -3388, -3260, -3132, -3004,
    -2876, -2748, -2620, -2492, -2364, -2236, -2108, -1980,
    -1884, -1820, -1756, -1692, -1628, -1564, -1500, -1436,
    -1372, -1308, -1244, -1180, -1116, -1052, -988, -924,
    -876, -844, -812, -780, -748, -716, -684, -652,
    -620, -588, -556, -524, -492, -460, -428, -396,
    -372, -356, -340, -324, -308, -292, -276, -260,
    -244, -228, -212, -196, -180, -164, -148, -132,
    -120, -112, -104, -96, -88, -80, -72, -64,
    -56, -48, -40, -32, -24, -16, -8, 0,
)

ALAW_TABLE_NEG = (
    -5504, -5248, -6016, -5760, -4480, -4224, -4992, -4736,
    -7552, -7296, -8064, -7808, -6528, -6272, -7040, -6784,
    -2752, -2624, -3008, -2880, -2240, -2112, -2496, -2368,
    -3776, -3648, -4032, -3904, -3264, -3136, -3520, -3392,
    -22016, -20992, -24064, -23040, -17920, -16896, -19968, -18944,
    -30208, -29184, -32256, -31232, -26112, -25088, -28160, -27136,
    -11008, -10496, -12032, -11520, -8960, -8448, -9984, -9472,
    -15104, -14592, -16128, -15616, -13056, -12544, -14080, -13568,
    -344, -328, -376, -360, -280, -264, -312, -296,
    -472, -456, -504, -488, -408, -392, -440, -424,
    -88, -72, -120, -104, -24, -8, -56, -40,
    -216, -200, -248, -232, -152, -136, -184, -168,
    -1376, -1312, -1504, -1440, -1120, -1056, -1248, -1184,
    -1888, -1824, -2016, -1952, -1632, -1568, -1760, -1696,
    -688, -656, -752, -720, -560, -528, -624, -592,
    -944, -912, -1008, -976, -816, -784, -880, -848,
)

ULAW_TABLE = ULAW_TABLE_NEG + tuple(-v for v in ULAW_TABLE_NEG)
ALAW_TABLE = ALAW_TABLE_NEG + tuple(-v for v in ALAW_TABLE_NEG)


def test_mulaw_decode_matches_canonical_table_all_256_codes():
    got = mulaw_decode(np.arange(256, dtype=np.uint8)).astype(int).tolist()
    assert got == list(ULAW_TABLE)


def test_alaw_decode_matches_canonical_table_all_256_codes():
    got = alaw_decode(np.arange(256, dtype=np.uint8)).astype(int).tolist()
    assert got == list(ALAW_TABLE)


# ---------------------------------------------------------------------------
# G.711 encode vs an ITU-T G.191 STL-style compressor, exhaustively.
# ---------------------------------------------------------------------------


def _stl_ulaw_compress(samples):
    """ITU-T G.191 STL ``ulaw_compress`` re-expressed from the STL's
    published structure: 14-bit magnitude via ONES'-COMPLEMENT for
    negatives ((~s)>>2), +33 bias, segment search by shifting, nibble
    complement, sign bit marks non-negative."""
    out = []
    for v in samples:
        v = int(v)
        absno = ((~v) >> 2) + 33 if v < 0 else (v >> 2) + 33
        if absno > 8191:
            absno = 8191
        i = absno >> 6
        segno = 1
        while i != 0:
            segno += 1
            i >>= 1
        code = ((8 - segno) << 4) | (0x0F - ((absno >> segno) & 0x0F))
        if v >= 0:
            code |= 0x80
        out.append(code)
    return np.array(out, dtype=np.uint8)


def _stl_alaw_compress(samples):
    """ITU-T G.191 STL ``alaw_compress``: 12-bit magnitude via ones'
    complement for negatives ((~s)>>4), exponent walk, sign bit marks
    non-negative, final XOR 0x55."""
    out = []
    for v in samples:
        v = int(v)
        ix = ((~v) >> 4) if v < 0 else (v >> 4)
        if ix > 15:
            iexp = 1
            while ix > 16 + 15:
                ix >>= 1
                iexp += 1
            ix = (ix - 16) + (iexp << 4)
        if v >= 0:
            ix |= 0x80
        out.append(ix ^ 0x55)
    return np.array(out, dtype=np.uint8)


def _adjacent_levels(decoded_a: np.ndarray, decoded_b: np.ndarray, table) -> bool:
    """True iff every (a, b) pair sits on ADJACENT reconstruction
    levels of the law's (sorted, deduplicated) level grid."""
    levels = np.array(sorted(set(table)))
    ia = np.searchsorted(levels, decoded_a)
    ib = np.searchsorted(levels, decoded_b)
    return bool((np.abs(ia - ib) == 1).all())


def test_mulaw_encode_divergence_vs_itu_is_exactly_127_boundary_codes():
    """Exhaustive differential against the STL reference: the
    documented abs(s)-vs-(~s) magnitude convention flips exactly the
    127 negative samples sitting on interior quantization-interval
    boundaries (one per boundary of the 128 negative output codes),
    each by ONE reconstruction level. Decode of either code is
    table-exact, so the delta is within one quantization step."""
    s = np.arange(-32768, 32768, dtype=np.int64).astype(np.int16)
    ref = _stl_ulaw_compress(s)
    got = mulaw_encode(s)
    d = np.nonzero(ref != got)[0]
    assert len(d) == 127
    assert (s[d] < 0).all()
    assert _adjacent_levels(
        mulaw_decode(ref[d]).astype(np.int64),
        mulaw_decode(got[d]).astype(np.int64),
        ULAW_TABLE,
    )
    # the STL reference itself is internally consistent: it maps every
    # reconstruction level back to its own code (negative zero 0x7F is
    # the law's inherent exception — both zeros re-encode as 0xFF)
    codes = np.arange(256, dtype=np.uint8)
    re = _stl_ulaw_compress(mulaw_decode(codes))
    assert [int(c) for c in codes[re != codes]] == [0x7F]


def test_alaw_encode_divergence_vs_itu_is_exactly_127_boundary_codes():
    s = np.arange(-32768, 32768, dtype=np.int64).astype(np.int16)
    ref = _stl_alaw_compress(s)
    got = alaw_encode(s)
    d = np.nonzero(ref != got)[0]
    assert len(d) == 127
    assert (s[d] < 0).all()
    assert _adjacent_levels(
        alaw_decode(ref[d]).astype(np.int64),
        alaw_decode(got[d]).astype(np.int64),
        ALAW_TABLE,
    )
    # A-law has no negative-zero artifact: the STL reference is
    # perfectly canonical over all 256 codes
    codes = np.arange(256, dtype=np.uint8)
    assert (_stl_alaw_compress(alaw_decode(codes)) == codes).all()


# ---------------------------------------------------------------------------
# IMA / DVI ADPCM — canonical tables + independent reference decoder.
# ---------------------------------------------------------------------------

IMA_STEPS = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
    19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
    50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
    130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
    337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
    876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
    5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)
IMA_INDEX_ADJUST = (-1, -1, -1, -1, 2, 4, 6, 8)


def test_ima_tables_match_the_recommended_practice():
    assert tuple(_IMA_STEP_TABLE) == IMA_STEPS
    assert tuple(_IMA_INDEX_TABLE) == IMA_INDEX_ADJUST


def test_ima_decode_matches_independent_reference_walk():
    """A fresh reference decoder (written from the IMA recommended
    practice's pseudo-code shape, using the EMBEDDED tables) walked
    over a pseudorandom nibble stream must agree bit-for-bit."""
    rng = np.random.default_rng(14)
    nibbles = rng.integers(0, 16, size=501).tolist()
    packed = bytes(
        nibbles[i] | (nibbles[i + 1] << 4 if i + 1 < len(nibbles) else 0)
        for i in range(0, len(nibbles), 2)
    )

    pred, index, expect = 100, 30, []
    for code in nibbles:
        step = IMA_STEPS[index]
        diff = step >> 3
        if code & 4:
            diff += step
        if code & 2:
            diff += step >> 1
        if code & 1:
            diff += step >> 2
        pred = pred - diff if code & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        index = max(0, min(88, index + IMA_INDEX_ADJUST[code & 7]))
        expect.append(pred)

    got = ima_adpcm_decode(packed, len(nibbles), pred=100, index=30)
    assert got.astype(int).tolist() == expect


# ---------------------------------------------------------------------------
# PNG fixtures from an independent writer (stdlib zlib; fresh §9 filters).
# ---------------------------------------------------------------------------


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data))
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_rows(rows: list[bytes], bpp: int, filters: list[int]) -> bytes:
    """Forward-filter raw scanlines per PNG spec §9 — written fresh
    here (NOT multimodal's _forward_filter) so a shared convention bug
    between this repo's forward and inverse filters cannot hide."""
    out = bytearray()
    prev = bytes(len(rows[0]))
    for row, ft in zip(rows, filters):
        out.append(ft)
        for x, v in enumerate(row):
            a = row[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if ft == 0:
                f = v
            elif ft == 1:
                f = (v - a) % 256
            elif ft == 2:
                f = (v - b) % 256
            elif ft == 3:
                f = (v - (a + b) // 2) % 256
            else:
                f = (v - _paeth(a, b, c)) % 256
            out.append(f)
        prev = row
    return bytes(out)


def _png(w: int, h: int, depth: int, ctype: int, idat: bytes, plte: bytes = b"") -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
    body = _chunk(b"IHDR", ihdr)
    if plte:
        body += _chunk(b"PLTE", plte)
    body += _chunk(b"IDAT", zlib.compress(idat)) + _chunk(b"IEND", b"")
    return b"\x89PNG\r\n\x1a\n" + body


def _pix(x: int, y: int, c: int) -> int:
    return (x * 7 + y * 13 + c * 3 + 11) % 256


def test_png_gray8_all_five_filter_types_decode():
    w, h = 9, 5
    rows = [bytes(_pix(x, y, 0) for x in range(w)) for y in range(h)]
    payload = _png(w, h, 8, 0, _filter_rows(rows, 1, [0, 1, 2, 3, 4]))
    gw, gh, ch, px = decode_png_pixels(payload)
    assert (gw, gh, ch) == (w, h, 1)
    assert px == b"".join(rows)


def test_png_rgb8_paeth_everywhere_decodes():
    w, h = 7, 6
    rows = [
        bytes(_pix(x, y, c) for x in range(w) for c in range(3))
        for y in range(h)
    ]
    payload = _png(w, h, 8, 2, _filter_rows(rows, 3, [4] * h))
    gw, gh, ch, px = decode_png_pixels(payload)
    assert (gw, gh, ch) == (w, h, 3)
    assert px == b"".join(rows)


def test_png_rgba8_average_filter_decodes():
    w, h = 5, 4
    rows = [
        bytes(_pix(x, y, c) for x in range(w) for c in range(4))
        for y in range(h)
    ]
    payload = _png(w, h, 8, 6, _filter_rows(rows, 4, [3] * h))
    gw, gh, ch, px = decode_png_pixels(payload)
    assert (gw, gh, ch) == (w, h, 4)
    assert px == b"".join(rows)


def test_png_palette8_sub_filter_expands_through_plte():
    w, h = 6, 3
    plte = bytes((i * 5) % 256 for i in range(16 * 3))
    rows = [bytes((x + y * 2) % 16 for x in range(w)) for y in range(h)]
    payload = _png(w, h, 8, 3, _filter_rows(rows, 1, [1] * h), plte=plte)
    gw, gh, ch, px = decode_png_pixels(payload)
    assert (gw, gh, ch) == (w, h, 3)
    expect = b"".join(
        plte[idx * 3 : idx * 3 + 3] for row in rows for idx in row
    )
    assert px == expect


def test_png_gray16_up_filter_decodes():
    w, h = 4, 5
    vals = [[(x * 4099 + y * 257) % 65536 for x in range(w)] for y in range(h)]
    rows = [
        b"".join(struct.pack(">H", v) for v in rowvals) for rowvals in vals
    ]
    payload = _png(w, h, 16, 0, _filter_rows(rows, 2, [2] * h))
    gw, gh, ch, depth, px = decode_png_pixels_deep(payload)
    assert (gw, gh, ch, depth) == (w, h, 1, 16)
    assert px == b"".join(rows)


def test_png_gray4_packed_sub_filter_decodes():
    w, h = 11, 3  # odd width: trailing pad bits in every scanline
    vals = [[(x + 2 * y) % 16 for x in range(w)] for y in range(h)]
    rows = []
    for rowvals in vals:
        packed = bytearray()
        for i in range(0, w, 2):
            hi = rowvals[i]
            lo = rowvals[i + 1] if i + 1 < w else 0
            packed.append((hi << 4) | lo)
        rows.append(bytes(packed))
    payload = _png(w, h, 4, 0, _filter_rows(rows, 1, [1] * h))
    gw, gh, ch, depth, px = decode_png_pixels_deep(payload)
    assert (gw, gh, ch, depth) == (w, h, 1, 4)
    assert list(px) == [v for rowvals in vals for v in rowvals]


def test_png_gray1_decodes():
    w, h = 10, 4
    vals = [[(x ^ y) & 1 for x in range(w)] for y in range(h)]
    rows = []
    for rowvals in vals:
        packed = bytearray((w + 7) // 8)
        for x, v in enumerate(rowvals):
            if v:
                packed[x // 8] |= 0x80 >> (x % 8)
        rows.append(bytes(packed))
    payload = _png(w, h, 1, 0, _filter_rows(rows, 1, [0, 2, 0, 2]))
    gw, gh, ch, depth, px = decode_png_pixels_deep(payload)
    assert (gw, gh, ch, depth) == (w, h, 1, 1)
    assert list(px) == [v for rowvals in vals for v in rowvals]


def test_png_palette2_decodes():
    w, h = 5, 2
    plte = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120])
    vals = [[0, 1, 2, 3, 1], [3, 2, 1, 0, 2]]
    rows = []
    for rowvals in vals:
        packed = bytearray((w * 2 + 7) // 8)
        for x, v in enumerate(rowvals):
            packed[x // 4] |= v << (6 - 2 * (x % 4))
        rows.append(bytes(packed))
    payload = _png(w, h, 2, 3, _filter_rows(rows, 1, [0] * h), plte=plte)
    gw, gh, ch, depth, px = decode_png_pixels_deep(payload)
    assert (gw, gh, ch, depth) == (w, h, 3, 8)
    expect = b"".join(
        plte[v * 3 : v * 3 + 3] for rowvals in vals for v in rowvals
    )
    assert px == expect


# ---------------------------------------------------------------------------
# JPEG fixtures with ITU T.81 Annex K tables (foreign to this encoder).
# ---------------------------------------------------------------------------

# Table K.1 — luminance quantization, raster order.
ANNEX_K_LUMA_QUANT = (
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
)

# Table K.3 — luminance DC: BITS then HUFFVAL.
ANNEX_K_DC_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
ANNEX_K_DC_VALS = tuple(range(12))

# Table K.5 — luminance AC: BITS then HUFFVAL.
ANNEX_K_AC_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
ANNEX_K_AC_VALS = (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
)
assert sum(ANNEX_K_AC_BITS) == len(ANNEX_K_AC_VALS) == 162

# spec Figure 5 zigzag: scan position k → raster index (independent
# literal, not multimodal._ZIGZAG)
ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
)


def _huff_codes(bits, vals):
    """Canonical code assignment per spec §C.2 (fresh here)."""
    out, code = {}, 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


class _Bits:
    """Entropy-coded-segment writer with 0xFF byte stuffing (fresh)."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, ln: int):
        for i in range(ln - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)
                self.acc, self.n = 0, 0

    def done(self) -> bytes:
        while self.n:
            self.put(1, 1)  # pad with 1-bits per spec §F.1.2.3
        return bytes(self.buf)


def _annex_k_gray_jpeg(dc_coeffs: list[int], width: int, restart: bool = False) -> bytes:
    """Hand-assembled baseline gray JPEG: one 8-px-tall strip of
    DC-only blocks with Annex K tables. Each block's only nonzero
    coefficient is its DC, so the expected image is closed-form:
    pixel = 128 + (DC·q00)/8 per 8x8 tile."""
    dcs = _huff_codes(ANNEX_K_DC_BITS, ANNEX_K_DC_VALS)
    acs = _huff_codes(ANNEX_K_AC_BITS, ANNEX_K_AC_VALS)

    zz_quant = bytes(ANNEX_K_LUMA_QUANT[ZIGZAG[k]] for k in range(64))
    dqt = b"\xff\xdb" + struct.pack(">H", 2 + 65) + b"\x00" + zz_quant
    sof = (
        b"\xff\xc0"
        + struct.pack(">HBHHB", 8 + 3, 8, 8, width, 1)
        + bytes([1, 0x11, 0])
    )
    dht_payload = (
        bytes([0x00]) + bytes(ANNEX_K_DC_BITS) + bytes(ANNEX_K_DC_VALS)
        + bytes([0x10]) + bytes(ANNEX_K_AC_BITS) + bytes(ANNEX_K_AC_VALS)
    )
    dht = b"\xff\xc4" + struct.pack(">H", 2 + len(dht_payload)) + dht_payload
    dri = (
        b"\xff\xdd" + struct.pack(">HH", 4, 1) if restart else b""
    )
    sos = b"\xff\xda" + struct.pack(">HB", 2 + 1 + 2 + 3, 1) + bytes(
        [1, 0x00, 0, 63, 0]
    )

    def block_bits(w: _Bits, diff: int):
        if diff == 0:
            w.put(*dcs[0])
        else:
            mag = abs(diff)
            cat = mag.bit_length()
            w.put(*dcs[cat])
            bits = diff if diff > 0 else diff + (1 << cat) - 1
            w.put(bits & ((1 << cat) - 1), cat)
        w.put(*acs[0x00])  # EOB

    scan = bytearray()
    if restart:
        pred = 0
        for i, dc in enumerate(dc_coeffs):
            w = _Bits()
            block_bits(w, dc - pred)  # pred resets at each RSTn...
            scan += w.done()
            if i + 1 < len(dc_coeffs):
                scan += bytes([0xFF, 0xD0 + (i % 8)])
            pred = 0  # ...so every segment codes its DC absolute
    else:
        w = _Bits()
        pred = 0
        for dc in dc_coeffs:
            block_bits(w, dc - pred)
            pred = dc
        scan = bytearray(w.done())

    return b"\xff\xd8" + dqt + sof + dht + dri + sos + bytes(scan) + b"\xff\xd9"


def test_jpeg_annex_k_dc_only_blocks_decode_to_constant_tiles():
    """Foreign baseline stream: Annex K tables this repo's encoder
    never writes; DC-only blocks ⇒ every 8x8 tile reconstructs to the
    constant 128 + DC·16/8 (q00 = 16)."""
    dcs = [10, -20, 0]  # tiles: 148, 88, 128
    payload = _annex_k_gray_jpeg(dcs, width=24)
    w, h, ch, px = decode_jpeg_pixels(payload)
    assert (w, h, ch) == (24, 8, 1)
    img = np.frombuffer(px, dtype=np.uint8).reshape(8, 24)
    for i, dc in enumerate(dcs):
        tile = img[:, 8 * i : 8 * (i + 1)]
        assert (tile == 128 + dc * 2).all(), (i, tile[0, 0])


def test_jpeg_annex_k_with_restart_markers_decodes():
    """Same foreign stream with DRI=1 and an RSTn between every block:
    predictors and byte alignment reset per marker."""
    dcs = [5, -7, 12, 0, -1]
    payload = _annex_k_gray_jpeg(dcs, width=40, restart=True)
    w, h, ch, px = decode_jpeg_pixels(payload)
    assert (w, h, ch) == (40, 8, 1)
    img = np.frombuffer(px, dtype=np.uint8).reshape(8, 40)
    for i, dc in enumerate(dcs):
        assert (img[:, 8 * i : 8 * (i + 1)] == 128 + dc * 2).all()


# ---------------------------------------------------------------------------
# WAV container fixture: hand-built μ-law RIFF decoded through the table.
# ---------------------------------------------------------------------------


def test_wav_mulaw_container_from_foreign_writer_decodes_via_table():
    codes = bytes(range(256))
    fmt = struct.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, 256)
        + b"data" + struct.pack("<I", len(codes)) + codes
    )
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    got = decode_wav_compressed(payload).astype(int).tolist()
    assert got == list(ULAW_TABLE)


def test_png_adam7_interlaced_foreign_fixture_decodes():
    """Adam7 PNG assembled fresh from spec §8.2's pass grid (literal
    offsets/steps) with per-pass §9 filtering — an interlace layout
    ordering this repo's encoder does not produce byte-for-byte."""
    ADAM7 = (  # (x0, y0, dx, dy) per spec §8.2
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    )
    w, h = 9, 7
    img = [[_pix(x, y, 0) for x in range(w)] for y in range(h)]
    raw = bytearray()
    fts = [0, 1, 2, 3, 4, 1, 2]
    for (x0, y0, dx, dy), ft in zip(ADAM7, fts):
        rows = [
            bytes(img[y][x] for x in range(x0, w, dx))
            for y in range(y0, h, dy)
        ]
        rows = [r for r in rows if r]
        if not rows:
            continue
        raw += _filter_rows(rows, 1, [ft] * len(rows))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 1)  # interlace=1
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    gw, gh, ch, px = decode_png_pixels(payload)
    assert (gw, gh, ch) == (w, h, 1)
    assert px == bytes(v for row in img for v in row)


def test_jpeg_annex_k_progressive_dc_only_decodes():
    """Hand-assembled PROGRESSIVE (SOF2) gray JPEG with Annex K
    tables: a DC scan (Ss=0, Se=0) followed by one full AC scan
    (Ss=1, Se=63) that is a single EOB per block — DC-only blocks, so
    the expected image is the same closed-form constant tiles as the
    baseline fixture, delivered through the multi-scan accumulation
    path instead."""
    dcs_tab = _huff_codes(ANNEX_K_DC_BITS, ANNEX_K_DC_VALS)
    acs_tab = _huff_codes(ANNEX_K_AC_BITS, ANNEX_K_AC_VALS)
    dc_coeffs = [6, -9]
    width = 16

    zz_quant = bytes(ANNEX_K_LUMA_QUANT[ZIGZAG[k]] for k in range(64))
    dqt = b"\xff\xdb" + struct.pack(">H", 2 + 65) + b"\x00" + zz_quant
    sof = (
        b"\xff\xc2"  # SOF2: progressive
        + struct.pack(">HBHHB", 8 + 3, 8, 8, width, 1)
        + bytes([1, 0x11, 0])
    )
    dht_payload = (
        bytes([0x00]) + bytes(ANNEX_K_DC_BITS) + bytes(ANNEX_K_DC_VALS)
        + bytes([0x10]) + bytes(ANNEX_K_AC_BITS) + bytes(ANNEX_K_AC_VALS)
    )
    dht = b"\xff\xc4" + struct.pack(">H", 2 + len(dht_payload)) + dht_payload

    # scan 1: DC, Ss=Se=0, Ah=Al=0
    sos1 = b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 0, 0])
    w1 = _Bits()
    pred = 0
    for dc in dc_coeffs:
        diff = dc - pred
        pred = dc
        if diff == 0:
            w1.put(*dcs_tab[0])
        else:
            mag = abs(diff)
            cat = mag.bit_length()
            w1.put(*dcs_tab[cat])
            bits = diff if diff > 0 else diff + (1 << cat) - 1
            w1.put(bits & ((1 << cat) - 1), cat)
    scan1 = w1.done()

    # scan 2: AC band 1..63, Ah=Al=0 — one EOB (run length 1) per block
    sos2 = b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 1, 63, 0])
    w2 = _Bits()
    for _ in dc_coeffs:
        w2.put(*acs_tab[0x00])
    scan2 = w2.done()

    payload = (
        b"\xff\xd8" + dqt + sof + dht + sos1 + scan1 + sos2 + scan2
        + b"\xff\xd9"
    )
    gw, gh, ch, px = decode_jpeg_pixels(payload)
    assert (gw, gh, ch) == (width, 8, 1)
    img = np.frombuffer(px, dtype=np.uint8).reshape(8, width)
    for i, dc in enumerate(dc_coeffs):
        assert (img[:, 8 * i : 8 * (i + 1)] == 128 + dc * 2).all()


def test_jpeg_annex_k_ac_successive_approximation_decodes():
    """Hand-assembled PROGRESSIVE gray JPEG with Annex K tables
    exercising AC SUCCESSIVE APPROXIMATION — the one JPEG feature whose
    foreign-stream leg was missing (VERDICT r14 #5). Scan plan:

      1. DC scan (Ss=0, Se=0, Ah=0, Al=0);
      2. AC first pass at REDUCED precision (Ss=1, Se=63, Ah=0, Al=1):
         each block codes its one AC coefficient as value >> 1
         (truncated toward zero per spec §G.1.2.2);
      3. AC refinement (Ss=1, Se=63, Ah=1, Al=0): per block one EOB
         symbol opening the EOB region, then the §G.1.2.3 correction
         bit for the nonzero-history coefficient.

    Expected pixels are computed by an independent in-test IDCT from
    the FULL-precision coefficients dequantized through the Annex K
    table — a refinement bug (wrong correction-bit order, wrong p1
    scale, EOB-region miscount) shifts whole tiles."""
    dcs_tab = _huff_codes(ANNEX_K_DC_BITS, ANNEX_K_DC_VALS)
    acs_tab = _huff_codes(ANNEX_K_AC_BITS, ANNEX_K_AC_VALS)
    # (DC, AC at zigzag k=1) per block; AC values pick both refinement
    # cases: odd |v| (correction bit 1) and even |v| (bit 0), both signs
    blocks = [(6, 5), (-9, -6), (0, 3), (4, -7)]
    width = 8 * len(blocks)

    zz_quant = bytes(ANNEX_K_LUMA_QUANT[ZIGZAG[k]] for k in range(64))
    dqt = b"\xff\xdb" + struct.pack(">H", 2 + 65) + b"\x00" + zz_quant
    sof = (
        b"\xff\xc2"
        + struct.pack(">HBHHB", 8 + 3, 8, 8, width, 1)
        + bytes([1, 0x11, 0])
    )
    dht_payload = (
        bytes([0x00]) + bytes(ANNEX_K_DC_BITS) + bytes(ANNEX_K_DC_VALS)
        + bytes([0x10]) + bytes(ANNEX_K_AC_BITS) + bytes(ANNEX_K_AC_VALS)
    )
    dht = b"\xff\xc4" + struct.pack(">H", 2 + len(dht_payload)) + dht_payload

    # scan 1: DC at Al=0
    sos1 = b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 0, 0])
    w1 = _Bits()
    pred = 0
    for dc, _ in blocks:
        diff = dc - pred
        pred = dc
        if diff == 0:
            w1.put(*dcs_tab[0])
        else:
            cat = abs(diff).bit_length()
            w1.put(*dcs_tab[cat])
            w1.put((diff if diff > 0 else diff + (1 << cat) - 1) & ((1 << cat) - 1), cat)
    scan1 = w1.done()

    # scan 2: AC first pass at Al=1 — coefficient k=1 coded as v >> 1
    # toward zero, then EOB for the band tail
    sos2 = b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 1, 63, 1])
    w2 = _Bits()
    for _, ac in blocks:
        t = abs(ac) >> 1
        t = t if ac > 0 else -t
        size = abs(t).bit_length()
        w2.put(*acs_tab[size])  # run=0, size
        w2.put((t if t > 0 else t + (1 << size) - 1) & ((1 << size) - 1), size)
        w2.put(*acs_tab[0x00])  # EOB for k=2..63
    scan2 = w2.done()

    # scan 3: AC refinement Ah=1, Al=0 (the SOS approximation byte
    # packs Ah<<4 | Al = 0x10) — EOB region + one correction bit per
    # nonzero-history coefficient (here: exactly k=1)
    sos3 = b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 1, 63, 0x10])
    w3 = _Bits()
    for _, ac in blocks:
        w3.put(*acs_tab[0x00])  # EOB: no new significant coefficients
        w3.put(abs(ac) & 1, 1)  # correction bit for k=1
    scan3 = w3.done()

    payload = (
        b"\xff\xd8" + dqt + sof + dht
        + sos1 + scan1 + sos2 + scan2 + sos3 + scan3 + b"\xff\xd9"
    )
    gw, gh, ch, px = decode_jpeg_pixels(payload)
    assert (gw, gh, ch) == (width, 8, 1)

    # independent IDCT reference over the full-precision coefficients
    m = np.zeros((8, 8))
    for i in range(8):
        c = np.sqrt(0.125) if i == 0 else 0.5
        for j in range(8):
            m[i, j] = c * np.cos((2 * j + 1) * i * np.pi / 16.0)
    img = np.frombuffer(px, dtype=np.uint8).reshape(8, gw)
    for bi, (dc, ac) in enumerate(blocks):
        F = np.zeros((8, 8))
        F[0, 0] = dc * ANNEX_K_LUMA_QUANT[0]
        F[0, 1] = ac * ANNEX_K_LUMA_QUANT[1]  # zigzag k=1 = raster (0,1)
        expect = np.clip(np.round(m.T @ F @ m + 128.0), 0, 255).astype(np.uint8)
        got = img[:, 8 * bi : 8 * (bi + 1)]
        assert (got == expect).all(), (bi, got[0].tolist(), expect[0].tolist())


# ---------------------------------------------------------------------------
# PngSuite-style grid: every legal color-type x depth x interlace combo
# (VERDICT r14 #5) through one foreign writer.
# ---------------------------------------------------------------------------

_ADAM7 = (  # (x0, y0, dx, dy) per spec §8.2 — independent literal
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)

# spec §11.2.2 legal (color type, bit depth) pairs
_PNG_GRID = [
    (ctype, depth, interlace)
    for ctype, depths in (
        (0, (1, 2, 4, 8, 16)),
        (2, (8, 16)),
        (3, (1, 2, 4, 8)),
        (4, (8, 16)),
        (6, (8, 16)),
    )
    for depth in depths
    for interlace in (0, 1)
]


def _pack_png_row(pixels, depth: int) -> bytes:
    """pixels: list of per-pixel channel tuples in native range."""
    if depth == 8:
        return bytes(v for p in pixels for v in p)
    if depth == 16:
        return b"".join(struct.pack(">H", v) for p in pixels for v in p)
    ppb = 8 // depth
    row = bytearray((len(pixels) * depth + 7) // 8)
    for i, (v,) in enumerate(pixels):
        row[i // ppb] |= v << (8 - depth * (i % ppb + 1))
    return bytes(row)


@pytest.mark.parametrize("ctype,depth,interlace", _PNG_GRID)
def test_png_foreign_grid_decodes(ctype, depth, interlace):
    """30-combination PngSuite-style matrix: one foreign writer (fresh
    §9 forward filter, fresh §8.2 Adam7 split, MSB-first sub-8 packing,
    big-endian 16-bit) across all 15 legal color-type x depth pairs,
    sequential AND interlaced, odd 9x7 dims so every scanline carries
    pad bits at sub-8 depths and Adam7 passes hit partial windows."""
    w, h = 9, 7
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    nmax = (1 << depth) - 1
    plte = b""
    if ctype == 3:
        n_entries = 1 << depth
        plte = bytes((i * 3 + c * 7 + 5) % 256 for i in range(n_entries) for c in range(3))
    img = [
        [
            tuple((x * 7 + y * 13 + c * 5 + 3) % (nmax + 1) for c in range(channels))
            for x in range(w)
        ]
        for y in range(h)
    ]
    bpp = max(1, channels * depth // 8)
    raw = bytearray()
    if interlace == 0:
        rows = [_pack_png_row(img[y], depth) for y in range(h)]
        raw += _filter_rows(rows, bpp, [y % 5 for y in range(h)])
    else:
        for pi, (x0, y0, dx, dy) in enumerate(_ADAM7):
            rows = [
                _pack_png_row([img[y][x] for x in range(x0, w, dx)], depth)
                for y in range(y0, h, dy)
            ]
            rows = [r for r in rows if r]
            if not rows:
                continue
            raw += _filter_rows(rows, bpp, [(pi + ri) % 5 for ri in range(len(rows))])
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    body = _chunk(b"IHDR", ihdr)
    if plte:
        body += _chunk(b"PLTE", plte)
    body += _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b"")
    payload = b"\x89PNG\r\n\x1a\n" + body

    gw, gh, ch, gdepth, px = decode_png_pixels_deep(payload)
    assert (gw, gh) == (w, h)
    if ctype == 3:
        assert (ch, gdepth) == (3, 8)
        expect = b"".join(
            plte[p[0] * 3 : p[0] * 3 + 3] for row in img for p in row
        )
    else:
        assert ch == channels and gdepth == depth
        if depth == 16:
            expect = b"".join(
                struct.pack(">H", v) for row in img for p in row for v in p
            )
        else:  # 8-bit bytes or native-range sub-8 samples, one per byte
            expect = bytes(v for row in img for p in row for v in p)
    assert px == expect
