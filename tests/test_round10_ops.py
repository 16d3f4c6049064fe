"""Round-10 operators: PNG pixel decode (full de-filter), PNG
nearest-neighbor resize, and the q230 stats surface."""

from __future__ import annotations

import struct
import zlib

import pytest


def _png_with_filters(width, height, rows_with_filters):
    """Build a grayscale PNG whose scanlines carry EXPLICIT filter
    types — exercising de-filter paths encode_png (always filter 0)
    never emits. ``rows_with_filters``: [(ftype, filtered_bytes)]."""
    from kassette_server_spark.operators.multimodal import PNG_SIG

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">II5B", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(bytes([f]) + bytes(line) for f, line in rows_with_filters)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_png_decode_roundtrip_filter0():
    """encode_png (filter 0) → decode_png_pixels is pixel identity."""
    from kassette_server_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png,
    )

    px = bytes((3 * i + 7) % 256 for i in range(6 * 4))
    w, h, out = decode_png_pixels(encode_png(6, 4, px))
    assert (w, h) == (6, 4) and out == px


def test_png_defilter_sub_up_average_paeth():
    """Hand-filtered scanlines reconstruct to hand-computed pixels —
    each of the four non-trivial PNG filters verified against the spec
    §9 recurrences computed independently here."""
    from kassette_server_spark.operators.multimodal import decode_png_pixels

    # target image 4x5, deterministic but non-trivial pixels
    w, h = 4, 5
    target = [[(13 * y * y + 7 * x + (x * y) % 5) % 256 for x in range(w)] for y in range(h)]

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    # forward-filter each row with a DIFFERENT filter type
    ftypes = [0, 1, 2, 3, 4]
    rows = []
    for y, ft in enumerate(ftypes):
        line = []
        for x in range(w):
            cur = target[y][x]
            a = target[y][x - 1] if x > 0 else 0
            b = target[y - 1][x] if y > 0 else 0
            c = target[y - 1][x - 1] if (x > 0 and y > 0) else 0
            if ft == 0:
                line.append(cur)
            elif ft == 1:
                line.append((cur - a) & 0xFF)
            elif ft == 2:
                line.append((cur - b) & 0xFF)
            elif ft == 3:
                line.append((cur - (a + b) // 2) & 0xFF)
            else:
                line.append((cur - paeth(a, b, c)) & 0xFF)
        rows.append((ft, line))

    dw, dh, out = decode_png_pixels(_png_with_filters(w, h, rows))
    assert (dw, dh) == (w, h)
    assert list(out) == [p for row in target for p in row]


def test_png_decode_concatenates_split_idat():
    """The pixel stream may arrive as MANY IDAT chunks split at
    arbitrary byte boundaries (PNG spec §5.6) — the decoder must
    concatenate before inflating, not inflate per chunk."""
    from kassette_server_spark.operators.multimodal import (
        PNG_SIG,
        decode_png_pixels,
        encode_png,
    )

    px = bytes((5 * i + 1) % 256 for i in range(6 * 3))
    whole = encode_png(6, 3, px)
    # rebuild with the single IDAT split into 3-byte chunks
    (ihdr_len,) = struct.unpack_from(">I", whole, 8)
    idat_start = 8 + 12 + ihdr_len
    (idat_len,) = struct.unpack_from(">I", whole, idat_start)
    idat = whole[idat_start + 8 : idat_start + 8 + idat_len]

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    split = whole[: idat_start] + b"".join(
        chunk(b"IDAT", idat[i : i + 3]) for i in range(0, len(idat), 3)
    ) + chunk(b"IEND", b"")
    assert split[:8] == PNG_SIG
    w, h, out = decode_png_pixels(split)
    assert (w, h) == (6, 3) and out == px


def test_png_decode_rejects_unknown_filter():
    from kassette_server_spark.operators.multimodal import decode_png_pixels

    bad = _png_with_filters(2, 1, [(7, [1, 2])])
    with pytest.raises(ValueError, match="filter type"):
        decode_png_pixels(bad)


def test_png_resize_hand_pixels():
    """4x4 → 2x2 nearest neighbor: dst(x,y) = src(2x, 2y) — the four
    even-coordinate pixels, verified by hand through the full
    inflate → de-filter → resize → deflate → decode round trip."""
    from kassette_server_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png,
        parse_png_meta,
        resize_png_payload,
    )

    src = bytes(range(16))  # px(x,y) = 4y + x
    rz = resize_png_payload(encode_png(4, 4, src), 2, 2)
    meta = parse_png_meta(rz)
    assert (meta["width"], meta["height"]) == (2, 2)
    _, _, out = decode_png_pixels(rz)
    assert list(out) == [0, 2, 8, 10]  # src(0,0) src(2,0) src(0,2) src(2,2)


def test_png_resize_upscale_and_validation():
    from kassette_server_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png,
        resize_png_payload,
    )

    # 2x1 → 4x1 upscale repeats each source pixel twice (x*2//4 = x//2)
    rz = resize_png_payload(encode_png(2, 1, bytes([10, 200])), 4, 1)
    assert list(decode_png_pixels(rz)[2]) == [10, 10, 200, 200]
    with pytest.raises(ValueError, match="positive"):
        resize_png_payload(encode_png(2, 1, bytes([1, 2])), 0, 1)


def test_png_resize_stats_matches_closed_form(spark):
    """The q230 surface at tiny scale: px_sum equals the closed-form
    nearest-neighbor sum computed independently in Python."""
    from kassette_server_spark.operators.multimodal import png_resize_stats

    ids = [0, 1, 5, 17, 31]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    out = {r.doc_id: r for r in png_resize_stats(df).collect()}
    for i in ids:
        w, h = 8 + i % 16, 8 + (i * 3) % 12
        nw, nh = w // 2, h // 2
        expect = sum(
            (i + 3 * (x * w // nw) + 5 * (y * h // nh)) % 256
            for y in range(nh)
            for x in range(nw)
        )
        assert (out[i].width, out[i].height) == (nw, nh)
        assert out[i].px_sum == expect, i
