"""Round-12 operator tests: JPEG restart intervals (DRI/RSTn) and the
feature-tier JPEG leg (VERDICT r11 #4 / #7)."""

from __future__ import annotations

import numpy as np
import pytest


def _block_constant(w: int, h: int, ch: int = 1, seed: int = 7) -> bytes:
    bx = np.arange(w)[None, :] // 8
    by = np.arange(h)[:, None] // 8
    if ch == 1:
        return ((seed + 3 * bx + 5 * by) % 256).astype(np.uint8).tobytes()
    return (
        np.stack([(seed + c + 3 * bx + 5 * by) % 256 for c in range(ch)], axis=-1)
        .astype(np.uint8)
        .tobytes()
    )


def test_jpeg_restart_roundtrip_bit_exact_and_marker_count():
    """Block-constant images are lossless through the restart-bearing
    scan; the marker count is (n_mcus − 1) // interval and the
    modulo-8 sequence wraps on large-enough images."""
    from kassette_server_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_pixels,
    )

    for (w, h, ch, ri) in [
        (16, 16, 1, 1),
        (40, 32, 1, 2),  # 20 MCUs, 9 restarts: wraps past RST7
        (24, 24, 3, 1),
        (48, 40, 3, 3),
        (17, 9, 1, 2),  # partial edge blocks
        (8, 8, 1, 5),  # interval > MCU count: zero markers
    ]:
        px = _block_constant(w, h, ch)
        pay = encode_jpeg_pixels(w, h, px, channels=ch, restart_interval=ri)
        dw, dh, dch, dpx = decode_jpeg_pixels(pay)
        assert (dw, dh, dch, dpx) == (w, h, ch, px)
        n_mcus = ((w + 7) // 8) * ((h + 7) // 8)
        n_rst = sum(pay.count(bytes([0xFF, 0xD0 + i])) for i in range(8))
        assert n_rst == (n_mcus - 1) // ri
    # the wrap case really does reuse RST0
    pay = encode_jpeg_pixels(40, 32, _block_constant(40, 32), restart_interval=2)
    assert pay.count(b"\xff\xd0") == 2  # SOI shares no bytes; RST0 twice


def test_jpeg_restart_decode_equals_plain_decode_on_lossy_pixels():
    """Restarts change the scan's framing, not its math: for ANY
    pixels (including lossy, non-block-constant ones) the decoded
    raster must be identical with and without restarts."""
    from kassette_server_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_pixels,
    )

    rng = np.random.default_rng(42)
    for _ in range(25):
        w = int(rng.integers(8, 64))
        h = int(rng.integers(8, 64))
        ch = int(rng.choice([1, 3]))
        ri = int(rng.integers(1, 6))
        px = rng.integers(0, 256, size=w * h * ch, dtype=np.uint8).tobytes()
        plain = decode_jpeg_pixels(encode_jpeg_pixels(w, h, px, channels=ch))
        rst = decode_jpeg_pixels(
            encode_jpeg_pixels(w, h, px, channels=ch, restart_interval=ri)
        )
        assert plain == rst


def test_jpeg_restart_corruption_fences():
    """Out-of-sequence, missing, or malformed restart structure must
    raise, never smear the raster."""
    from kassette_server_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_pixels,
    )

    w, h = 40, 32
    px = _block_constant(w, h)
    good = encode_jpeg_pixels(w, h, px, restart_interval=1)

    # swap a marker's index: sequence check must catch the lost MCUs
    bad = bytearray(good)
    i = bad.find(bytes([0xFF, 0xD0]), 2)  # skip SOI
    bad[i + 1] = 0xD3
    with pytest.raises(ValueError, match="restart sequence broken"):
        decode_jpeg_pixels(bytes(bad))

    # delete a marker entirely: realignment finds entropy bytes instead
    bad = bytearray(good)
    i = bad.find(bytes([0xFF, 0xD1]))
    del bad[i : i + 2]
    with pytest.raises(ValueError, match="RST"):
        decode_jpeg_pixels(bytes(bad))

    # malformed DRI length
    bad = bytearray(good)
    i = bad.find(bytes([0xFF, 0xDD]))
    bad[i + 3] = 5
    with pytest.raises(ValueError, match="malformed DRI"):
        decode_jpeg_pixels(bytes(bad))

    # restart markers present but DRI absent: the unstuffing bit
    # reader must reject the unexpected marker, not skip it
    bad = bytearray(good)
    i = bad.find(bytes([0xFF, 0xDD]))
    del bad[i : i + 6]
    with pytest.raises(ValueError, match="unexpected marker"):
        decode_jpeg_pixels(bytes(bad))

    # encoder fence
    with pytest.raises(ValueError, match="restart_interval"):
        encode_jpeg_pixels(8, 8, _block_constant(8, 8), restart_interval=-1)


def test_jpeg_restart_segments_independently_decodable():
    """THE scale property restarts buy: each restart segment decodes
    with zero state from its predecessors (DC predictors reset, byte-
    aligned start). Splitting the scan at RSTn markers and decoding
    each chunk as its own single-segment scan must reproduce the
    full-file raster block for block."""
    from kassette_server_spark.operators.multimodal import (
        _BitReader,
        _canonical_codes,
        decode_jpeg_pixels,
        encode_jpeg_pixels,
    )
    from kassette_server_spark.operators import multimodal as mm

    w, h, ri = 40, 32, 2
    px = _block_constant(w, h)
    pay = encode_jpeg_pixels(w, h, px, restart_interval=ri)
    # locate the scan body (after SOS segment) and split at markers
    import re
    import struct

    pos = 2
    scan_start = None
    while pos + 4 <= len(pay):
        marker = pay[pos + 1]
        (length,) = struct.unpack_from(">H", pay, pos + 2)
        if marker == 0xDA:
            scan_start = pos + 2 + length
            break
        pos += 2 + length
    body = pay[scan_start : pay.rfind(b"\xff\xd9")]
    chunks = re.split(b"\xff[\xd0-\xd7]", body)
    n_mcus = ((w + 7) // 8) * ((h + 7) // 8)
    assert len(chunks) == (n_mcus - 1) // ri + 1

    dc_tbl = {
        (code, ln): sym
        for sym, (code, ln) in _canonical_codes(
            list(mm._DC_BITS), list(mm._DC_SYMBOLS)
        ).items()
    }
    ac_tbl = {
        (code, ln): sym
        for sym, (code, ln) in _canonical_codes(
            list(mm._AC_BITS), list(mm._AC_SYMBOLS)
        ).items()
    }
    # decode each chunk independently: fresh reader, fresh DC predictor
    decoded_dc = []
    for chunk in chunks:
        reader = _BitReader(chunk)
        prev = 0
        while True:
            try:
                size = mm._huff_decode(reader, dc_tbl)
            except ValueError:
                break  # chunk exhausted (pad bits)
            prev += mm._extend(reader.bits(size), size)
            decoded_dc.append(prev)
            k = 1
            while k < 64:
                sym = mm._huff_decode(reader, ac_tbl)
                if sym == 0x00:
                    break
                if sym == 0xF0:
                    k += 16
                    continue
                k += (sym >> 4) + 1
                reader.bits(sym & 0x0F)
            if reader.n == 0 and reader.pos >= len(chunk):
                break
    assert len(decoded_dc) == n_mcus
    # cross-check against the full decoder's raster: block (by,bx) has
    # constant value v, DC = 8*(v-128)/8 = v-128 after flat-8 quant
    dw, dh, dch, dpx = decode_jpeg_pixels(pay)
    a = np.frombuffer(dpx, dtype=np.uint8).reshape(h, w)
    expect = [
        int(a[by * 8, bx * 8]) - 128
        for by in range((h + 7) // 8)
        for bx in range((w + 7) // 8)
    ]
    assert decoded_dc == expect


def test_jpeg_channel_stats_closed_form(spark):
    from conftest import SF_SMOKE

    from kassette_server_spark.catalog import load
    from kassette_server_spark.operators.multimodal import jpeg_channel_stats

    df = load(spark, SF_SMOKE, "documents").select("doc_id").limit(20)
    out = {r["doc_id"]: r for r in jpeg_channel_stats(df).collect()}
    for i, r in out.items():
        w, h = 8 + i % 16, 8 + (i * 3) % 12
        bx = np.arange(w)[None, :] // 8
        by = np.arange(h)[:, None] // 8
        assert r["n_px"] == w * h
        for c in range(3):
            expect = int(((i + c + 3 * bx + 5 * by) % 256).sum())
            assert r[f"sum_c{c}"] == expect
            assert r[f"mean_c{c}"] == expect / (w * h)


# ---------------------------------------------------------------------------
# JPEG 4:2:0 chroma subsampling (r12: VERDICT r11 soft-edge (a))
# ---------------------------------------------------------------------------


def _tile_constant(w: int, h: int, seed: int, tile: int = 16) -> np.ndarray:
    tx = np.arange(w)[None, :] // tile
    ty = np.arange(h)[:, None] // tile
    return np.stack(
        [(seed + c + 3 * tx + 5 * ty) % 256 for c in range(3)], axis=-1
    ).astype(np.uint8)


def test_jpeg_420_tile_constant_bit_exact():
    """Per-16x16-tile-constant images survive the full 4:2:0 path
    bit-exactly: the 2x2 box average of a constant is that constant,
    every coded block (4 luma + 2 chroma per MCU) is constant, and
    the flat-8 quant divides the lone DC coefficient exactly."""
    from kassette_server_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_pixels,
    )

    for (w, h, ri) in [
        (16, 16, 0),  # single MCU
        (48, 40, 2),  # 3x3 MCUs with restarts
        (17, 16, 0),  # 1-px partial MCU column
        (16, 17, 1),  # 1-px partial MCU row
        (33, 25, 2),  # partial in both axes
        (1, 1, 0),  # degenerate
    ]:
        px = _tile_constant(w, h, seed=w * 31 + h)
        pay = encode_jpeg_pixels(
            w, h, px.tobytes(), channels=3, restart_interval=ri,
            subsampling="420",
        )
        assert decode_jpeg_pixels(pay) == (w, h, 3, px.tobytes())


def test_jpeg_420_sof_declares_sampling_and_is_smaller():
    """The SOF must declare Y at 2x2 / chroma at 1x1, and on real-sized
    images the subsampled file must be smaller than 4:4:4 (half the
    chroma blocks are coded)."""
    from kassette_server_spark.operators.multimodal import (
        encode_jpeg_pixels,
        parse_jpeg_meta,
    )

    w, h = 64, 64
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()
    p420 = encode_jpeg_pixels(w, h, px, channels=3, subsampling="420")
    p444 = encode_jpeg_pixels(w, h, px, channels=3, subsampling="444")
    assert len(p420) < len(p444)
    meta = parse_jpeg_meta(p420)
    assert (meta["width"], meta["height"], meta["components"]) == (w, h, 3)
    # SOF component bytes: id, (H<<4)|V, quant id
    i = p420.find(b"\xff\xc0")
    comp = p420[i + 4 + 6 :]
    assert comp[1] == 0x22 and comp[4] == 0x11 and comp[7] == 0x11


def test_jpeg_420_luma_full_resolution_on_lossy_content():
    """On arbitrary content the luma plane is coded at full resolution:
    its error is bounded by the flat-8 quantizer alone, identical to
    the 4:4:4 grayscale path on the same plane."""
    from kassette_server_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_pixels,
    )

    rng = np.random.default_rng(11)
    for _ in range(5):
        w = int(rng.integers(8, 49))
        h = int(rng.integers(8, 49))
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        pay = encode_jpeg_pixels(
            w, h, px.tobytes(), channels=3, subsampling="420"
        )
        dw, dh, dch, dpx = decode_jpeg_pixels(pay)
        got = np.frombuffer(dpx, np.uint8).reshape(h, w, 3)
        gray = decode_jpeg_pixels(
            encode_jpeg_pixels(w, h, px[:, :, 0].tobytes(), channels=1)
        )[3]
        assert got[:, :, 0].tobytes() == gray


def test_jpeg_420_restart_framing_is_pure_framing():
    """Restarts must not change 4:2:0 decode output on any content."""
    from kassette_server_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_pixels,
    )

    rng = np.random.default_rng(23)
    for _ in range(8):
        w = int(rng.integers(1, 64))
        h = int(rng.integers(1, 64))
        ri = int(rng.integers(1, 4))
        px = rng.integers(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()
        plain = decode_jpeg_pixels(
            encode_jpeg_pixels(w, h, px, channels=3, subsampling="420")
        )
        rst = decode_jpeg_pixels(
            encode_jpeg_pixels(
                w, h, px, channels=3, subsampling="420", restart_interval=ri
            )
        )
        assert plain == rst


def test_jpeg_420_fences():
    """Encoder and decoder refuse what they don't support, loudly."""
    from kassette_server_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_pixels,
    )

    with pytest.raises(ValueError, match="3 components"):
        encode_jpeg_pixels(8, 8, bytes(64), channels=1, subsampling="420")
    # 4:2:2 became a supported mode in q252 and 4:1:1 in q256 (r13);
    # 4:4:0 (vertical-only halving) is the still-refused layout the
    # encoder fence now guards.
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg_pixels(8, 8, bytes(192), channels=3, subsampling="440")
    # and 4:2:2 itself round-trips bit-exactly on tile-constant rasters
    px = _tile_constant(32, 32, seed=5).tobytes()
    pay422 = encode_jpeg_pixels(32, 32, px, channels=3, subsampling="422")
    w, h, c, out = decode_jpeg_pixels(pay422)
    assert (w, h, c) == (32, 32, 3) and out == px

    # decoder: rewrite a 4:2:0 SOF to declare 1x4 (inverted 4:1:1 —
    # vertical quartering is not a supported layout) — must refuse
    pay = bytearray(
        encode_jpeg_pixels(32, 32, px, channels=3, subsampling="420")
    )
    i = pay.find(b"\xff\xc0")
    assert pay[i + 4 + 6 + 1] == 0x22
    pay[i + 4 + 6 + 1] = 0x14  # H=1, V=4 — unsupported
    with pytest.raises(ValueError, match="sampling"):
        decode_jpeg_pixels(bytes(pay))
    # chroma at 2x2 alongside luma 2x2 is uniform (fine); chroma at
    # 2x2 with luma 1x1 would invert the ratio — must refuse
    pay = bytearray(
        encode_jpeg_pixels(32, 32, px, channels=3, subsampling="444")
    )
    i = pay.find(b"\xff\xc0")
    pay[i + 4 + 6 + 4] = 0x22  # component 2 upsampled above luma
    with pytest.raises(ValueError, match="sampling"):
        decode_jpeg_pixels(bytes(pay))


def test_jpeg_420_fuzz_tile_constant_roundtrip():
    """Seeded fuzz: random tile-constant rasters (arbitrary dims,
    random tile values, random restart intervals) must all round-trip
    bit-exactly through the 4:2:0 path."""
    from kassette_server_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_pixels,
    )

    for seed in range(60):
        rng = np.random.default_rng(seed)
        w = int(rng.integers(1, 80))
        h = int(rng.integers(1, 80))
        tw = (w + 15) // 16
        th = (h + 15) // 16
        tiles = rng.integers(0, 256, size=(th, tw, 3), dtype=np.uint8)
        px = np.repeat(np.repeat(tiles, 16, axis=0), 16, axis=1)[:h, :w]
        ri = int(rng.integers(0, 4))
        pay = encode_jpeg_pixels(
            w, h, px.tobytes(), channels=3, restart_interval=ri,
            subsampling="420",
        )
        assert decode_jpeg_pixels(pay) == (w, h, 3, px.tobytes()), seed


# ---------------------------------------------------------------------------
# Non-8-bit PNG depths (r12: VERDICT r11 soft-edge (b))
# ---------------------------------------------------------------------------


def test_png_16bit_roundtrip_all_filters_and_channels():
    """16-bit samples survive every filter type at every channel
    count: §9 filters run over BYTES at a 2·channels unit, never over
    words."""
    from kassette_server_spark.operators.multimodal import (
        decode_png_pixels_deep,
        encode_png_deep,
    )

    rng = np.random.default_rng(2)
    for ch in (1, 2, 3, 4):
        for _ in range(4):
            w, h = int(rng.integers(1, 40)), int(rng.integers(1, 40))
            be = (
                rng.integers(0, 65536, size=(h, w, ch), dtype=np.uint16)
                .astype(">u2")
                .tobytes()
            )
            for filters in (None, [0] * h, [4] * h, [3] * h):
                pay = encode_png_deep(w, h, be, 16, channels=ch, filters=filters)
                assert decode_png_pixels_deep(pay) == (w, h, ch, 16, be)


def test_png_16bit_adam7_roundtrip():
    """16-bit Adam7: seven passes at a wide filter unit, incl. the
    degenerate dims where passes go empty."""
    from kassette_server_spark.operators.multimodal import (
        decode_png_pixels_deep,
        encode_png_deep,
    )

    rng = np.random.default_rng(3)
    for ch in (1, 3):
        for dims in [(1, 1), (1, 9), (9, 1), (5, 3)] + [
            (int(rng.integers(2, 48)), int(rng.integers(2, 48))) for _ in range(6)
        ]:
            w, h = dims
            be = (
                rng.integers(0, 65536, size=(h, w, ch), dtype=np.uint16)
                .astype(">u2")
                .tobytes()
            )
            pay = encode_png_deep(w, h, be, 16, channels=ch, interlace=True)
            assert decode_png_pixels_deep(pay) == (w, h, ch, 16, be), dims


def test_png_sub8_roundtrip_native_range():
    """1/2/4-bit grayscale: MSB-first packing, zero pad bits, filters
    over the packed bytes; decode returns NATIVE-range samples."""
    from kassette_server_spark.operators.multimodal import (
        decode_png_pixels_deep,
        encode_png_deep,
    )

    rng = np.random.default_rng(4)
    for d in (1, 2, 4):
        for _ in range(8):
            # widths straddling byte boundaries exercise pad bits
            w, h = int(rng.integers(1, 50)), int(rng.integers(1, 50))
            s = rng.integers(0, 1 << d, size=(h, w), dtype=np.uint8)
            pay = encode_png_deep(w, h, s.tobytes(), d)
            assert decode_png_pixels_deep(pay) == (w, h, 1, d, s.tobytes())


def test_png_sub8_palette_expands_through_plte():
    from kassette_server_spark.operators.multimodal import (
        decode_png_pixels_deep,
        encode_png_deep,
    )

    rng = np.random.default_rng(6)
    for d in (1, 2, 4):
        n = 1 << d
        pal = rng.integers(0, 256, size=n * 3, dtype=np.uint8).tobytes()
        w, h = 19, 7
        s = rng.integers(0, n, size=(h, w), dtype=np.uint8)
        pay = encode_png_deep(w, h, s.tobytes(), d, palette=pal)
        gw, gh, gch, gd, px = decode_png_pixels_deep(pay)
        tab = np.frombuffer(pal, np.uint8).reshape(-1, 3)
        assert (gw, gh, gch, gd) == (w, h, 3, 8)
        assert px == tab[s.reshape(-1)].tobytes()


def test_png_deep_depth8_delegates():
    from kassette_server_spark.operators.multimodal import (
        decode_png_pixels_deep,
        encode_png_filtered,
    )

    rng = np.random.default_rng(8)
    px = rng.integers(0, 256, size=11 * 6 * 3, dtype=np.uint8).tobytes()
    pay = encode_png_filtered(11, 6, px, channels=3)
    assert decode_png_pixels_deep(pay) == (11, 6, 3, 8, px)


def test_png_deep_fences():
    from kassette_server_spark.operators.multimodal import (
        decode_png_pixels_deep,
        encode_png_deep,
    )

    with pytest.raises(ValueError, match="16-bit palette"):
        encode_png_deep(4, 4, bytes(32), 16, palette=bytes(12))
    with pytest.raises(ValueError, match="single-channel"):
        encode_png_deep(4, 4, bytes(32), 4, channels=2)
    with pytest.raises(ValueError, match="range"):
        encode_png_deep(4, 4, bytes([9] * 16), 2)
    with pytest.raises(ValueError, match="Adam7"):
        encode_png_deep(4, 4, bytes(16), 4, interlace=True)
    with pytest.raises(ValueError, match="depths 1/2/4/16"):
        encode_png_deep(4, 4, bytes(16), 8)
    # decoder fence: a 3-bit depth IHDR must refuse (invalid per spec,
    # but the stream length math can accidentally align)
    good = encode_png_deep(8, 4, bytes(32), 4)
    bad = bytearray(good)
    assert bad[24] == 4  # IHDR bit depth byte
    import struct as _s
    import zlib as _z

    bad[24] = 8  # lie: claim 8-bit; stream length check must catch it
    bad[29:33] = _s.pack(">I", _z.crc32(bytes(bad[12:29])))
    with pytest.raises(ValueError):
        decode_png_pixels_deep(bytes(bad))


# ---------------------------------------------------------------------------
# G.711 companding + IMA ADPCM (r12 audio codec tier)
# ---------------------------------------------------------------------------


def test_g711_known_anchors_and_canonical_form():
    """Public G.711 anchors: μ-law(+0) = 0xFF, A-law(+0) = 0xD5.
    encode(decode(b)) == b for every byte — except μ-law's negative
    zero 0x7F, which decodes to 0 and re-encodes as +0 (the spec's
    one non-canonical code)."""
    from kassette_server_spark.operators.multimodal import (
        alaw_decode,
        alaw_encode,
        mulaw_decode,
        mulaw_encode,
    )

    assert mulaw_encode(np.array([0], np.int16))[0] == 0xFF
    assert alaw_encode(np.array([0], np.int16))[0] == 0xD5
    b = np.arange(256, dtype=np.uint8)
    bad_mu = np.nonzero(mulaw_encode(mulaw_decode(b)) != b)[0]
    assert list(bad_mu) == [0x7F]
    assert mulaw_decode(np.array([0x7F], np.uint8))[0] == 0
    assert np.array_equal(alaw_encode(alaw_decode(b)), b)


def test_g711_full_range_error_bounds_and_monotonicity():
    """Both laws over every int16 value: decode is monotone
    nondecreasing in the sample and quantization error never exceeds
    half the top-segment step (μ-law ≤ 644 incl. bias effects,
    A-law ≤ 512)."""
    from kassette_server_spark.operators.multimodal import (
        alaw_decode,
        alaw_encode,
        mulaw_decode,
        mulaw_encode,
    )

    s = np.arange(-32768, 32768, dtype=np.int16)
    md = mulaw_decode(mulaw_encode(s)).astype(np.int64)
    ad = alaw_decode(alaw_encode(s)).astype(np.int64)
    assert np.abs(md - s).max() <= 644
    assert np.abs(ad - s).max() <= 512
    assert np.all(np.diff(md) >= 0)
    assert np.all(np.diff(ad) >= 0)


def test_ima_adpcm_decode_is_encoder_predictor_walk():
    """decode(encode(x)) must equal the encoder's internal predictor
    sequence exactly — the invariant the recursive-CTE oracle relies
    on — across random lengths, odd counts (padded nibble), and
    nonzero initial state."""
    from kassette_server_spark.operators.multimodal import (
        ima_adpcm_decode,
        ima_adpcm_encode,
    )

    rng = np.random.default_rng(9)
    for _ in range(15):
        n = int(rng.integers(1, 130))
        s = rng.integers(-32768, 32768, size=n).astype(np.int16)
        p0 = int(rng.integers(-1000, 1000))
        i0 = int(rng.integers(0, 89))
        packed, fpred, fidx = ima_adpcm_encode(s, pred=p0, index=i0)
        assert len(packed) == (n + 1) // 2
        dec = ima_adpcm_decode(packed, n, pred=p0, index=i0)
        assert int(dec[-1]) == fpred
        assert 0 <= fidx <= 88


def test_ima_adpcm_tracks_smooth_signals():
    """On a band-limited signal the 4-bit codec tracks within the
    adaptive step (no runaway drift)."""
    from kassette_server_spark.operators.multimodal import (
        ima_adpcm_decode,
        ima_adpcm_encode,
    )

    t = np.arange(512)
    s = (3000 * np.sin(t / 10)).astype(np.int16)
    packed, _, _ = ima_adpcm_encode(s)
    dec = ima_adpcm_decode(packed, 512)
    assert np.abs(dec.astype(int) - s.astype(int)).max() < 2000


def test_ima_adpcm_fences():
    from kassette_server_spark.operators.multimodal import (
        ima_adpcm_decode,
        ima_adpcm_encode,
    )

    with pytest.raises(ValueError, match="step index"):
        ima_adpcm_encode([0], index=89)
    with pytest.raises(ValueError, match="step index"):
        ima_adpcm_decode(b"\x00", 1, index=-1)
    with pytest.raises(ValueError, match="not enough codes"):
        ima_adpcm_decode(b"\x00", 3)


# ---------------------------------------------------------------------------
# Progressive JPEG (r12 late: the LAST refused JPEG mode)
# ---------------------------------------------------------------------------


def test_jpeg_progressive_equals_baseline_on_any_content():
    """Progressive reorders the scan, not the math: for ANY pixels the
    SOF2 decode must be byte-identical to the SOF0 decode (same
    quantized coefficients)."""
    from kassette_server_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_pixels,
        encode_jpeg_progressive_pixels,
    )

    rng = np.random.default_rng(31)
    for _ in range(20):
        w, h = int(rng.integers(1, 64)), int(rng.integers(1, 64))
        ch = int(rng.choice([1, 3]))
        px = rng.integers(0, 256, size=w * h * ch, dtype=np.uint8).tobytes()
        base = decode_jpeg_pixels(encode_jpeg_pixels(w, h, px, channels=ch))
        prog = decode_jpeg_pixels(
            encode_jpeg_progressive_pixels(w, h, px, channels=ch)
        )
        assert base == prog


def test_jpeg_progressive_block_constant_bit_exact_and_scan_count():
    from kassette_server_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_progressive_pixels,
        parse_jpeg_meta,
    )

    for i in (0, 5, 17, 99):
        w, h = 8 + i % 24, 8 + (i * 3) % 16
        px = _block_constant(w, h, ch=3, seed=i)
        pay = encode_jpeg_progressive_pixels(w, h, px, channels=3)
        assert parse_jpeg_meta(pay)["progressive"] is True
        assert pay.count(b"\xff\xda") == 4  # DC + 3 AC scans
        assert decode_jpeg_pixels(pay) == (w, h, 3, px)


def test_jpeg_progressive_dc_prefix_is_a_preview():
    """Truncating the file after the DC scan (plus EOI) must still
    decode — to the per-block DC approximation. This is the transport
    property progressive exists for: triage from the first bytes."""
    from kassette_server_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_progressive_pixels,
    )

    rng = np.random.default_rng(37)
    w, h = 24, 16
    px = rng.integers(0, 256, size=w * h, dtype=np.uint8).tobytes()
    pay = encode_jpeg_progressive_pixels(w, h, px, channels=1)
    first = pay.find(b"\xff\xda")
    second = pay.find(b"\xff\xda", first + 2)
    prefix = pay[:second] + b"\xff\xd9"
    dw, dh, dch, dpx = decode_jpeg_pixels(prefix, allow_partial=True)
    assert (dw, dh, dch) == (w, h, 1)
    blocks = np.frombuffer(dpx, np.uint8).reshape(h // 8, 8, w // 8, 8)
    assert (blocks == blocks[:, :1, :, :1]).all()  # per-block constant


def test_jpeg_progressive_eoi_band_omission_decodes_by_default():
    """ADVICE r14: a stream that ends in EOI but never scans some AC
    bands is spec-legal encoder choice (T.81 band omission — DC-only
    previews being the canonical case); it must decode WITHOUT
    ``allow_partial``, identically to the opt-in path, with the omitted
    bands reconstructed as zeros. Truncation (missing EOI) must still
    raise by default."""
    import pytest

    from kassette_server_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_progressive_pixels,
    )

    rng = np.random.default_rng(41)
    w, h = 24, 16
    px = rng.integers(0, 256, size=w * h, dtype=np.uint8).tobytes()
    pay = encode_jpeg_progressive_pixels(w, h, px, channels=1)
    first = pay.find(b"\xff\xda")
    second = pay.find(b"\xff\xda", first + 2)
    dc_only = pay[:second] + b"\xff\xd9"  # EOI'd: intentional omission
    assert decode_jpeg_pixels(dc_only) == decode_jpeg_pixels(
        dc_only, allow_partial=True
    )
    with pytest.raises(
        ValueError, match="unterminated progressive scan|missing EOI"
    ):
        decode_jpeg_pixels(pay[:second])  # truncated: still data loss


def test_jpeg_progressive_eobrun_spans_blocks():
    """A mostly-empty image makes consecutive all-zero AC bands; the
    decoder's EOBRUN counter must skip them without consuming bits."""
    from kassette_server_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_progressive_pixels,
    )

    w, h = 64, 64  # 64 blocks, constant image → every AC band empty
    px = bytes([77] * (w * h))
    pay = encode_jpeg_progressive_pixels(w, h, px, channels=1)
    assert decode_jpeg_pixels(pay) == (w, h, 1, px)


def test_jpeg_progressive_fences():
    from kassette_server_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_progressive_pixels,
    )

    with pytest.raises(ValueError, match="channels"):
        encode_jpeg_progressive_pixels(4, 4, bytes(32), channels=2)
    # truncated mid-scan must raise, not return garbage
    px = _block_constant(24, 16, ch=3, seed=3)
    pay = encode_jpeg_progressive_pixels(24, 16, px, channels=3)
    cut = pay[: pay.find(b"\xff\xda", pay.find(b"\xff\xda") + 2) + 20]
    with pytest.raises(ValueError):
        decode_jpeg_pixels(cut)


def test_r12_codecs_run_in_structured_streaming(spark):
    """The r12-late codec shapes are stateless mapInPandas like the
    rest of the tier — the SAME operator runs unchanged over a
    streaming source; stream output must equal the batch run
    row-for-row (here: the 4:2:0 tier, the most structurally novel
    shape of the wave)."""
    from conftest import SF_SMOKE

    from kassette_server_spark.catalog import load
    from kassette_server_spark.operators.multimodal import (
        jpeg_420_roundtrip_stats,
    )

    batch = {
        tuple(r)
        for r in jpeg_420_roundtrip_stats(
            load(spark, SF_SMOKE, "documents").select("doc_id").limit(64)
        ).collect()
    }
    stream = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .option("pathGlobFilter", "documents.parquet")
        .parquet(SF_SMOKE)
        .select("doc_id")
        .limit(64)
    )
    q = (
        jpeg_420_roundtrip_stats(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("jpeg420_stream_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        tuple(r)
        for r in spark.sql(
            "SELECT doc_id, width, height, n_mcus, sum_c0, sum_c1, sum_c2 "
            "FROM jpeg420_stream_out"
        ).collect()
    }
    assert got == batch and got


def test_jpeg_422_tile_constant_bit_exact_and_fuzz():
    """4:2:2: per-16x8-tile-constant images are lossless (the 2:1
    horizontal box average of a constant pair is that constant);
    seeded fuzz over random tile values, dims, restart intervals."""
    from kassette_server_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_pixels,
    )

    for seed in range(40):
        rng = np.random.default_rng(1000 + seed)
        w = int(rng.integers(1, 70))
        h = int(rng.integers(1, 40))
        tw, th = (w + 15) // 16, (h + 7) // 8
        tiles = rng.integers(0, 256, size=(th, tw, 3), dtype=np.uint8)
        px = np.repeat(np.repeat(tiles, 8, axis=0), 16, axis=1)[:h, :w]
        ri = int(rng.integers(0, 4))
        pay = encode_jpeg_pixels(
            w, h, px.tobytes(), channels=3, restart_interval=ri,
            subsampling="422",
        )
        assert decode_jpeg_pixels(pay) == (w, h, 3, px.tobytes()), seed


def test_jpeg_422_luma_full_resolution_and_sof_bytes():
    from kassette_server_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_pixels,
    )

    rng = np.random.default_rng(77)
    w, h = 29, 13
    px3 = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    pay = encode_jpeg_pixels(w, h, px3.tobytes(), channels=3, subsampling="422")
    got = np.frombuffer(decode_jpeg_pixels(pay)[3], np.uint8).reshape(h, w, 3)
    gray = decode_jpeg_pixels(
        encode_jpeg_pixels(w, h, px3[:, :, 0].tobytes(), channels=1)
    )[3]
    assert got[:, :, 0].tobytes() == gray
    i = pay.find(b"\xff\xc0")
    assert pay[i + 4 + 6 + 1] == 0x21  # luma 2x1
    assert pay[i + 4 + 6 + 4] == 0x11 and pay[i + 4 + 6 + 7] == 0x11


# ---------------------------------------------------------------------------
# Compressed WAV containers (r12 late)
# ---------------------------------------------------------------------------


def test_wav_compressed_roundtrips_match_raw_codecs():
    """Container round trips must equal the raw-codec paths exactly:
    G.711 bytes verbatim; IMA block-framed with per-header predictor
    re-seed and carried step index."""
    from kassette_server_spark.operators.multimodal import (
        alaw_decode,
        alaw_encode,
        decode_wav_compressed,
        encode_wav_compressed,
        ima_adpcm_decode,
        ima_adpcm_encode,
        mulaw_decode,
        mulaw_encode,
        parse_wav_meta_ext,
    )

    rng = np.random.default_rng(8)
    for _ in range(10):
        n = int(rng.integers(1, 300))
        s = rng.integers(-32768, 32768, size=n).astype(np.int16)
        for codec in ("alaw", "mulaw", "ima"):
            pay = encode_wav_compressed(s, codec=codec, block_align=12)
            meta = parse_wav_meta_ext(pay)
            assert meta["n_samples"] == n
            dec = decode_wav_compressed(pay)
            if codec == "alaw":
                assert np.array_equal(dec, alaw_decode(alaw_encode(s)))
            elif codec == "mulaw":
                assert np.array_equal(dec, mulaw_decode(mulaw_encode(s)))
            else:
                spb, out, idx = 17, [], 0
                for b0 in range(0, n, spb):
                    first = int(s[b0])
                    out.append(first)
                    chunk = s[b0 + 1 : b0 + spb]
                    packed, _, idx2 = ima_adpcm_encode(chunk, pred=first, index=idx)
                    if len(chunk):
                        out.extend(
                            ima_adpcm_decode(
                                packed, len(chunk), pred=first, index=idx
                            ).tolist()
                        )
                    idx = idx2
                assert dec.tolist() == out


def test_wav_ima_blocks_decode_independently():
    """Each IMA block's header re-seeds the predictor, so decoding any
    SINGLE block in isolation (fresh file with just that block and its
    header) reproduces the full decode's samples for that span — the
    parallel-decode property."""
    import struct as _s

    from kassette_server_spark.operators.multimodal import (
        decode_wav_compressed,
        encode_wav_compressed,
    )

    rng = np.random.default_rng(10)
    n = 17 * 4  # four full blocks at block_align=12
    s = rng.integers(-32768, 32768, size=n).astype(np.int16)
    pay = encode_wav_compressed(s, codec="ima", block_align=12)
    full = decode_wav_compressed(pay)
    # extract the data chunk
    pos = 12
    while pay[pos : pos + 4] != b"data":
        (length,) = _s.unpack_from("<I", pay, pos + 4)
        pos += 8 + length + (length & 1)
    data = pay[pos + 8 :]
    for b in range(4):
        block = data[b * 12 : (b + 1) * 12]
        first, index, _ = _s.unpack_from("<hBB", block, 0)
        # a standalone file containing just this block
        single = encode_wav_compressed(
            full[b * 17 : (b + 1) * 17], codec="ima", block_align=12
        )
        # decoding the block's nibbles with its header state matches
        from kassette_server_spark.operators.multimodal import ima_adpcm_decode

        got = [first] + ima_adpcm_decode(
            block[4:], 16, pred=first, index=index
        ).tolist()
        assert got == full[b * 17 : (b + 1) * 17].tolist()


def test_wav_compressed_fences():
    import struct as _s

    from kassette_server_spark.operators.multimodal import (
        decode_wav_compressed,
        encode_wav_compressed,
        parse_wav_meta_ext,
    )

    s = np.zeros(40, dtype=np.int16)
    with pytest.raises(ValueError, match="codec"):
        encode_wav_compressed(s, codec="mp3")
    with pytest.raises(ValueError, match="block_align"):
        encode_wav_compressed(s, codec="ima", block_align=4)
    with pytest.raises(ValueError, match="at least one"):
        encode_wav_compressed(np.zeros(0, dtype=np.int16))
    pay = bytearray(encode_wav_compressed(s, codec="ima", block_align=12))
    # corrupt a block header's step index beyond 88
    pos = 12
    while pay[pos : pos + 4] != b"data":
        (length,) = _s.unpack_from("<I", bytes(pay), pos + 4)
        pos += 8 + length + (length & 1)
    pay[pos + 8 + 2] = 200
    with pytest.raises(ValueError, match="step index"):
        decode_wav_compressed(bytes(pay))
    # fact chunk claiming more samples than the blocks can carry
    pay = bytearray(encode_wav_compressed(s, codec="ima", block_align=12))
    i = bytes(pay).find(b"fact")
    pay[i + 8 : i + 12] = _s.pack("<I", 10_000)
    with pytest.raises(ValueError, match="fact sample count"):
        parse_wav_meta_ext(bytes(pay))


def test_jpeg_single_component_sampling_factors_ignored():
    """Spec A.2: a one-component scan is non-interleaved (one 8x8 block
    per MCU, raster order) and sampling factors are ignored. A grayscale
    JPEG whose SOF declares H=V=2 must decode identically to the 1x1
    declaration, not through the interleaved four-block MCU geometry
    (ADVICE r12)."""
    from kassette_server_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_pixels,
    )

    # 16x16 per-8x8-block-constant grayscale: 4 blocks, so a wrongly
    # interleaved 2x2 reading would have exactly the block count it
    # needs to mis-order silently.
    bx = np.arange(16)[None, :] // 8
    by = np.arange(16)[:, None] // 8
    px = ((5 + 3 * bx + 5 * by) % 256).astype(np.uint8).tobytes()
    pay = bytearray(encode_jpeg_pixels(16, 16, px, channels=1))
    i = pay.find(b"\xff\xc0")
    assert pay[i + 4 + 6 + 1] == 0x11
    pay[i + 4 + 6 + 1] = 0x22  # declare H=V=2 on the lone component
    w, h, c, out = decode_jpeg_pixels(bytes(pay))
    assert (w, h, c) == (16, 16, 1)
    assert out == px


def test_jpeg_progressive_420_dc_prefix_previews_and_streaming_parity(spark):
    """r13 companions for q257/q254:

    (a) the DC-prefix transport property survives subsampling — a
        progressive-4:2:0 file truncated after its interleaved DC scan
        still decodes, and the LUMA plane is per-8x8-block constant
        (chroma blocks cover 16x16 after upsample);
    (b) the q254 compressed-audio feature operator is a stateless
        mapInPandas like the rest of the codec tier: the SAME operator
        over a streaming source equals the batch run row-for-row.
    """
    import numpy as np

    from conftest import SF_SMOKE

    from kassette_server_spark.catalog import load
    from kassette_server_spark.operators.multimodal import (
        compressed_audio_frame_features,
        decode_jpeg_pixels,
        encode_jpeg_progressive_pixels,
    )

    rng = np.random.default_rng(53)
    w, h = 32, 32
    px = rng.integers(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()
    pay = encode_jpeg_progressive_pixels(
        w, h, px, channels=3, subsampling="420"
    )
    first = pay.find(b"\xff\xda")
    second = pay.find(b"\xff\xda", first + 2)
    prefix = pay[:second] + b"\xff\xd9"
    dw, dh, dch, dpx = decode_jpeg_pixels(prefix, allow_partial=True)
    assert (dw, dh, dch) == (w, h, 3)
    luma = np.frombuffer(dpx, np.uint8).reshape(h, w, 3)[:, :, 0]
    blocks = luma.reshape(h // 8, 8, w // 8, 8)
    assert (blocks == blocks[:, :1, :, :1]).all()

    batch = {
        tuple(r)
        for r in compressed_audio_frame_features(
            load(spark, SF_SMOKE, "documents").select("doc_id").limit(48)
        ).collect()
    }
    stream = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .option("pathGlobFilter", "documents.parquet")
        .parquet(SF_SMOKE)
        .select("doc_id")
        .limit(48)
    )
    q = (
        compressed_audio_frame_features(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("caff_stream_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        tuple(r)
        for r in spark.sql(
            "SELECT doc_id, codec, frame_id, n_samples, sum_abs, sum_sq, "
            "zero_crossings FROM caff_stream_out"
        ).collect()
    }
    assert got == batch and got
