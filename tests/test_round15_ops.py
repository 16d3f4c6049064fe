"""Round-15 operator tests: the MJPEG-in-AVI video codec
(VERDICT r14 "Next round #3" — the package's last NotImplementedError
plug point becomes a real codec).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from kassette_server_spark.operators.multimodal import (
    AVI_FOURCC,
    _riff_chunk,
    decode_avi_frames,
    encode_avi_mjpeg,
    encode_jpeg_pixels,
    parse_avi_meta,
)


def _block_frames(i: int, w: int, h: int, nf: int) -> list[bytes]:
    """q259's id-formula rasters: per-8x8-block-constant grayscale."""
    return [
        (
            (
                i
                + 7 * f
                + 3 * (np.arange(w)[None, :] // 8)
                + 5 * (np.arange(h)[:, None] // 8)
            )
            % 256
        )
        .astype(np.uint8)
        .tobytes()
        for f in range(nf)
    ]


def test_avi_mjpeg_round_trip_bit_exact():
    """Block-constant frames survive the full container + entropy path
    bit-exactly (q233's lossless-subset identity, per frame)."""
    for i in (0, 3, 17, 99):
        w, h = 8 + i % 16, 8 + (i * 3) % 12
        frames = _block_frames(i, w, h, 2 + i % 3)
        pay = encode_avi_mjpeg(w, h, frames, fps=10, channels=1)
        dec = decode_avi_frames(pay, every_n=1)
        assert len(dec) == len(frames)
        for (idx, dw, dh, dch, dpx), orig in zip(dec, frames):
            assert (dw, dh, dch) == (w, h, 1)
            assert dpx == orig, f"frame {idx} not bit-exact"


def test_avi_meta_fields_and_frame_sampling():
    w, h = 16, 12
    frames = _block_frames(5, w, h, 5)
    pay = encode_avi_mjpeg(w, h, frames, fps=25, channels=1)
    m = parse_avi_meta(pay)
    assert (m["width"], m["height"], m["n_frames"]) == (w, h, 5)
    assert m["fps"] == 25 and m["codec"] == "MJPG"
    assert m["usec_per_frame"] == 1_000_000 // 25
    # sampling decodes only the selected frames, preserving indices
    assert [d[0] for d in decode_avi_frames(pay, every_n=2)] == [0, 2, 4]
    assert [d[0] for d in decode_avi_frames(pay, every_n=3)] == [0, 3]
    with pytest.raises(ValueError):
        decode_avi_frames(pay, every_n=0)


def test_avi_header_cross_checks_raise():
    """A lying header or corrupted index raises instead of
    mis-sampling: dwTotalFrames vs strh.dwLength vs movi chunks vs
    idx1 records are all cross-checked."""
    w, h = 16, 8
    pay = encode_avi_mjpeg(w, h, _block_frames(1, w, h, 3), channels=1)

    # avih.dwTotalFrames lie
    bad = bytearray(pay)
    p = pay.find(b"avih") + 8  # chunk body
    struct.pack_into("<I", bad, p + 16, 99)  # dwTotalFrames field
    with pytest.raises(ValueError, match="frame-count mismatch"):
        parse_avi_meta(bytes(bad))

    # idx1 offset corruption
    bad = bytearray(pay)
    p = pay.rfind(b"idx1")
    bad[p + 16] ^= 0xFF  # first record's offset
    with pytest.raises(ValueError, match="idx1"):
        parse_avi_meta(bytes(bad))

    # truncation
    with pytest.raises(ValueError, match="truncated"):
        parse_avi_meta(pay[: len(pay) // 2])

    # wrong codec fourcc in strh
    bad = bytearray(pay)
    p = pay.find(b"strh") + 8
    bad[p + 4 : p + 8] = b"H264"
    with pytest.raises(ValueError, match="MJPEG"):
        parse_avi_meta(bytes(bad))

    # not an AVI at all
    with pytest.raises(ValueError, match="RIFF"):
        parse_avi_meta(b"\x00" * 32)


def test_avi_foreign_writer_layout_decodes():
    """A foreign-muxer-shaped AVI — JUNK padding chunk, frames grouped
    inside LIST 'rec ' with interleaved audio '01wb' chunks, no idx1 —
    must parse and decode: the walker skips unknown chunks at every
    level and descends into rec groups (the OpenDML interleave
    convention). Assembled HERE by hand, not by encode_avi_mjpeg, so
    the two code paths are independent."""
    w, h = 16, 8
    frames = _block_frames(9, w, h, 2)
    jpegs = [encode_jpeg_pixels(w, h, f, channels=1) for f in frames]
    avih = struct.pack(
        "<14I", 100_000, 0, 0, 0, len(jpegs), 0, 2, 0, w, h, 0, 0, 0, 0
    )
    strh = b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIII4h", 0, 0, 0, 0, 1, 10, 0, len(jpegs), 0, 0, 0, 0, 0, w, h
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 8, b"MJPG", w * h, 0, 0, 0, 0
    )
    hdrl = _riff_chunk(
        b"LIST",
        b"hdrl"
        + _riff_chunk(b"avih", avih)
        + _riff_chunk(
            b"LIST",
            b"strl" + _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf),
        ),
    )
    movi_body = b"movi"
    for j in jpegs:
        rec = _riff_chunk(b"00dc", j) + _riff_chunk(b"01wb", b"\x00\x01" * 8)
        movi_body += _riff_chunk(b"LIST", b"rec " + rec)
    body = (
        AVI_FOURCC
        + _riff_chunk(b"JUNK", b"\x00" * 11)  # odd size: exercises padding
        + hdrl
        + _riff_chunk(b"LIST", movi_body)
    )
    pay = b"RIFF" + struct.pack("<I", len(body)) + body

    m = parse_avi_meta(pay)
    assert (m["width"], m["height"], m["n_frames"]) == (w, h, 2)
    dec = decode_avi_frames(pay, every_n=1)
    assert [d[4] for d in dec] == frames  # bit-exact through foreign layout


def test_frame_sample_operator_skips_corrupt_payloads(spark):
    """frame_sample: real payloads yield per-sampled-frame rows with
    closed-form sums; corrupt/alien payloads yield zero rows (a bad
    blob must not kill a 100 TB scan)."""
    from kassette_server_spark.operators.multimodal import frame_sample

    w, h = 16, 8
    good0 = encode_avi_mjpeg(w, h, _block_frames(0, w, h, 3), channels=1)
    good1 = encode_avi_mjpeg(w, h, _block_frames(1, w, h, 4), channels=1)
    rows = [
        (0, bytearray(good0)),
        (1, bytearray(good1)),
        (2, bytearray(good0[: len(good0) // 2])),  # truncated
        (3, bytearray(b"not media at all")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = frame_sample(df, every_n=2).collect()
    got = {(r["doc_id"], r["frame_idx"]): r["px_sum"] for r in out}
    assert set(got) == {(0, 0), (0, 2), (1, 0), (1, 2)}
    for (i, f), s in got.items():
        exp = int(
            np.frombuffer(_block_frames(i, w, h, f + 1)[f], np.uint8).sum()
        )
        assert s == exp


def test_decode_media_meta_sniffs_avi(spark):
    """The media sniffer distinguishes RIFF/AVI from RIFF/WAVE and
    reports video dimensions."""
    from kassette_server_spark.operators.multimodal import (
        decode_media_meta,
        encode_wav,
    )

    avi = encode_avi_mjpeg(16, 8, _block_frames(2, 16, 8, 2), channels=1)
    wav = encode_wav(256, 8000)
    df = spark.createDataFrame(
        [(0, bytearray(avi)), (1, bytearray(wav))],
        "doc_id long, payload binary",
    )
    out = {r["doc_id"]: r for r in decode_media_meta(df).collect()}
    assert out[0]["kind"] == "avi"
    assert (out[0]["width"], out[0]["height"]) == (16, 8)
    assert out[1]["kind"] == "wav"


def test_mjpeg_avi_resample_chain_closed_form():
    """q260's per-id chain on fixed ids: sample -> exact 2x decimation
    -> re-encode -> re-mux -> re-decode, final sums equal the
    closed-form half-grid formula."""
    from kassette_server_spark.operators.multimodal import (
        decode_avi_frames,
        parse_avi_meta,
    )

    for i in (0, 7, 23):
        w, h = 16 + 2 * (i % 8), 16 + 2 * ((i * 3) % 6)
        nf = 2 + i % 3
        frames = [
            (
                (
                    i
                    + 7 * f
                    + 3 * (np.arange(w)[None, :] // 16)
                    + 5 * (np.arange(h)[:, None] // 16)
                )
                % 256
            )
            .astype(np.uint8)
            .tobytes()
            for f in range(nf)
        ]
        pay = encode_avi_mjpeg(w, h, frames, channels=1)
        sampled = decode_avi_frames(pay, 2)
        halved = [
            np.frombuffer(px, np.uint8).reshape(fh, fw)[::2, ::2].tobytes()
            for _, fw, fh, _, px in sampled
        ]
        pay2 = encode_avi_mjpeg(w // 2, h // 2, halved, channels=1)
        m2 = parse_avi_meta(pay2)
        assert (m2["width"], m2["height"]) == (w // 2, h // 2)
        for (ni, dw, dh, dch, dpx), (oi, *_rest) in zip(
            decode_avi_frames(pay2, 1), sampled
        ):
            expect = (
                (
                    i
                    + 7 * oi
                    + 3 * (np.arange(w // 2)[None, :] // 8)
                    + 5 * (np.arange(h // 2)[:, None] // 8)
                )
                % 256
            ).astype(np.uint8)
            assert dpx == expect.tobytes(), (i, oi)


def test_avi_audio_first_stream_layout_decodes():
    """A foreign AVI listing the AUDIO stream first (stream 0 = 'auds',
    stream 1 = 'vids') numbers the video chunks '01dc' — the parser
    must bind strh/strf to the vids strl by TYPE, learn the stream
    index, and collect the right chunks, not assume stream 0."""
    w, h = 16, 8
    frames = _block_frames(4, w, h, 3)
    jpegs = [encode_jpeg_pixels(w, h, f, channels=1) for f in frames]
    avih = struct.pack(
        "<14I", 100_000, 0, 0, 0, len(jpegs), 0, 2, 0, w, h, 0, 0, 0, 0
    )
    aud_strh = b"auds" + b"\x00\x00\x00\x00" + struct.pack(
        "<IHHIIIIIIII4h", 0, 0, 0, 0, 1, 8000, 0, 8000, 0, 0, 1, 0, 0, 0, 0
    )
    aud_strf = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    vid_strh = b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIII4h", 0, 0, 0, 0, 1, 10, 0, len(jpegs), 0, 0, 0, 0, 0, w, h
    )
    vid_strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 8, b"MJPG", w * h, 0, 0, 0, 0
    )
    hdrl = _riff_chunk(
        b"LIST",
        b"hdrl"
        + _riff_chunk(b"avih", avih)
        + _riff_chunk(
            b"LIST",
            b"strl" + _riff_chunk(b"strh", aud_strh) + _riff_chunk(b"strf", aud_strf),
        )
        + _riff_chunk(
            b"LIST",
            b"strl" + _riff_chunk(b"strh", vid_strh) + _riff_chunk(b"strf", vid_strf),
        ),
    )
    movi_body = b"movi"
    for j in jpegs:
        movi_body += _riff_chunk(b"00wb", b"\x01\x02" * 6)  # audio: stream 0
        movi_body += _riff_chunk(b"01dc", j)  # video: stream 1
    body = AVI_FOURCC + hdrl + _riff_chunk(b"LIST", movi_body)
    pay = b"RIFF" + struct.pack("<I", len(body)) + body

    m = parse_avi_meta(pay)
    assert (m["width"], m["height"], m["n_frames"]) == (w, h, 3)
    assert [d[4] for d in decode_avi_frames(pay, every_n=1)] == frames


def test_avi_mjpeg_color_frames_round_trip():
    """3-channel frames ride the same container (biBitCount=24):
    per-8x8-block-constant channels survive the per-frame JPEG path
    bit-exactly, and the meta reports the color depth."""
    w, h, i = 16, 8, 11
    frames = [
        np.stack(
            [
                (
                    i
                    + c
                    + 7 * f
                    + 3 * (np.arange(w)[None, :] // 8)
                    + 5 * (np.arange(h)[:, None] // 8)
                )
                % 256
                for c in range(3)
            ],
            axis=-1,
        )
        .astype(np.uint8)
        .tobytes()
        for f in range(3)
    ]
    pay = encode_avi_mjpeg(w, h, frames, fps=10, channels=3)
    m = parse_avi_meta(pay)
    assert (m["width"], m["height"], m["n_frames"], m["bit_count"]) == (w, h, 3, 24)
    for (idx, dw, dh, dch, dpx), orig in zip(decode_avi_frames(pay, 1), frames):
        assert (dw, dh, dch) == (w, h, 3)
        assert dpx == orig, idx


def test_frame_sample_over_structured_stream(spark, tmp_path):
    """frame_sample is streaming-ready: the input-width guard passes
    streaming frames through untouched and the Arrow-batched map runs
    per micro-batch — a parquet file-source stream of AVI payloads
    yields exactly the batch twin's rows."""
    from kassette_server_spark.operators.multimodal import frame_sample

    w, h = 16, 8
    rows0 = [(0, bytearray(encode_avi_mjpeg(w, h, _block_frames(0, w, h, 3), channels=1)))]
    rows1 = [
        (1, bytearray(encode_avi_mjpeg(w, h, _block_frames(1, w, h, 4), channels=1))),
        (2, bytearray(b"corrupt")),  # must not kill the stream
    ]
    src = tmp_path / "src"
    schema = "doc_id long, payload binary"
    for i, rows in enumerate((rows0, rows1)):
        spark.createDataFrame(rows, schema).write.parquet(str(src / f"b{i}"))

    got: list[tuple] = []

    def body(batch_df, batch_id):
        got.extend(
            (r["doc_id"], r["frame_idx"], r["px_sum"])
            for r in batch_df.collect()
        )

    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = (
        frame_sample(stream, every_n=2)
        .writeStream.foreachBatch(body)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    batch = spark.createDataFrame(rows0 + rows1, schema)
    twin = sorted(
        (r["doc_id"], r["frame_idx"], r["px_sum"])
        for r in frame_sample(batch, every_n=2).collect()
    )
    assert sorted(got) == twin and len(twin) == 4
