"""ISO-BMFF (MP4) container codec + keyframe sampling plan (L-mm4/5).

The q004 (birth q301) oracle replays the synthesis parameters rather than the byte
stream, which is only sound if parse∘encode is the identity on the
metadata — pinned here across a parameter grid, plus the box-walk edge
cases (64-bit largesize boxes, to-end boxes, multi-run stts, truncation
and non-container payloads) and the exact stride law of the sampling
plan."""

from __future__ import annotations

import struct

import pytest

from cubicerp_client_etl_spark.operators.multimodal import (
    _mp4_box,
    encode_mp4_meta,
    keyframe_sample_plan,
    parse_mp4_meta,
    video_meta_features,
)


def test_mp4_roundtrip_identity_on_parameter_grid():
    for timescale in (600, 90000, 1):
        for delta in (1, 20, 3003):
            for n in (0, 1, 24, 500):
                for w, h in ((320, 240), (1920, 1080), (1, 1)):
                    for mdat in (b"", b"x" * 257):
                        p = encode_mp4_meta(timescale, delta, n, w, h, mdat)
                        m = parse_mp4_meta(p)
                        assert m == {
                            "major_brand": "isom",
                            "timescale": timescale,
                            "duration": n * delta,
                            "width": w,
                            "height": h,
                            "n_frames": n,
                            "frame_delta": delta,
                            "mdat_bytes": len(mdat),
                            # stsz omitted → empty table; mdat payload
                            # offset still indexed for the decode tier
                            "sample_sizes": [],
                            "mdat_off": len(p) - len(mdat),
                        }


def test_mp4_parser_handles_largesize_and_to_end_boxes():
    p = encode_mp4_meta(600, 25, 48, 320, 240, b"")
    # append an mdat written as a 64-bit largesize box
    body = b"y" * 100
    large = struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + len(body)) + body
    m = parse_mp4_meta(p + large)
    assert m["mdat_bytes"] == 100
    # and one written with size == 0 (extends to end of file)
    to_end = struct.pack(">I", 0) + b"mdat" + b"z" * 7
    m2 = parse_mp4_meta(p + to_end)
    assert m2["mdat_bytes"] == 7


def test_mp4_parser_sums_multi_run_stts_and_skips_unknown_boxes():
    # hand-assemble: a free box the walker must skip + two stts runs
    stts = _mp4_box(
        b"stts",
        struct.pack(">II", 0, 2)
        + struct.pack(">II", 10, 25)
        + struct.pack(">II", 5, 25),
    )
    mdhd = _mp4_box(
        b"mdhd",
        struct.pack(">I", 0)
        + struct.pack(">II", 0, 0)
        + struct.pack(">II", 600, 375)
        + struct.pack(">HH", 0x55C4, 0),
    )
    moov = _mp4_box(
        b"moov",
        _mp4_box(b"free", b"\x00" * 11)
        + _mp4_box(b"trak", _mp4_box(b"mdia", mdhd + _mp4_box(b"minf", _mp4_box(b"stbl", stts)))),
    )
    ftyp = _mp4_box(b"ftyp", b"isom" + struct.pack(">I", 512))
    m = parse_mp4_meta(ftyp + moov)
    assert m["n_frames"] == 15
    assert m["frame_delta"] == 25
    assert m["timescale"] == 600


def test_mp4_parser_rejects_non_container_and_truncation():
    with pytest.raises(ValueError, match="not an ISO-BMFF"):
        parse_mp4_meta(b"RIFF....WAVE")
    p = encode_mp4_meta(600, 25, 48, 320, 240, b"")
    with pytest.raises(ValueError):
        parse_mp4_meta(p[: len(p) - 3])  # torn final box header/body
    # a box claiming to be larger than its container must be rejected
    bad = _mp4_box(b"ftyp", b"isom" + struct.pack(">I", 512))
    bad += struct.pack(">I", 10_000) + b"mdat"
    with pytest.raises(ValueError, match="overruns|truncated"):
        parse_mp4_meta(bad)


def test_mp4_parser_reads_version1_mdhd():
    mdhd_v1 = _mp4_box(
        b"mdhd",
        struct.pack(">I", 1 << 24)
        + struct.pack(">QQ", 0, 0)
        + struct.pack(">I", 90000)
        + struct.pack(">Q", 123456)
        + struct.pack(">HH", 0x55C4, 0),
    )
    ftyp = _mp4_box(b"ftyp", b"mp42" + struct.pack(">I", 0))
    m = parse_mp4_meta(ftyp + _mp4_box(b"moov", mdhd_v1))
    assert m["major_brand"] == "mp42"
    assert m["timescale"] == 90000
    assert m["duration"] == 123456


def test_keyframe_plan_exact_stride_law(spark):
    # n_frames=48, delta=25 @ timescale 600 → 1.92 fps·s⁻¹... stride
    # k = ceil(0.5s · 600 / 25) = 12 → indices 0,12,24,36; pts exact
    payload = encode_mp4_meta(600, 25, 48, 640, 480, b"")
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    meta = video_meta_features(df)
    got = sorted(
        (r.frame_idx, r.pts_us)
        for r in keyframe_sample_plan(meta, every_us=500_000).collect()
    )
    assert got == [(0, 0), (12, 500_000), (24, 1_000_000), (36, 1_500_000)]
    # zero-frame track contributes no rows (guarded sequence)
    empty = video_meta_features(
        spark.createDataFrame(
            [(2, bytearray(encode_mp4_meta(600, 25, 0, 64, 64, b"")))],
            "doc_id long, payload binary",
        )
    )
    # fps_e6 of an 0-frame track is still defined (delta present);
    # the plan must be empty, not a crash
    assert keyframe_sample_plan(empty, every_us=500_000).count() == 0


def test_stsz_roundtrip_and_mjpeg_frame_slicing():
    # per-sample stsz table survives the parse∘encode round trip and
    # mdat_off indexes the FIRST mdat payload byte
    from cubicerp_client_etl_spark.operators.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    frames = []
    for f in range(3):
        pxs = bytes(((f * 97 + (y // 8) * 17 + (x // 8) * 53) % 256)
                    for y in range(16) for x in range(16))
        frames.append(encode_jpeg_gray(16, 16, pxs, quant=[1] * 64))
    buf = encode_mp4_meta(
        600, 25, 3, 16, 16,
        mdat=b"".join(frames),
        sample_sizes=[len(fb) for fb in frames],
    )
    m = parse_mp4_meta(buf)
    assert m["sample_sizes"] == [len(fb) for fb in frames]
    assert m["mdat_off"] >= 0
    # slice frame 1 back out by the stsz prefix sums and decode it:
    # block-uniform @ quant=1 is pixel-exact (the q293 law)
    off = m["mdat_off"] + len(frames[0])
    w, h, px = decode_jpeg_gray(buf[off : off + len(frames[1])])
    assert (w, h) == (16, 16)
    assert bytes(px) == bytes(
        ((97 + (y // 8) * 17 + (x // 8) * 53) % 256)
        for y in range(16) for x in range(16)
    )


def test_stsz_fixed_size_table():
    # stsz with sample_size != 0 (fixed-size samples, no per-sample
    # entries) expands to the repeated size — the spec's other arm
    import struct

    stsz_fixed = _mp4_box(b"stsz", struct.pack(">III", 0, 40, 5))
    mdhd = _mp4_box(
        b"mdhd",
        struct.pack(">I", 0) + struct.pack(">II", 0, 0)
        + struct.pack(">II", 600, 100) + struct.pack(">HH", 0x55C4, 0),
    )
    stbl = _mp4_box(b"stbl", stsz_fixed)
    minf = _mp4_box(b"minf", stbl)
    mdia = _mp4_box(b"mdia", mdhd + minf)
    ftyp = _mp4_box(b"ftyp", b"isom" + struct.pack(">I", 0))
    m = parse_mp4_meta(ftyp + _mp4_box(b"moov", _mp4_box(b"trak", mdia)))
    assert m["sample_sizes"] == [40] * 5


def test_decode_mjpeg_frames_rejects_index_free_container(spark):
    # a container without stsz cannot be frame-sliced — the decode
    # tier must fail loudly, not guess
    import pytest as _pytest

    from cubicerp_client_etl_spark.operators.multimodal import (
        decode_mjpeg_frames,
    )

    mp4 = spark.createDataFrame(
        [(1, bytearray(encode_mp4_meta(600, 25, 2, 16, 16, mdat=b"xx")))],
        "doc_id long, payload binary",
    )
    plan = spark.createDataFrame(
        [(1, 0, 0)], "doc_id long, frame_idx long, pts_us long"
    )
    with _pytest.raises(Exception, match="stsz"):
        decode_mjpeg_frames(mp4, plan).collect()


def test_keyframe_plan_low_fps_uses_exact_frame_delta(spark):
    # ADVICE r13: timescale=1, delta=1500 — reconstructing delta from
    # fps_e6 by floor-div involution gives 1501 (1e6*1 div 666 = 1501)
    # and silently mis-strides; the plan must consume the parsed stts
    # delta column. Exact law here: k = ceil(5e5·1/(1e6·1500)) = 1, so
    # every frame is sampled and pts_us = j·1500·1e6 // 1 exactly.
    payload = encode_mp4_meta(1, 1500, 3, 64, 64, b"")
    df = spark.createDataFrame(
        [(7, bytearray(payload))], "doc_id long, payload binary"
    )
    meta = video_meta_features(df)
    assert meta.select("frame_delta").first()[0] == 1500
    got = sorted(
        (r.frame_idx, r.pts_us)
        for r in keyframe_sample_plan(meta, every_us=500_000).collect()
    )
    assert got == [(0, 0), (1, 1_500_000_000), (2, 3_000_000_000)]
