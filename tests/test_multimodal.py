"""Multimodal plumbing invariants (SURVEY §2.L-mm1): schema, batch shape,
determinism of the stubbed decode, and the UDTF-style row growth of frame
sampling. The real media decode is stubbed (no PIL/av in the container);
these tests pin what IS real — the Spark-side contract."""

from __future__ import annotations

import pytest

from cubicerp_client_etl_spark.catalog import load
from cubicerp_client_etl_spark.operators.multimodal import (
    attach_binary_payload,
    decode_media,
    extract_features,
    resize_media,
    sample_frames,
)
from tests.conftest import SF_SMOKE


def _docs(spark, n=20):
    return load(spark, SF_SMOKE, "documents").select("doc_id", "text").limit(n)


def _has_pil() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(_has_pil(), reason="PIL installed: stub gate inactive")
def test_non_bmp_decode_raises_without_pil(spark):
    """Only NON-BMP formats need the pillow extra now; the error
    surfaces per-payload inside the task with install guidance."""
    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG")
    df = spark.createDataFrame(
        [(1, b"\x89PNG_not_a_real_png")], "doc_id long, payload binary"
    ).selectExpr(
        "doc_id",
        "payload",
        "named_struct('media_type', 'image/png', 'byte_len', "
        "CAST(length(payload) AS BIGINT), 'format', 'png', "
        "'width', 1, 'height', 1) AS meta",
    )
    with pytest.raises(Exception, match="pillow"):
        extract_features(df, fake=False).collect()


# ---- pure-stdlib BMP real decode path (VERDICT r5 #5) ---------------------


def _gray_bmp_df(spark, rows):
    """rows: [(doc_id, width, height, pixels bytes)] → payload frame."""
    from cubicerp_client_etl_spark.operators.multimodal import encode_bmp_gray

    data = [(i, encode_bmp_gray(w, h, px)) for i, w, h, px in rows]
    return spark.createDataFrame(
        data, "doc_id long, payload binary"
    ).selectExpr(
        "doc_id",
        "payload",
        "named_struct('media_type', 'image/bmp', 'byte_len', "
        "CAST(length(payload) AS BIGINT), 'format', 'bmp', "
        "'width', NULL, 'height', NULL) AS meta",
    )


def test_bmp_codec_roundtrip_and_topdown():
    import struct

    from cubicerp_client_etl_spark.operators.multimodal import (
        decode_bmp_gray,
        encode_bmp_gray,
    )

    px = bytes((7 * i + 3) % 256 for i in range(5 * 3))  # w=5 forces row pad
    payload = encode_bmp_gray(5, 3, px)
    assert payload[:2] == b"BM"
    assert decode_bmp_gray(payload) == (5, 3, px)

    # top-down variant (negative height) must decode to the same pixels
    neg = bytearray(payload)
    struct.pack_into("<i", neg, 22, -3)
    flipped = b"".join(
        payload[-((5 + 3) * 3):][r * 8 : r * 8 + 8] for r in (2, 1, 0)
    )
    td = bytes(neg[: -((5 + 3) * 3)]) + flipped
    assert decode_bmp_gray(td) == (5, 3, px)

    with pytest.raises(ValueError):
        decode_bmp_gray(b"not a bmp at all, clearly")
    with pytest.raises(ValueError):
        encode_bmp_gray(2, 2, b"\x00")  # wrong pixel count


def test_real_bmp_features_match_hand_computed(spark):
    """fake=False executes the REAL pixel path in CI: the luminance
    histogram of a constructed BMP equals the hand-computed one."""
    px = bytes([0, 10, 100, 128, 200, 255, 64, 32, 16, 240, 130, 90])
    df = _gray_bmp_df(spark, [(1, 4, 3, px)])
    out = extract_features(df, n_features=8, fake=False).collect()
    assert len(out) == 1
    want = [0] * 8
    for p in px:
        want[(p * 8) // 256] += 1
    assert out[0].features == [c / len(px) for c in want]
    assert out[0].media_type == "image/bmp"


def test_real_bmp_resize_decodes_to_target_dims(spark):
    """fake=False resize: decode → 2D nearest-neighbor → re-encode;
    output is a valid BMP of the target size, uniform images stay
    uniform, and a half-and-half image keeps both halves."""
    from cubicerp_client_etl_spark.operators.multimodal import decode_bmp_gray

    uniform = bytes([77]) * (6 * 4)
    halves = bytes([0] * 4 + [255] * 4) * 4  # left black, right white, 8x4
    df = _gray_bmp_df(spark, [(1, 6, 4, uniform), (2, 8, 4, halves)])
    out = {r.doc_id: r for r in resize_media(df, 4, 2, fake=False).collect()}
    for r in out.values():
        w, h, px = decode_bmp_gray(bytes(r.payload))
        assert (w, h) == (4, 2) and (r.width, r.height) == (4, 2)
    assert set(decode_bmp_gray(bytes(out[1].payload))[2]) == {77}
    rpx = decode_bmp_gray(bytes(out[2].payload))[2]
    assert rpx == bytes([0, 0, 255, 255] * 2)


@pytest.mark.skipif(not _has_pil(), reason="needs optional pillow extra")
def test_real_decode_paths_with_pil(spark):
    """fake=False end-to-end when PIL is importable: decode, luminance
    histogram features, PIL resize re-encoded as PNG."""
    import io

    from PIL import Image

    img = Image.new("L", (4, 4), color=128)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    payload = buf.getvalue()
    assert decode_media(payload).size == (4, 4)

    df = spark.createDataFrame(
        [(1, payload)], "doc_id long, payload binary"
    ).selectExpr(
        "doc_id",
        "payload",
        "named_struct('media_type', 'image/png', 'byte_len', "
        "CAST(length(payload) AS BIGINT), 'format', 'png', "
        "'width', 4, 'height', 4) AS meta",
    )
    feats = extract_features(df, n_features=4, fake=False).collect()
    assert len(feats) == 1
    # uniform gray 128 → all mass in bucket (128*4)//256 == 2
    assert feats[0].features[2] == 1.0

    resized = resize_media(df, width=2, height=2, fake=False).collect()
    out_img = Image.open(io.BytesIO(bytes(resized[0].payload)))
    assert out_img.size == (2, 2)


@pytest.mark.skipif(not _has_pil(), reason="needs optional pillow extra")
def test_jpeg_codec_interop_with_pil(spark):
    """Cross-codec JPEG interop when pillow is present: (a) PIL decodes
    our encoder's output to the exact pixels; (b) a PIL-encoded
    grayscale JPEG round-trips through OUR stdlib decoder within the
    quantization tolerance; (c) a PIL-encoded COLOR JPEG (baseline
    4:2:0) decodes through our stdlib luma extraction, matching PIL's
    own convert("L") within YCbCr round-trip tolerance, and runs
    end-to-end through extract_features."""
    import io

    from PIL import Image

    from cubicerp_client_etl_spark.operators.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    w, h, px = _jpeg_block_img()
    ours = encode_jpeg_gray(w, h, px, quant=[1] * 64)
    via_pil = Image.open(io.BytesIO(ours)).convert("L")
    assert (via_pil.width, via_pil.height) == (w, h)
    assert bytes(via_pil.getdata()) == px

    buf = io.BytesIO()
    Image.frombytes("L", (w, h), px).save(buf, format="JPEG", quality=100)
    dw, dh, out = decode_jpeg_gray(buf.getvalue())
    assert (dw, dh) == (w, h)
    assert max(abs(a - b) for a, b in zip(px, out)) <= 16  # q100 quant error

    buf = io.BytesIO()
    Image.new("RGB", (4, 4), color=(120, 130, 140)).save(buf, format="JPEG")
    pil_l = bytes(Image.open(io.BytesIO(buf.getvalue())).convert("L").getdata())
    _, _, our_l = decode_jpeg_gray(buf.getvalue())
    assert max(abs(a - b) for a, b in zip(pil_l, our_l)) <= 3
    df = spark.createDataFrame(
        [(1, buf.getvalue())], "doc_id long, payload binary"
    ).selectExpr(
        "doc_id",
        "payload",
        "named_struct('media_type', 'image/jpeg', 'byte_len', "
        "CAST(length(payload) AS BIGINT), 'format', 'jpeg', "
        "'width', 4, 'height', 4) AS meta",
    )
    feats = extract_features(df, n_features=4, fake=False).collect()
    assert len(feats) == 1 and abs(sum(feats[0].features) - 1.0) < 1e-9


def test_resize_uniform_payload_and_deterministic(spark):
    docs = attach_binary_payload(_docs(spark), "text")
    out = resize_media(docs, width=8, height=8).collect()
    assert len(out) == 20
    assert all(len(bytes(r["payload"])) == 64 for r in out)
    assert all((r["width"], r["height"]) == (8, 8) for r in out)
    again = {r["doc_id"]: bytes(r["payload"]) for r in resize_media(
        attach_binary_payload(_docs(spark), "text"), width=8, height=8
    ).collect()}
    assert {r["doc_id"]: bytes(r["payload"]) for r in out} == again


def test_frame_sample_row_growth_matches_formula(spark):
    docs = attach_binary_payload(_docs(spark), "text")
    rows = sample_frames(docs, frame_bytes=64, every_n=4).collect()
    texts = {r["doc_id"]: r["text"] for r in _docs(spark).collect()}
    expected = {
        doc_id: [fi for fi in range(0, max(len(t.encode()) // 64, 1), 4)]
        for doc_id, t in texts.items()
    }
    got: dict[int, list[int]] = {}
    for r in rows:
        got.setdefault(r["doc_id"], []).append(r["frame_idx"])
    assert {k: sorted(v) for k, v in got.items()} == expected
    # frame content is the exact byte slice
    for r in rows:
        b = texts[r["doc_id"]].encode()
        lo = r["frame_idx"] * 64
        assert bytes(r["frame"]) == b[lo : lo + 64]


def test_extract_features_shape_and_mass(spark):
    docs = attach_binary_payload(_docs(spark), "text")
    out = extract_features(docs, n_features=8).collect()
    assert len(out) == 20
    for r in out:
        assert len(r["features"]) == 8
        # histogram mass sums to ~1 (rounding to 6dp per bucket)
        assert abs(sum(r["features"]) - 1.0) < 1e-4


# ---- audio path (WAV PCM16, pure stdlib) ----------------------------------


def test_wav_codec_roundtrip_and_errors():
    import math

    from cubicerp_client_etl_spark.operators.multimodal import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    samples = [0, 1, -1, 32767, -32768, 1234, -4321]
    payload = encode_wav_pcm16(8000, samples)
    rate, back = decode_wav_pcm16(payload)
    assert (rate, back) == (8000, samples)
    # empty stream round-trips too
    assert decode_wav_pcm16(encode_wav_pcm16(44100, [])) == (44100, [])
    with pytest.raises(ValueError, match="not a WAV container"):
        decode_wav_pcm16(b"\x00\x01\x02 definitely not RIFF")
    assert math.isqrt(4) == 2  # keep the import honest


def test_audio_features_real_path_hand_computed(spark):
    import math

    from cubicerp_client_etl_spark.operators.multimodal import (
        audio_features,
        encode_wav_pcm16,
    )

    xs = [100, -100, 100, -100, 0, 50]
    df = spark.createDataFrame(
        [(1, encode_wav_pcm16(16000, xs))], "doc_id long, payload binary"
    )
    r = audio_features(df, fake=False).collect()[0]
    n = len(xs)
    assert r["n_samples"] == n
    assert r["sample_rate"] == 16000
    assert r["duration_us"] == n * 1_000_000 // 16000
    assert r["peak"] == 100
    assert r["rms"] == math.isqrt(sum(x * x for x in xs) // n)
    # sign pattern + - + - + + : crossings at 3 transitions... compute:
    zc = sum(1 for i in range(n - 1) if (xs[i] >= 0) != (xs[i + 1] >= 0))
    assert r["zero_crossings"] == zc


def test_audio_features_fake_path_runs_on_any_binary(spark):
    from cubicerp_client_etl_spark.operators.multimodal import audio_features

    df = spark.createDataFrame(
        [(7, b"arbitrary bytes")], "doc_id long, payload binary"
    )
    r = audio_features(df, fake=True).collect()[0]
    assert r["n_samples"] == 15
    assert r["sample_rate"] == 16000


# ---- PNG codec ------------------------------------------------------------


def test_png_round_trip_each_filter_and_errors():
    import random

    import pytest

    from cubicerp_client_etl_spark.operators.multimodal import (
        _decode_gray,
        decode_png_gray,
        encode_png_gray,
    )

    rng = random.Random(7)
    for w, h in ((1, 1), (3, 10), (16, 4), (31, 9)):
        px = bytes(rng.randrange(256) for _ in range(w * h))
        for mode in ("none", "mixed"):
            assert decode_png_gray(encode_png_gray(w, h, px, mode)) == (w, h, px)
    # gradient rows make Sub/Up/Average/Paeth take non-trivial paths
    w, h = 13, 10
    px = bytes(((x * 7 + y * 31) % 256) for y in range(h) for x in range(w))
    payload = encode_png_gray(w, h, px, "mixed")
    assert decode_png_gray(payload) == (w, h, px)
    # the shared real-decode dispatcher accepts PNG
    assert _decode_gray(payload) == (w, h, px)
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png_gray(b"nope")
    with pytest.raises(ValueError):
        encode_png_gray(2, 2, b"abc")  # wrong pixel count
    with pytest.raises(ValueError):
        encode_png_gray(1, 1, b"a", filter_mode="bogus")


# ---- mu-law ---------------------------------------------------------------


def test_ulaw_known_values_and_idempotence(spark):
    from pyspark.sql import functions as F

    from cubicerp_client_etl_spark.operators.multimodal import (
        ulaw_decode_expr,
        ulaw_encode_expr,
    )

    # canonical G.711 pairs (reference C implementation)
    known = [(0, 255, 0), (1, 255, 0), (-1, 127, 0), (100, 242, 104),
             (-100, 114, -104), (5000, 171, 5116), (32767, 128, 32124),
             (-32768, 0, -32124)]
    df = spark.createDataFrame([(x,) for x, _, _ in known], "x int")
    got = {
        r.x: (r.u, r.xc)
        for r in df.select(
            "x", ulaw_encode_expr("x").alias("u")
        ).select("x", "u", ulaw_decode_expr("u").alias("xc")).collect()
    }
    for x, u, xc in known:
        assert got[x] == (u, xc), (x, got[x], (u, xc))

    # companding idempotence: enc(dec(u)) == u for every byte — the
    # codec's fixed-point property
    bytes_df = spark.range(256).select(F.col("id").cast("int").alias("u"))
    rt = bytes_df.select(
        "u", ulaw_decode_expr("u").alias("xc")
    ).select("u", ulaw_encode_expr("xc").alias("u2")).collect()
    bad = [(r.u, r.u2) for r in rt if r.u != r.u2]
    # 0x7F/0xFF both decode to 0, which re-encodes as 0xFF — the one
    # canonical collapse in G.711 (negative zero); everything else is
    # a fixed point
    assert bad == [(127, 255)], bad


# ---- pure-stdlib baseline JPEG codec (operators/jpeg.py) ------------------


def _jpeg_block_img(w=20, h=12):
    """Multi-block image with uniform 8x8 blocks (and cropped edge
    blocks) — DC-only in DCT domain, so quant=[1]*64 round-trips
    EXACTLY and every pixel is hand-predictable."""
    vals = {(0, 0): 37, (0, 1): 128, (0, 2): 200, (1, 0): 5, (1, 1): 250, (1, 2): 99}
    px = bytearray(w * h)
    for y in range(h):
        for x in range(w):
            px[y * w + x] = vals[(y // 8, x // 8)]
    return w, h, bytes(px)


def test_jpeg_block_uniform_exact_roundtrip():
    from cubicerp_client_etl_spark.operators.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    w, h, px = _jpeg_block_img()
    data = encode_jpeg_gray(w, h, px, quant=[1] * 64)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    assert decode_jpeg_gray(data) == (w, h, px)
    # standard Annex K tables: uniform image survives the DC quantizer
    # exactly when (v-128) is even (Q_dc=16, DC=8*(v-128))
    d2 = encode_jpeg_gray(16, 16, bytes([200]) * 256)
    assert set(decode_jpeg_gray(d2)[2]) == {200}


def test_jpeg_random_roundtrip_stuffing_and_restarts():
    """quant=1 keeps only IDCT rounding (maxdiff <= 1 per pixel); the
    entropy stream contains raw 0xFF bytes (stuffing exercised), and
    DRI/RSTn segmentation decodes to the identical image."""
    import random

    from cubicerp_client_etl_spark.operators.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    rnd = random.Random(42)
    w, h = 20, 12
    px = bytes(rnd.randrange(256) for _ in range(w * h))
    data = encode_jpeg_gray(w, h, px, quant=[1] * 64)
    _, _, out = decode_jpeg_gray(data)
    assert max(abs(a - b) for a, b in zip(px, out)) <= 1
    assert b"\xff\x00" in data[20:-2]  # stuffed byte present
    rst = encode_jpeg_gray(w, h, px, quant=[1] * 64, restart_interval=2)
    assert b"\xff\xd0" in rst
    assert decode_jpeg_gray(rst)[2] == out


def test_jpeg_single_ac_coefficient_matches_cosine_reference():
    """Plant exactly one AC coefficient by encoding ITS OWN inverse
    transform: pixels = IDCT of {AC(u=1,v=0)=A} computed independently
    here from the T.81 formula, then encode with quant=1 and decode —
    the codec must reproduce the cosine ramp (entropy coding of a
    nonzero AC exercised end-to-end)."""
    import math

    from cubicerp_client_etl_spark.operators.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    amp = 200.0
    px = bytes(
        max(0, min(255, round(
            (1 / 4) * (1 / math.sqrt(2)) * amp
            * math.cos((2 * x + 1) * 1 * math.pi / 16) * math.sqrt(2)
        ) + 128))
        for _y in range(8)
        for x in range(8)
    )
    data = encode_jpeg_gray(8, 8, px, quant=[1] * 64)
    _, _, out = decode_jpeg_gray(data)
    assert max(abs(a - b) for a, b in zip(px, out)) <= 1


def test_jpeg_rejects_out_of_profile_with_guidance():
    import pytest as _pytest

    from cubicerp_client_etl_spark.operators.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    with _pytest.raises(ValueError, match="progressive"):
        decode_jpeg_gray(b"\xff\xd8\xff\xc2\x00\x0b" + b"\x00" * 9)
    # flip ncomp in a real file's SOF0 to 2 (CMYK-ish oddity) -> guidance
    data = bytearray(encode_jpeg_gray(8, 8, bytes(64), quant=[1] * 64))
    sof = data.index(b"\xff\xc0")
    data[sof + 9] = 2
    with _pytest.raises(ValueError, match="pillow"):
        decode_jpeg_gray(bytes(data))
    with _pytest.raises(ValueError, match="SOI"):
        decode_jpeg_gray(b"not a jpeg")


def test_jpeg_color_container_luma_extraction():
    """3-component YCbCr baseline JPEG — the profile real encoders emit
    — decodes through the stdlib path by extracting the luma plane:
    every sampling (4:4:4, 4:2:2, 4:2:0), with and without restart
    markers, reproduces the planted Y plane within IDCT rounding; a
    block-uniform plane at 4:2:0 is pixel-EXACT (DC-only)."""
    import random

    from cubicerp_client_etl_spark.operators.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_ycc_neutral,
    )

    rnd = random.Random(7)
    w, h = 20, 12
    px = bytes(rnd.randrange(256) for _ in range(w * h))
    for samp in ((1, 1), (2, 1), (2, 2)):
        for ri in (0, 3):
            data = encode_jpeg_ycc_neutral(
                w, h, px, sampling=samp, quant=[1] * 64, restart_interval=ri
            )
            dw, dh, out = decode_jpeg_gray(data)
            assert (dw, dh) == (w, h)
            assert max(abs(a - b) for a, b in zip(px, out)) <= 1, (samp, ri)

    _, _, upx = _jpeg_block_img()
    data = encode_jpeg_ycc_neutral(20, 12, upx, sampling=(2, 2), quant=[1] * 64)
    assert decode_jpeg_gray(data)[2] == upx


def test_real_jpeg_features_and_resize_through_spark(spark):
    """The dependency-free JPEG path executes inside mapInPandas in CI:
    extract_features(fake=False) computes the luminance histogram of
    the DECODED pixels (hand-computed here), and resize_media
    (fake=False) decodes the JPEG and re-encodes the resampled BMP."""
    from cubicerp_client_etl_spark.operators.jpeg import encode_jpeg_gray
    from cubicerp_client_etl_spark.operators.multimodal import decode_bmp_gray

    w, h, px = _jpeg_block_img()
    payload = encode_jpeg_gray(w, h, px, quant=[1] * 64)
    df = spark.createDataFrame(
        [(1, payload)], "doc_id long, payload binary"
    ).selectExpr(
        "doc_id",
        "payload",
        "named_struct('media_type', 'image/jpeg', 'byte_len', "
        "CAST(length(payload) AS BIGINT), 'format', 'jpeg', "
        f"'width', {w}, 'height', {h}) AS meta",
    )
    out = extract_features(df, n_features=8, fake=False).collect()
    want = [0] * 8
    for p in px:
        want[(p * 8) // 256] += 1
    assert out[0].features == [c / len(px) for c in want]
    assert out[0].media_type == "image/jpeg"

    resized = resize_media(df, width=10, height=6, fake=False).collect()
    rw, rh, rpx = decode_bmp_gray(bytes(resized[0].payload))
    assert (rw, rh) == (10, 6)
    # nearest-neighbor of the block image keeps the block values
    assert rpx[0] == 37 and rpx[9] == 200 and rpx[5 * 10] == 5


def test_jpeg_codec_property_random_images():
    """Hypothesis property: any dims (1..25 x 1..25) and pixel content
    round-trip within IDCT rounding at quant=1, with and without
    restart markers, gray and 4:2:0 color containers."""
    from hypothesis import given, settings, strategies as st

    from cubicerp_client_etl_spark.operators.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
        encode_jpeg_ycc_neutral,
    )

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(1, 25),
        h=st.integers(1, 25),
        seed=st.integers(0, 2**31),
        ri=st.sampled_from([0, 1, 3]),
        color=st.booleans(),
    )
    def check(w, h, seed, ri, color):
        import random

        rnd = random.Random(seed)
        px = bytes(rnd.randrange(256) for _ in range(w * h))
        if color:
            data = encode_jpeg_ycc_neutral(
                w, h, px, sampling=(2, 2), quant=[1] * 64, restart_interval=ri
            )
        else:
            data = encode_jpeg_gray(w, h, px, quant=[1] * 64, restart_interval=ri)
        dw, dh, out = decode_jpeg_gray(data)
        assert (dw, dh) == (w, h)
        assert max(abs(a - b) for a, b in zip(px, out)) <= 1

    check()


def test_jpeg_truncated_payload_raises_valueerror():
    """Corrupt/truncated payloads must surface as ValueError (one
    exception type for per-payload handling and the PIL fallback),
    never a bare IndexError/struct.error from the parser."""
    import pytest as _pytest

    from cubicerp_client_etl_spark.operators.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    good = encode_jpeg_gray(16, 16, bytes(range(256)), quant=[1] * 64)
    for cut in (4, 20, len(good) // 2, len(good) - 3):
        with _pytest.raises(ValueError):
            decode_jpeg_gray(good[:cut])
    with _pytest.raises(ValueError):
        decode_jpeg_gray(good[:100] + b"\x00" * 3)  # corrupt tail


# ---- pure-stdlib GIF codec (operators/gif.py) -----------------------------


def test_gif_codec_roundtrip_exact_and_guards():
    """Gray-palette GIF round-trips PIXEL-EXACT (palette luma == pixel
    value), interlaced and not, through real LZW including the
    4096-entry table-overflow CLEAR path; truncation -> ValueError."""
    import random

    import pytest as _pytest

    from cubicerp_client_etl_spark.operators.gif import (
        decode_gif_gray,
        encode_gif_gray,
    )

    rnd = random.Random(3)
    for w, h in ((20, 12), (1, 1), (255, 3)):
        px = bytes(rnd.randrange(256) for _ in range(w * h))
        for il in (False, True):
            assert decode_gif_gray(encode_gif_gray(w, h, px, interlace=il)) == (
                w, h, px,
            )
    # low-entropy forces long matches and LZW table overflow
    px = (bytes([7] * 5000) + bytes(range(256)) * 4)[: 80 * 70]
    assert decode_gif_gray(encode_gif_gray(80, 70, px)) == (80, 70, px)

    good = encode_gif_gray(16, 16, bytes(range(256)))
    for cut in (3, 12, 100, len(good) - 2):
        with _pytest.raises(ValueError):
            decode_gif_gray(good[:cut])
    with _pytest.raises(ValueError):
        decode_gif_gray(b"NOT A GIF")


def test_gif_color_palette_luma_and_hypothesis_roundtrip():
    """A COLOR palette collapses to BT.601 integer luma; plus a
    hypothesis sweep over dims/content/interlace."""
    import struct

    from hypothesis import given, settings, strategies as st

    from cubicerp_client_etl_spark.operators.gif import (
        decode_gif_gray,
        encode_gif_gray,
    )

    # hand-build a 2x1 GIF with a 2-entry color palette: red, cyan
    head = b"GIF89a" + struct.pack("<HHBBB", 2, 1, 0x80, 0, 0)
    palette = bytes((255, 0, 0, 0, 255, 255)) + b""
    # palette flag 0x80 => size 2<<0 = 2 entries
    desc = b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 1, 0)
    # LZW min code size 2 -> clear=4, eoi=5, width 3. Codes CLEAR,0,1,EOI
    # packed LSB-first: 4 | 0<<3 | 1<<6 | 5<<9 = 2628 = bytes 0x44 0x0A
    stream = bytes([0x44, 0x0A])
    data = bytes([2, 2]) + stream + b"\x00"
    gif = head + palette + desc + data + b"\x3b"
    w, h, px = decode_gif_gray(gif)
    assert (w, h) == (2, 1)
    assert px[0] == (299 * 255 + 500) // 1000  # red -> 76
    assert px[1] == (587 * 255 + 114 * 255 + 500) // 1000  # cyan -> 179

    @settings(max_examples=20, deadline=None)
    @given(
        w=st.integers(1, 30),
        h=st.integers(1, 30),
        seed=st.integers(0, 2**31),
        il=st.booleans(),
    )
    def check(w, h, seed, il):
        import random

        rnd = random.Random(seed)
        px = bytes(rnd.randrange(256) for _ in range(w * h))
        assert decode_gif_gray(encode_gif_gray(w, h, px, interlace=il)) == (
            w, h, px,
        )

    check()


def test_real_gif_features_through_spark(spark):
    """The GIF decode path executes inside mapInPandas in CI via the
    _decode_gray dispatch (extract_features fake=False)."""
    from cubicerp_client_etl_spark.operators.gif import encode_gif_gray

    w, h, px = _jpeg_block_img()
    payload = encode_gif_gray(w, h, px, interlace=True)
    df = spark.createDataFrame(
        [(1, payload)], "doc_id long, payload binary"
    ).selectExpr(
        "doc_id",
        "payload",
        "named_struct('media_type', 'image/gif', 'byte_len', "
        "CAST(length(payload) AS BIGINT), 'format', 'gif', "
        f"'width', {w}, 'height', {h}) AS meta",
    )
    out = extract_features(df, n_features=8, fake=False).collect()
    want = [0] * 8
    for p in px:
        want[(p * 8) // 256] += 1
    assert out[0].features == [c / len(px) for c in want]
