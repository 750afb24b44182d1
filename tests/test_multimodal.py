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
def test_decode_media_raises_without_pil():
    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        extract_features(None, fake=False)


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
