"""Multimodal plumbing (operators/multimodal.py): binary payload
attachment, Arrow batch iteration, feature schema, decode stub."""

from __future__ import annotations

import hashlib

import pytest

from amazonredshift_blueprints_spark.operators.multimodal import (
    attach_binary_payload,
    decode_image,
    extract_features,
)
from amazonredshift_blueprints_spark.session import load_table


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_attach_and_extract_features(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(20)
    mm = attach_binary_payload(d, "doc_id", "text")
    row = mm.collect()[0]
    assert isinstance(row.payload, (bytes, bytearray))
    assert row.meta.mime == "text/plain" and row.meta.n_bytes == len(row.payload)

    feats = {r.doc_id: r for r in extract_features(mm).collect()}
    src = {r.doc_id: r.text.encode() for r in d.collect()}
    assert set(feats) == set(src)
    for doc_id, payload in src.items():
        f = feats[doc_id]
        assert f.n_bytes == len(payload)
        assert f.payload_md5 == hashlib.md5(payload).hexdigest()
        assert f.head_hex == payload[:8].hex()
        assert f.feature == hashlib.sha256(payload).hexdigest()[:16]


def test_resize_payload_decimation(spark, sf_dir):
    import hashlib
    import math

    from amazonredshift_blueprints_spark.operators.multimodal import (
        attach_binary_payload,
        resize_payload,
    )
    from amazonredshift_blueprints_spark.session import load_table

    d = load_table(spark, sf_dir, "documents").limit(50)
    src = {r["doc_id"]: r["text"] for r in d.collect()}
    got = resize_payload(
        attach_binary_payload(d, "doc_id", "text"), target_bytes=100
    ).collect()
    assert len(got) == len(src)
    for r in got:
        b = src[r["doc_id"]].encode()
        if len(b) > 100:
            k = math.ceil(len(b) / 100)
            want = b[::k]
        else:
            want = b
        assert r["orig_bytes"] == len(b)
        assert r["resized_bytes"] == len(want) <= 100
        assert bytes(r["resized"]) == want
        assert r["resized_md5"] == hashlib.md5(want).hexdigest()


def test_sample_frames_covers_every_stride(spark):
    from amazonredshift_blueprints_spark.operators.multimodal import sample_frames

    # 300-byte payload, 64-byte frames -> frames 0..4; stride 4 keeps 0 and 4,
    # frame 4 being the 44-byte tail.
    payload = bytes(range(256)) + bytes(44)
    df = spark.createDataFrame([(1, payload)], "doc_id: long, payload: binary")
    rows = sorted(sample_frames(df).collect(), key=lambda r: r["frame_idx"])
    assert [(r["frame_idx"], r["n_frame_bytes"]) for r in rows] == [(0, 64), (4, 44)]


def test_ppm_roundtrip_and_comment_handling():
    import numpy as np

    from amazonredshift_blueprints_spark.operators.multimodal import (
        decode_image,
        encode_ppm,
    )

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)
    assert (decode_image(encode_ppm(px)) == px).all()
    # header comments are legal PPM; the parser must skip them
    with_comment = b"P6\n# a comment\n3 5\n255\n" + px.tobytes()
    assert (decode_image(with_comment) == px).all()
    # compressed formats: honest failure without pillow
    import pytest as _pytest
    with _pytest.raises((NotImplementedError, Exception)):
        decode_image(b"\x89PNG\r\n\x1a\n garbage")


def test_image_channel_stats_decodes_real_pixels(spark):
    import numpy as np

    from amazonredshift_blueprints_spark.operators.multimodal import (
        image_channel_stats,
        synthesize_ppm_images,
    )

    ids = spark.createDataFrame([(7,), (123,)], ["doc_id"])
    got = {
        r["doc_id"]: r
        for r in image_channel_stats(synthesize_ppm_images(ids, "doc_id")).collect()
    }
    for i in (7, 123):
        r_idx = np.arange(8)[:, None]
        c_idx = np.arange(8)[None, :]
        for ch, col in enumerate(["sum_r", "sum_g", "sum_b"]):
            want = int(((i * 31 + r_idx * 7 + c_idx * 3 + ch) % 256).sum())
            assert got[i][col] == want, (i, col)
        assert got[i]["n_pixels"] == 64 and got[i]["width"] == 8


def test_ppm_roundtrip_property():
    """decode(encode(px)) == px for arbitrary image shapes and pixel
    values — the lossless contract of the uncompressed codec."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from amazonredshift_blueprints_spark.operators.multimodal import (
        decode_image,
        encode_ppm,
    )

    @given(
        st.integers(min_value=1, max_value=12),
        st.integers(min_value=1, max_value=12),
        st.integers(min_value=0, max_value=2**32 - 1),
    )
    @settings(max_examples=100, deadline=None)
    def roundtrip(h, w, seed):
        px = np.random.default_rng(seed).integers(
            0, 256, size=(h, w, 3), dtype=np.uint8
        )
        out = decode_image(encode_ppm(px))
        assert out.shape == (h, w, 3) and (out == px).all()

    roundtrip()


def test_decode_truncated_ppm_raises_not_hangs():
    """Malformed P6 payloads must raise ValueError — a corrupt image in a
    100 TB batch must fail the row, not hang the executor in the header
    scan (the unbounded-loop bug class)."""
    import pytest

    from amazonredshift_blueprints_spark.operators.multimodal import decode_image

    # header cut off mid-token: no whitespace ever terminates the scan
    with pytest.raises(ValueError):
        decode_image(b"P6\n12")
    # comment never terminated by newline
    with pytest.raises(ValueError):
        decode_image(b"P6\n# unterminated comment")
    # full header but pixel buffer short of h*w*3
    with pytest.raises(ValueError, match="truncated PPM payload"):
        decode_image(b"P6\n4 4\n255\n" + b"\x00" * 10)
    # empty-dimension token (double separator at end of buffer)
    with pytest.raises(ValueError):
        decode_image(b"P6\n4 4 ")
