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
