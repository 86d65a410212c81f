"""WARC ingestion containers (operators/warc.py, r16): spec framing,
multi-member gzip packaging, HTTP-response splitting, WET-style
extraction, and named refusals on every framing violation.

Reference basis: the reference ingests flat CSV (upload_file.py:118);
the container layer is the training-pipeline extension SURVEY §2 Part
C tracks — Common Crawl corpora arrive as .warc.gz.
"""

from __future__ import annotations

import gzip

import pytest

from amazonredshift_blueprints_spark.operators.warc import (
    encode_warc,
    extract_warc_text,
    http_response_body,
    parse_warc,
)

RECS = [
    {"type": "warcinfo", "content": b"software: test"},
    {"type": "conversion", "uri": "http://e/1", "content": b"hello world"},
    {
        "type": "response",
        "uri": "http://e/2",
        "content": b"HTTP/1.1 200 OK\r\nX: y\r\n\r\nbody text here",
    },
    {"type": "metadata", "content": b"fetch-ms: 7"},
]


def test_roundtrip_plain_and_gzip_members():
    for gz in (False, True):
        out = parse_warc(encode_warc(RECS, gzip_members=gz))
        assert [r["type"] for r in out] == [
            "warcinfo", "conversion", "response", "metadata",
        ]
        assert out[1]["content"] == b"hello world"
        assert out[1]["uri"] == "http://e/1"
        assert out[2]["headers"]["content-length"] == str(
            len(RECS[2]["content"])
        )
    # gzip members concatenate into exactly the plain framing — pinned
    # against CPython's own multi-member gzip reader (independent
    # member handling)
    assert gzip.decompress(encode_warc(RECS, gzip_members=True)) == (
        encode_warc(RECS)
    )


def test_wet_extraction_and_http_split():
    texts = extract_warc_text(encode_warc(RECS))
    # bookkeeping records (warcinfo/metadata) are skipped
    assert texts == [
        ("conversion", "hello world"),
        ("response", "body text here"),
    ]
    with pytest.raises(ValueError, match="does not carry HTTP"):
        http_response_body(b"not http")
    with pytest.raises(ValueError, match="no header terminator"):
        http_response_body(b"HTTP/1.1 200 OK\r\nX: y\r\n")


def test_framing_violations_refuse_by_name():
    plain = encode_warc(RECS)
    with pytest.raises(ValueError, match="not terminated by CRLFCRLF"):
        parse_warc(plain[:-3])
    with pytest.raises(ValueError, match="not a WARC/ version line"):
        parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")
    with pytest.raises(ValueError, match="truncated gzip member"):
        parse_warc(encode_warc(RECS, gzip_members=True)[:-5])
    # a record body whose declared length overruns the terminator
    broken = plain.replace(b"Content-Length: 11", b"Content-Length: 13", 1)
    with pytest.raises(ValueError, match="CRLFCRLF|Content-Length"):
        parse_warc(broken)
    with pytest.raises(ValueError, match="malformed header line"):
        parse_warc(b"WARC/1.0\r\nnocolonhere\r\n\r\n\r\n\r\n")
